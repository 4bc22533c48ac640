"""Zoo-wide coverage: every shipped hp.data builds a forward-correct model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE, needs_reference
from unmicst_tpu.core import unet
from unmicst_tpu.core.hp import ZOO_VARIANTS, load_model_dir
from unmicst_tpu.core.tf1_ckpt import TF1Checkpoint
from unmicst_tpu.models.zoo import ZOO, available_models

pytestmark = needs_reference

ALL_MODELS = sorted(ZOO_VARIANTS)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_every_zoo_hp_builds(name):
    """hp.data from every shipped model dir constructs a working model
    whose kernel shapes match the shipped checkpoint index."""
    bundle = load_model_dir(os.path.join(REFERENCE, "models", name))
    hp, variant = bundle.hp, bundle.variant
    params = unet.init_params(jax.random.PRNGKey(0), hp, variant)
    # small spatial size for speed; architecture is size-agnostic
    size = 32
    x = jnp.ones((1, size, size, hp.n_channels))
    y = unet.apply(params, x, hp, variant)
    assert y.shape == (1, size, size, hp.n_classes)

    ck = TF1Checkpoint(os.path.join(REFERENCE, "models", name, "model.ckpt"))
    legacy = variant == "legacy"
    k1 = "downsampling/ld0/kernel1" if legacy else "downsampling/ld0/kernelD0"
    assert tuple(params["down"][0]["kernel1"].shape) == ck.get_shape(k1)
    assert tuple(params["top"]["kernel"].shape) == ck.get_shape("lt/kernel")
    assert tuple(params["bottom"]["kernel1"].shape) == ck.get_shape("lb/kernel1")


def test_zoo_registry_matches_dirs():
    status = available_models(os.path.join(REFERENCE, "models"))
    assert set(status) == set(ZOO)
    assert status["nucleiDAPI"] == "ready"
    assert status["CytoplasmIncell"] == "ready"
    # mousenucleiDAPI is ready via the alternate bundle prefix
    assert status["mousenucleiDAPI"] == "ready"
    assert status["nucleiDAPI1-5"].startswith("needs-blob")


def test_mousenuclei_alternate_bundle_loads():
    """The alt-prefix checkpoint actually restores and runs."""
    from unmicst_tpu.core.checkpoint import load_params_for_bundle

    bundle = load_model_dir(os.path.join(REFERENCE, "models/mousenucleiDAPI"))
    params = load_params_for_bundle(bundle)
    x = jnp.ones((1, 64, 64, bundle.hp.n_channels))
    y = unet.apply(params, x, bundle.hp, bundle.variant)
    assert y.shape == (1, 64, 64, bundle.hp.n_classes)
    assert np.isfinite(np.asarray(y)).all()


def test_zoo_s3_urls_match_reference_dockerfile():
    # regression: the S3 keys are "unmicst1-5"/"unmicst2", NOT the
    # model-dir names — a wrong URL 404s the day egress appears
    import re

    text = open(os.path.join(REFERENCE, "Dockerfile")).read()
    urls = set(re.findall(r"https://\S+", text))
    for entry in ZOO.values():
        if entry.ckpt_url:
            assert entry.ckpt_url in urls, entry.ckpt_url
