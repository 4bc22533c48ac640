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


def test_fetch_model_file_url(tmp_path, monkeypatch):
    """fetch_model downloads the published blob (file:// here) into the
    model dir atomically and the entry flips needs-blob -> ready;
    unknown names and blob-less entries raise cleanly."""
    import shutil

    from unmicst_tpu.models import zoo

    # stage a model root with nucleiDAPI's sidecars but no data blob
    src = os.path.join(REFERENCE, "models", "nucleiDAPI")
    dst = tmp_path / "models" / "nucleiDAPI"
    dst.mkdir(parents=True)
    blob = None
    for f in os.listdir(src):
        if f.endswith(".data-00000-of-00001"):
            blob = os.path.join(src, f)
            continue
        shutil.copy(os.path.join(src, f), dst / f)
    assert blob is not None
    root = str(tmp_path / "models")
    assert zoo.available_models(root)["nucleiDAPI"] == "needs-blob"
    entry = zoo.ZOO["nucleiDAPI"]
    monkeypatch.setitem(
        zoo.ZOO, "nucleiDAPI",
        type(entry)(**{**entry.__dict__, "ckpt_url": f"file://{blob}"}),
    )
    # the CLI wrapper drives the same fetch
    from unmicst_tpu import cli

    assert cli.main(["--fetchModels", "nucleiDAPI",
                     "--modelRoot", root]) == 0
    assert zoo.available_models(root)["nucleiDAPI"] == "ready"
    assert zoo.fetch_model("nucleiDAPI", root) == "ready"
    assert zoo.fetch_model("nucleiDAPI", root) == "ready"  # idempotent
    with pytest.raises(ValueError, match="unknown zoo model"):
        zoo.fetch_model("nope", root)
    with pytest.raises(ValueError, match="no published"):
        shutil.copytree(src, tmp_path / "models" / "CytoplasmIncell")
        os.remove(tmp_path / "models" / "CytoplasmIncell" /
                  "model.ckpt.data-00000-of-00001")
        zoo.fetch_model("CytoplasmIncell", root)


def test_bare_fetch_sweeps_all_roots_and_stages_sidecars(
        tmp_path, monkeypatch):
    """`--fetchModels` with no names must find needs-blob entries in ANY
    default root (not just the first) and fetch the blob into the first
    (writable) root, staging the sidecars there first — regression for
    the bare sweep silently no-opping when the primary root had no zoo
    dirs while the checkout's models/ tree (read-only, later in the
    list) carried them."""
    import shutil

    from unmicst_tpu import cli
    from unmicst_tpu.models import zoo

    src_ref = os.path.join(REFERENCE, "models", "nucleiDAPI")
    # secondary root: sidecars only (like a read-only checkout)
    sec = tmp_path / "checkout" / "nucleiDAPI"
    sec.mkdir(parents=True)
    blob = None
    for f in os.listdir(src_ref):
        if f.endswith(".data-00000-of-00001"):
            blob = os.path.join(src_ref, f)
            continue
        shutil.copy(os.path.join(src_ref, f), sec / f)
    assert blob is not None
    # primary root: empty (no zoo dirs at all)
    prim = tmp_path / "primary"
    prim.mkdir()
    entry = zoo.ZOO["nucleiDAPI"]
    monkeypatch.setitem(
        zoo.ZOO, "nucleiDAPI",
        type(entry)(**{**entry.__dict__, "ckpt_url": f"file://{blob}"}),
    )
    monkeypatch.setattr(
        cli, "DEFAULT_MODEL_ROOTS",
        [str(prim), str(tmp_path / "checkout")],
    )
    assert cli.main(["--fetchModels"]) == 0
    # blob + sidecars landed in the primary root; secondary untouched
    assert zoo.available_models(str(prim))["nucleiDAPI"] == "ready"
    assert not (sec / "model.ckpt.data-00000-of-00001").exists()


def test_fetch_model_failed_download_leaves_no_part(tmp_path, monkeypatch):
    """A fetch that dies mid-transfer must not leave a stale .part blob
    in the model dir."""
    import shutil

    from unmicst_tpu.models import zoo

    src = os.path.join(REFERENCE, "models", "nucleiDAPI")
    dst = tmp_path / "models" / "nucleiDAPI"
    dst.mkdir(parents=True)
    for f in os.listdir(src):
        if not f.endswith(".data-00000-of-00001"):
            shutil.copy(os.path.join(src, f), dst / f)
    entry = zoo.ZOO["nucleiDAPI"]
    monkeypatch.setitem(
        zoo.ZOO, "nucleiDAPI",
        type(entry)(**{**entry.__dict__,
                       "ckpt_url": f"file://{tmp_path}/nonexistent.blob"}),
    )
    with pytest.raises(OSError):
        zoo.fetch_model("nucleiDAPI", str(tmp_path / "models"))
    leftovers = [f for f in os.listdir(dst) if f.endswith(".part")]
    assert leftovers == []
