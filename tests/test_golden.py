"""End-to-end golden test: legacy nucleiDAPI on the in-repo fixture.

The only expected-output pair the reference ships
(``UNet sample data/registration/105.tif`` -> ``prob_maps/105_{NucleiPM,
ContoursPM}_1.tif``) was produced by ``UnMicst.py`` (legacy tool, channel 0,
no stackOutput).  We reproduce the full CLI pipeline and require probability
maps within one uint8 level everywhere (observed: max diff 1, ~0.4% of
pixels, pure quantization-boundary noise)."""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE, needs_reference
from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import load_model_dir
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.io import preprocess as pp
from unmicst_tpu.io.tiff import imread

pytestmark = [needs_reference, pytest.mark.golden]


@pytest.fixture(scope="module")
def engine():
    bundle = load_model_dir(os.path.join(REFERENCE, "models/nucleiDAPI"))
    params = load_params_for_bundle(bundle)
    return bundle, InferenceEngine.from_bundle(bundle, params)


def test_golden_105(engine):
    bundle, eng = engine
    image = imread(os.path.join(REFERENCE, "UNet sample data/registration/105.tif"))
    pc = pp.preprocess_channel(image, 1.0, -1, use_rescaled=True)
    probs = eng.infer(pc.net_input.astype(np.float32))
    assert probs.shape == (3, 832, 960)

    golden = {
        1: imread(os.path.join(REFERENCE, "UNet sample data/prob_maps/105_ContoursPM_1.tif"), 0),
        2: imread(os.path.join(REFERENCE, "UNet sample data/prob_maps/105_NucleiPM_1.tif")),
    }
    for cls, gold in golden.items():
        ours = pp.postprocess_pm(probs[cls], pc.raw_shape)
        diff = np.abs(ours.astype(int) - gold.astype(int))
        assert diff.max() <= 1, f"class {cls}: max uint8 diff {diff.max()}"
        assert (diff > 0).mean() < 0.02, f"class {cls}: {(diff > 0).mean():.2%} off"

    # ContoursPM page 2 is the normalized raw image (UnMicst.py:672)
    gold_raw = imread(
        os.path.join(REFERENCE, "UNet sample data/prob_maps/105_ContoursPM_1.tif"), 1
    )
    ours_raw = np.uint8(255 * pc.raw_norm)
    assert np.abs(ours_raw.astype(int) - gold_raw.astype(int)).max() <= 1
