"""Second shipped checkpoint (CytoplasmIncell, 2-class legacy) end-to-end.

No golden outputs exist upstream for this model; this pins the loaded
checkpoint to sane, deterministic behavior on the in-repo fixture.
"""

import os

import numpy as np

from tests.conftest import REFERENCE, needs_reference
from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import load_model_dir
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.io import preprocess as pp
from unmicst_tpu.io.tiff import imread

pytestmark = needs_reference


def test_cytoplasm_incell_runs():
    bundle = load_model_dir(os.path.join(REFERENCE, "models/CytoplasmIncell"))
    assert bundle.variant == "legacy"
    assert bundle.hp.n_classes == 2 and bundle.hp.n_extra_convs == 1
    params = load_params_for_bundle(bundle)
    crop = imread(
        os.path.join(REFERENCE, "UNet sample data/registration/105.tif")
    )[:256, :256]
    pc = pp.preprocess_channel(crop, 1.0, -1)
    eng = InferenceEngine.from_bundle(bundle, params)
    probs = eng.infer(pc.net_input.astype(np.float32))
    assert probs.shape == (2, 256, 256)
    np.testing.assert_allclose(probs.sum(0), 1.0, atol=1e-4)
    # the checkpoint should produce non-degenerate maps on real tissue
    assert 0.05 < probs[1].mean() < 0.95
    assert probs[1].std() > 0.05
    # determinism
    probs2 = eng.infer(pc.net_input.astype(np.float32))
    np.testing.assert_array_equal(probs, probs2)
