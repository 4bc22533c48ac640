"""The committed demo model: the repo is runnable without the upstream mount.

``models/blobDemo`` was trained by this framework's own Trainer (v2 solo
recipe, synthetic blob corpus, 7.9% validation pixel error) and saved in
both native and TF1 formats.
"""

import os

import numpy as np
import pytest

from unmicst_tpu import cli
from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import load_model_dir
from unmicst_tpu.io.tiff import TiffWriter, imread, num_pages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "models", "blobDemo")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DEMO), reason="demo model not present"
)


def _blob_slide(rng, h=200, w=160):
    img = rng.rand(h, w).astype(np.float32) * 0.15
    rr, cc = np.ogrid[:h, :w]
    for _ in range(8):
        r, c = rng.randint(20, h - 20), rng.randint(20, w - 20)
        rad = rng.randint(5, 9)
        d2 = (rr - r) ** 2 + (cc - c) ** 2
        img[d2 < rad**2] = 0.7
        img[(d2 < (rad + 2) ** 2) & (d2 >= rad**2)] = 0.4
    return img


def test_demo_model_loads_both_formats():
    bundle = load_model_dir(DEMO)
    assert bundle.has_native_ckpt and bundle.has_tf1_ckpt
    params = load_params_for_bundle(bundle)
    assert bundle.hp.n_classes == 3


def test_demo_model_segments_blobs(tmp_path):
    img = _blob_slide(np.random.RandomState(42))
    src = tmp_path / "s" / "registration" / "blobs.tif"
    src.parent.mkdir(parents=True)
    with TiffWriter(str(src), bigtiff=False) as tw:
        tw.write((np.clip(img, 0, 1) * 65535).astype(np.uint16))
    out = tmp_path / "out"
    rc = cli.main(
        [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
         "--modelRoot", os.path.join(REPO, "models"),
         "--outputPath", str(out), "--stackOutput"]
    )
    assert rc == 0
    assert num_pages(str(out / "blobs_Probabilities_1.tif")) == 3
    nuclei = imread(str(out / "blobs_Probabilities_1.tif"), 0).astype(float) / 255
    inside = nuclei[img > 0.6].mean()
    background = nuclei[img < 0.2].mean()
    assert inside > 0.8 and background < 0.3, (inside, background)
