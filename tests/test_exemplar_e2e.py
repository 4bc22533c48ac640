"""CI-workload-shaped end-to-end: multi-channel OME-TIFF through the wrapper
surface, mirroring the reference CI job (``.github/workflows/ci.yml:41-45``:
``unmicstWrapper.py --stackOutput`` on an 8-channel CyCIF slide) — but with
numeric assertions, which the reference CI never makes."""


import numpy as np
import pytest

from tests.conftest import needs_reference
from unmicst_tpu import cli
from unmicst_tpu.io.tiff import TiffWriter, imread, num_pages

pytestmark = [needs_reference, pytest.mark.slow]


def test_eight_channel_exemplar_style(tmp_path):
    rng = np.random.RandomState(6)  # fixed: thresholds depend on the draw
    # synthetic 8-channel CyCIF-like slide; channel 0 carries DNA-like blobs
    h, w = 700, 600
    img_dir = tmp_path / "exemplar-001" / "registration"
    img_dir.mkdir(parents=True)
    slide = str(img_dir / "exemplar-001-cycle6.ome.tif")
    rr, cc = np.ogrid[:h, :w]
    with TiffWriter(slide, bigtiff=True) as tw:
        for ch in range(8):
            plane = rng.rand(h, w).astype(np.float32) * 0.1
            if ch == 0:  # DNA channel
                for _ in range(40):
                    r, c = rng.randint(20, h - 20), rng.randint(20, w - 20)
                    rad = rng.randint(5, 10)
                    plane[(rr - r) ** 2 + (cc - c) ** 2 < rad**2] = (
                        0.5 + 0.4 * rng.rand()
                    )
            tw.write((np.clip(plane, 0, 1) * 65535).astype(np.uint16))

    out = tmp_path / "out"
    # wrapper-style flags: channel 1 (1-based), stackOutput, legacy tool
    # (the only tool whose checkpoint ships in-repo)
    rc = cli.main(
        [slide, "--tool", "unmicst-legacy", "--stackOutput",
         "--outputPath", str(out), "--channel", "1", "--stats"]
    )
    assert rc == 0

    # legacy stem parsing splits at the first dot
    prob = out / "exemplar-001-cycle6_Probabilities_1.tif"
    assert num_pages(str(prob)) == 3
    pages = [imread(str(prob), k) for k in range(3)]
    assert all(p.shape == (h, w) and p.dtype == np.uint8 for p in pages)
    total = sum(p.astype(int) for p in pages)
    assert np.abs(total - 255).max() <= 3  # softmax consistency
    # the model responds to structure (synthetic flat disks are not real
    # DAPI texture, so direction is not asserted — only non-degeneracy
    # and input sensitivity)
    nuclei = pages[0].astype(float) / 255
    dna = imread(slide, 0).astype(float) / 65535
    assert nuclei.std() > 0.05
    assert abs(nuclei[dna > 0.45].mean() - nuclei[dna < 0.15].mean()) > 0.1
    # preview present under qc/
    assert num_pages(str(out / "qc" / "exemplar-001-cycle6_Preview_1.tif")) == 2
