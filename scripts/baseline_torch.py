"""Reference-style baseline executor (PyTorch CPU stand-in for the TF1 tool).

The upstream repo publishes no benchmark numbers and TensorFlow is not
installed here (BASELINE.md), so the measured baseline reproduces the
reference's *execution model* faithfully in torch on CPU — the only
hardware the reference container targets in its own CI
(``.github/workflows/ci.yml`` runs on a CPU GitHub runner):

* same legacy UNet math (weights from the shipped TF1 checkpoint),
* one full network pass **per output class** (``UnMicst.py:651-677``),
* fixed zero-padded batches of ``hp.batchSize`` patches per step
  (``UnMicst.py:530-535``),
* per-patch host normalization and numpy float16 window blending
  (``PartitionOfImage.py:86-106``).

Usage: ``python scripts/baseline_torch.py [size]`` — prints Mpx/s.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import torch

sys.path.insert(0, ".")

from unmicst_tpu.core import tiler  # noqa: E402
from unmicst_tpu.core.hp import load_model_dir  # noqa: E402
from unmicst_tpu.core.checkpoint import load_params_for_bundle  # noqa: E402

torch.set_num_threads(torch.get_num_threads())


def torch_forward(params, hp, x: torch.Tensor) -> torch.Tensor:
    """Legacy UNet forward in torch (NCHW), numerics-parity with the spec."""

    def conv(h, k_hwio):
        w = torch.tensor(np.asarray(k_hwio)).permute(3, 2, 0, 1)
        return torch.nn.functional.conv2d(h, w, padding="same")

    def convT(h, k_hwoi, stride=2):
        w = torch.tensor(np.asarray(k_hwoi)).permute(3, 2, 0, 1)  # [in,out,h,w]
        ks = w.shape[-1]
        pad_before = max(ks - stride, 0) // 2
        full = torch.nn.functional.conv_transpose2d(h, w, stride=stride)
        out = h.shape[-1] * stride
        return full[:, :, pad_before : pad_before + out, pad_before : pad_before + out]

    def bn(h, b):
        return torch.nn.functional.batch_norm(
            h,
            torch.tensor(np.asarray(b["moving_mean"])),
            torch.tensor(np.asarray(b["moving_variance"])),
            torch.tensor(np.asarray(b["gamma"])),
            torch.tensor(np.asarray(b["beta"])),
            training=False,
            eps=1e-3,
        )

    relu = torch.nn.functional.relu
    skips = []
    h = x
    for layer in params["down"]:
        skips.append(h)
        c = conv(h, layer["kernel1"])
        for ke in layer["extra"]:
            c = conv(relu(c), ke)
        y = bn(relu(c + conv(h, layer["shortcut"])), layer["bn"])
        h = torch.nn.functional.max_pool2d(y, 2)
    h = relu(conv(h, params["bottom"]["kernel1"]))
    for i in range(len(params["up"]) - 1, -1, -1):
        layer = params["up"][i]
        u = relu(convT(h, layer["kernel1"]))
        cc = torch.cat([skips[i], u], dim=1)
        h = relu(conv(cc, layer["kernel2"]))
        for ke in layer["extra"]:
            h = relu(conv(h, ke))
    t = conv(h, params["top"]["kernel"])
    return torch.softmax(t, dim=1)


def run(size: int = 2048, n_classes_out: int = 2) -> float:
    bundle = load_model_dir("/root/reference/models/nucleiDAPI")
    hp = bundle.hp
    params = load_params_for_bundle(bundle)
    rng = np.random.RandomState(0)
    image = rng.rand(size, size).astype(np.float64)

    g = tiler.make_grid(size, size, hp.im_size, hp.margin)
    win = np.asarray(tiler.ramp_window(hp.im_size, hp.margin)).astype(np.float16)
    padded = np.zeros((g.padded_height, g.padded_width))
    padded[g.margin : g.margin + size, g.margin : g.margin + size] = image

    coords = [
        (i * g.sub, j * g.sub) for i in range(g.npr) for j in range(g.npc)
    ]
    bs, P = hp.batch_size, hp.im_size

    t0 = time.perf_counter()
    with torch.no_grad():
        for _cls in range(n_classes_out):  # per-class full re-run
            out = np.zeros((g.padded_height, g.padded_width), np.float16)
            cnt = np.zeros_like(out)
            batch = np.zeros((bs, 1, P, P), np.float32)
            done = []
            for idx, (r0, c0) in enumerate(coords):
                j = idx % bs
                patch = padded[r0 : r0 + P, c0 : c0 + P]
                batch[j, 0] = (patch - bundle.mean) / bundle.std
                done.append((r0, c0))
                if j == bs - 1 or idx == len(coords) - 1:
                    probs = torch_forward(params, hp, torch.tensor(batch)).numpy()
                    for k, (rr, cc) in enumerate(done):
                        pm = probs[k, 1 + _cls].astype(np.float16)
                        out[rr : rr + P, cc : cc + P] += pm * win
                        cnt[rr : rr + P, cc : cc + P] += win
                    done = []
            _ = (out / np.maximum(cnt, 1e-6))[
                g.margin : g.margin + size, g.margin : g.margin + size
            ]
    dt = time.perf_counter() - t0
    mpx = size * size / 1e6
    print(
        f"reference-style torch CPU: {size}x{size}, {n_classes_out} class "
        f"passes, {dt:.1f}s -> {mpx / dt:.3f} Mpx/s "
        f"({torch.get_num_threads()} threads)"
    )
    return mpx / dt


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    run(size)
