"""Analytic FLOP counts for the UNet2D — MFU accounting for bench/profiling.

Counts multiply-add pairs as 2 FLOPs in every convolution (the MXU work;
elementwise/BN/softmax are bandwidth-, not FLOP-, relevant and are
excluded).  Geometry follows :mod:`unmicst_tpu.core.unet`'s graph, i.e. the
reference topology (``UnMicst.py:83-187``).
"""

from __future__ import annotations

from unmicst_tpu.core.hp import HParams
from unmicst_tpu.core.unet import get_variant


def unet_flops_per_tile(hp: HParams, variant: str = "legacy",
                        fused_residual: bool = True) -> int:
    """FLOPs of one INFERENCE forward over an ``im_size`` x ``im_size`` tile.

    ``fused_residual``: with no extra convs, `core/unet.py` folds the
    down-layer shortcut into kernel1 at inference (linearity), so the
    shortcut conv costs nothing; pass False for the training graph /
    pre-fusion accounting."""
    widths = hp.n_out_x
    ks2 = hp.ks * hp.ks
    legacy = get_variant(variant).legacy
    # mirror core/unet.py::_fuse_residual: the legacy 1x1 shortcut embeds
    # only into an odd-sized kernel
    fused = (fused_residual and hp.n_extra_convs == 0
             and (not legacy or hp.ks % 2 == 1))
    s = hp.im_size
    total = 0
    # down path
    res = s
    for i in range(hp.n_layers):
        hw = res * res
        total += 2 * hw * ks2 * widths[i] * widths[i + 1]  # kernel1
        total += 2 * hw * ks2 * widths[i + 1] * widths[i + 1] * hp.n_extra_convs
        if not fused:
            sc_k2 = 1 if legacy else ks2  # 1x1 legacy / ks x ks v2 shortcut
            total += 2 * hw * sc_k2 * widths[i] * widths[i + 1]
        res //= hp.down_samp_fact
    # bottom
    total += 2 * res * res * ks2 * widths[hp.n_layers] * widths[hp.n_layers + 1]
    # up path (lu index i runs nLayers-1..0; conv work at the OUTPUT res,
    # except the transpose conv whose true MAC count is per INPUT pixel —
    # each input px contributes ks^2*Cin*Cout scattered taps)
    for i in range(hp.n_layers - 1, -1, -1):
        in_hw = res * res
        res *= hp.down_samp_fact
        hw = res * res
        total += 2 * in_hw * ks2 * widths[i + 1] * widths[i + 2]  # transpose
        total += 2 * hw * ks2 * (widths[i] + widths[i + 1]) * widths[i + 1]
        total += 2 * hw * ks2 * widths[i + 1] * widths[i + 1] * hp.n_extra_convs
    # top 1x1
    total += 2 * res * res * widths[1] * hp.n_classes
    return total


def slide_flops(hp: HParams, height: int, width: int,
                variant: str = "legacy") -> int:
    """Total forward FLOPs for a tiled slide (overlap included)."""
    from unmicst_tpu.core import tiler

    grid = tiler.make_grid(height, width, hp.im_size, hp.margin)
    return grid.num_tiles * unet_flops_per_tile(hp, variant)
