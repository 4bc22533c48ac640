"""Space-to-depth refold of the full-resolution UNet level — exact.

The legacy zoo nets are NARROW where they are BIG: level 0 runs at full
resolution with 1..17 input channels and 16 output channels
(``/root/reference/UnMicst.py:29-187``; nucleiDAPI: ks=5, widths
[1, 16, 32, 64]).  On the MXU those convs fill at most 17 of 128
contraction lanes / 16 of 128 output lanes — BASELINE.md measured the
bf16 device-resident wall pinned at ~21% MFU by exactly this occupancy,
not by scheduling.

This module re-shapes that level with a 2x2 space-to-depth (pixel
unshuffle) so the SAME math runs at HALF resolution with 4x the
channels:

* a stride-1 SAME ``ks x ks`` conv on the full-res plane is EXACTLY a
  stride-1 SAME conv on the phase-packed half-res tensor with a
  ``ceil(ks/2)``-ish kernel whose taps are a parity-split of the
  original (1.44x the nominal FLOPs for ks=5 -> 3, but ~4x the lane
  occupancy);
* the 2x2/stride-2 SAME max-pool that ends the down level is EXACTLY a
  max over the 4 phase groups of the packed tensor (a reshape + max —
  the pool window IS the phase block);
* the stride-2 SAME ``conv_transpose`` that re-enters the level is
  EXACTLY a stride-1 conv producing the 4 output phases as packed
  channels (the classic sub-pixel / "deconv == conv + depth-to-space"
  identity);
* 1x1 convs (the legacy shortcut) become block-diagonal 1x1 convs;
  activations are elementwise (phase layout is irrelevant); inference
  batch-norm is a per-channel affine, so its vectors tile 4x.

Everything in between (level >= 1, the bottom) already runs at <= half
resolution with >= 16 channels and is left untouched.  The refold is a
host-side weight transformation (``refold_params``) plus an
inference-only forward (``apply``) — no retraining, bit-comparable
output (same f32 accumulation, ops reordered only within sums).

Scope: inference only, ``down_samp_fact == 2`` (the only factor the zoo
uses), odd ``ks``, even tile size.  Training keeps the standard layout
(the refold would make the BN batch-statistics semantics diverge).

Measured on-chip verdict: BASELINE.md "space-to-depth" section
(scripts/s2d_ab_tpu.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from unmicst_tpu.core.hp import HParams
from unmicst_tpu.core.unet import (
    _fuse_residual,
    bn_apply,
    conv,
    conv_transpose,
    get_variant,
    max_pool,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# packing transforms (pure reshapes — phase-major channel order q*C + c,
# phase index q = qy*2 + qx)
# ---------------------------------------------------------------------------


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C]; packed channel (qy*2+qx)*C + c
    holds pixel (2i+qy, 2j+qx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


# ---------------------------------------------------------------------------
# kernel refolds (host-side numpy; loaded weights -> packed weights)
# ---------------------------------------------------------------------------


def refold_conv(k: np.ndarray) -> np.ndarray:
    """Stride-1 SAME [ks, ks, Cin, Cout] kernel -> the packed-domain
    [ks', ks', 4*Cin, 4*Cout] kernel with ``s2d(conv(x, k)) ==
    conv(s2d(x), k')`` exactly (including SAME boundaries: the packed
    pad of ``(ks'-1)/2`` block-positions covers the full-res pad of
    ``(ks-1)/2`` pixels, excess taps being zero).

    Derivation: output pixel (2i+py) pulls input (2i+py+dy-r); writing
    the input position as 2(i+m)+qy gives ``dy = 2m + qy - py + r`` —
    for each (phase pair, m) at most one original tap contributes.
    """
    kh, kw, cin, cout = k.shape
    if kh != kw or kh % 2 == 0:
        raise ValueError(f"refold_conv needs a square odd kernel, got {k.shape}")
    r = kh // 2
    mmax = (r + 1) // 2
    n = 2 * mmax + 1
    kp = np.zeros((n, n, 4 * cin, 4 * cout), np.float32)
    k = np.asarray(k, np.float32)
    for py in range(2):
        for qy in range(2):
            for dy in range(kh):
                ny = dy - r - qy + py
                if ny % 2:
                    continue
                my = ny // 2
                for px in range(2):
                    for qx in range(2):
                        for dx in range(kw):
                            nx = dx - r - qx + px
                            if nx % 2:
                                continue
                            mx = nx // 2
                            q = qy * 2 + qx
                            p = py * 2 + px
                            kp[
                                my + mmax, mx + mmax,
                                q * cin:(q + 1) * cin,
                                p * cout:(p + 1) * cout,
                            ] = k[dy, dx]
    return kp


def refold_conv_transpose(k: np.ndarray) -> np.ndarray:
    """Stride-2 SAME ``conv_transpose`` kernel (TF layout
    [ks, ks, Cout, Cin], ``unet.conv_transpose``) -> the packed-domain
    stride-1 SAME [T', T', Cin, 4*Cout] kernel with
    ``s2d(conv_transpose(h, k, 2)) == conv(h, k')`` exactly.

    Derivation: the transpose is the gradient of a stride-2 SAME conv
    whose left pad is ``(ks-2)//2``; output pixel (2i+py) collects
    ``h[i-t] * k[2t + py + pl]`` — each output phase reads a parity
    split of the taps.
    """
    kh, kw, cout, cin = k.shape
    if kh != kw or kh % 2 == 0 or kh < 3:
        raise ValueError(
            f"refold_conv_transpose needs a square odd kernel >= 3, got "
            f"{k.shape}"
        )
    pl = (kh - 2) // 2
    tmax = 0
    for py in range(2):
        for dy in range(kh):
            ny = dy - py - pl
            if ny % 2 == 0:
                tmax = max(tmax, abs(ny // 2))
    n = 2 * tmax + 1
    kp = np.zeros((n, n, cin, 4 * cout), np.float32)
    k = np.asarray(k, np.float32)
    for py in range(2):
        for dy in range(kh):
            ny = dy - py - pl
            if ny % 2:
                continue
            ty = ny // 2
            for px in range(2):
                for dx in range(kw):
                    nx = dx - px - pl
                    if nx % 2:
                        continue
                    tx = nx // 2
                    p = py * 2 + px
                    # U[i] += h[i - t] * k[dy]: conv tap index d = T - t
                    kp[tmax - ty, tmax - tx, :, p * cout:(p + 1) * cout] = (
                        k[dy, dx].T
                    )
    return kp


def _tile_bn(bn: Params) -> Params:
    """Per-channel inference BN vectors [C] -> packed [4C] (phase-major:
    packed channel p*C+c normalizes with channel c's statistics)."""
    return {key: np.tile(np.asarray(v, np.float32), 4) for key, v in bn.items()}


def refold_params(params: Params, hp: HParams, variant: str) -> Params:
    """Pack level 0's kernels/BN for the s2d forward (host-side numpy).

    Returns the pytree ``apply`` expects as ``packed``; the base params
    stay untouched (inner levels + the top conv read them directly).
    """
    cfg = get_variant(variant)
    if hp.down_samp_fact != 2:
        raise ValueError("s2d refold requires down_samp_fact == 2")
    if hp.ks % 2 == 0:
        raise ValueError("s2d refold requires an odd kernel size")
    host = jax.tree_util.tree_map(np.asarray, params)
    d0 = host["down"][0]
    packed: Params = {"down0": {}, "up0": {}}
    fused = _fuse_residual(d0, train=False)
    if fused is not None:
        packed["down0"]["fused"] = refold_conv(np.asarray(fused))
    else:
        packed["down0"]["kernel1"] = refold_conv(d0["kernel1"])
        packed["down0"]["extra"] = [refold_conv(k) for k in d0["extra"]]
        # the legacy 1x1 shortcut refolds to a pure block-diagonal 1x1
        # (refold_conv's ks=1 case); v2's ks x ks shortcut refolds normally
        packed["down0"]["shortcut"] = refold_conv(d0["shortcut"])
    packed["down0"]["bn"] = _tile_bn(d0["bn"])
    u0 = host["up"][0]
    packed["up0"]["kernel1"] = refold_conv_transpose(u0["kernel1"])
    packed["up0"]["kernel2"] = refold_conv(u0["kernel2"])
    packed["up0"]["extra"] = [refold_conv(k) for k in u0["extra"]]
    if not cfg.legacy:
        packed["up0"]["bn"] = _tile_bn(u0["bn"])
    return packed


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def apply(
    params: Params,
    packed: Params,
    x: jnp.ndarray,
    hp: HParams,
    variant: str = "legacy",
    *,
    compute_dtype=None,
    precision=None,
) -> jnp.ndarray:
    """Inference forward equal to ``unet.apply(params, x, ...)`` with
    level 0 running space-to-depth-packed at half resolution.

    ``x``: [B, S, S, C] float, S even (and the inner levels' usual
    divisibility).  Returns softmax [B, S, S, K].  Semantics source:
    ``unet.apply`` (inference branch); equality pinned by
    ``tests/test_s2d.py``.
    """
    cfg = get_variant(variant)
    act = cfg.act
    if x.shape[1] % 2 or x.shape[2] % 2:
        raise ValueError(f"s2d needs even spatial dims, got {x.shape}")
    conv_p = partial(conv, compute_dtype=compute_dtype, precision=precision)
    c1 = hp.n_out_x[1]

    # -- level 0 down, packed -------------------------------------------------
    xp = space_to_depth(x)
    d0 = packed["down0"]
    if "fused" in d0:
        pre = conv_p(xp, d0["fused"])
    else:
        c = conv_p(xp, d0["kernel1"])
        for ke in d0["extra"]:
            c = conv_p(act(c), ke)
        pre = c + conv_p(xp, d0["shortcut"])
    if cfg.legacy:
        y = bn_apply(act(pre), d0["bn"])
    else:
        y = act(bn_apply(pre, d0["bn"]))
    # the 2x2 stride-2 SAME max-pool == max over the 4 phase groups
    b_, hh, ww = y.shape[0], y.shape[1], y.shape[2]
    h = jnp.max(y.reshape(b_, hh, ww, 4, c1), axis=3)

    # -- inner levels (unchanged layout) --------------------------------------
    skips = []
    for i in range(1, hp.n_layers):
        layer = params["down"][i]
        skips.append(h)
        fused = _fuse_residual(layer, train=False)
        if fused is not None:
            pre = conv_p(h, fused)
        else:
            c = conv_p(h, layer["kernel1"])
            for ke in layer["extra"]:
                c = conv_p(act(c), ke)
            pre = c + conv_p(h, layer["shortcut"])
        if cfg.legacy:
            yy = bn_apply(act(pre), layer["bn"])
        else:
            yy = act(bn_apply(pre, layer["bn"]))
        h = max_pool(yy, hp.down_samp_fact)

    b = conv_p(h, params["bottom"]["kernel1"])
    if cfg.legacy:
        b = act(b)
    else:
        b = act(bn_apply(b, params["bottom"]["bn"]))

    h = b
    for step in range(hp.n_layers - 1):
        i = hp.n_layers - 1 - step  # down to 1
        layer = params["up"][i]
        u = act(conv_transpose(h, layer["kernel1"], hp.down_samp_fact,
                               compute_dtype, precision))
        cc = jnp.concatenate([skips[i - 1].astype(u.dtype), u], axis=-1)
        cv = conv_p(cc, layer["kernel2"])
        cv = act(cv) if cfg.legacy else act(bn_apply(cv, layer["bn"]))
        for ke in layer["extra"]:
            cv = act(conv_p(cv, ke))
        h = cv

    # -- level 0 up, packed ---------------------------------------------------
    u0 = packed["up0"]
    u = act(conv_p(h, u0["kernel1"]))  # [B, S/2, S/2, 4*c1]
    c0 = hp.n_out_x[0]
    hh, ww = u.shape[1], u.shape[2]
    cc = jnp.concatenate(
        [
            xp.reshape(b_, hh, ww, 4, c0).astype(u.dtype),
            u.reshape(b_, hh, ww, 4, c1),
        ],
        axis=-1,
    ).reshape(b_, hh, ww, 4 * (c0 + c1))
    cv = conv_p(cc, u0["kernel2"])
    cv = act(cv) if cfg.legacy else act(bn_apply(cv, u0["bn"]))
    for ke in u0["extra"]:
        cv = act(conv_p(cv, ke))

    # top 1x1 at full res (trivial FLOPs; keeps the op byte-identical to
    # the standard path)
    full = depth_to_space(cv)
    t = conv_p(full, params["top"]["kernel"])
    if not cfg.legacy:
        t = bn_apply(t, params["top"]["bn"])
    return jax.nn.softmax(t.astype(jnp.float32), axis=-1)
