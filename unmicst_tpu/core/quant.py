"""Post-training int8 quantization for the UNet inference path.

TPU v5e's MXU executes s8 x s8 -> s32 contractions at twice the bf16 rate
(394 TOPS vs 197 TFLOP/s peak), so a quantized forward can lift the
device-resident throughput ceiling above the bf16 roofline the r2/r3
numbers sit on.  This is an OPT-IN fast mode (``InferenceEngine(...,
quantized=True)``); the parity modes (HIGH / HIGHEST / bf16) are untouched.

Scheme (standard symmetric PTQ):

* activations: PER-INPUT-CHANNEL symmetric scales ``a[cin] =
  percentile(|x[..., cin]|, calibration_percentile) / 127``, calibrated
  by running the float forward over sample tiles with a tracing tap at
  every conv input.  Per-tensor scales were measured inadequate on real
  weights (mean 3.5 uint8 levels error on the legacy golden crop):
  post-conv channel ranges differ by orders of magnitude, and the
  up-path skip/upsample concat doubly so.
* weights: the activation scales are FOLDED into the kernel
  (``W' = a[cin] * W``) and ``W'`` is quantized per-output-channel
  symmetric (``w_scale[co] = max|W'[..., co]| / 127``) — so
  ``x8 ~= x/a`` and ``w8*w_scale ~= a*W`` cancel exactly and
  dequantization is one per-``cout`` multiply.  What gets int8
  resolution is ``a_k * W_k``, each input channel's actual per-int8-step
  output contribution.  The inference-time residual fusion
  (``unet._fuse_residual``) is applied BEFORE quantization so the fused
  kernel is what gets quantized.
* compute: ``clip(round(x / a))`` -> int8 conv -> int32 -> dequantize by
  ``w_scale`` -> BN / activation / softmax in float as usual.

Everything rides ``jax.lax.conv_general_dilated`` with
``preferred_element_type=int32`` — no custom kernels; XLA fuses the
quantize/dequantize elementwise work into the surrounding ops.

The reference has no quantized path (TF1 f32 only); this is a TPU-native
extension, not a parity surface.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unmicst_tpu.core import unet
from unmicst_tpu.core.hp import HParams

# QuantState pytree:
#   {"kernels": {site: {"w8": int8 HWIO quantizing a[cin]*W,
#                       "w_scale": f32 [cout]}},
#    "scales":  {site: f32 [cin] per-input-channel activation scales}}
QuantState = Dict[str, Dict[str, Any]]


def _quantize_kernel(
    w: jnp.ndarray, a: Optional[np.ndarray] = None
) -> Dict[str, jnp.ndarray]:
    """Quantize ``a[cin] * w`` per-output-channel (``a=None`` -> ones)."""
    w = np.asarray(w, np.float32)
    if a is not None:
        w = w * np.asarray(a, np.float32)[None, None, :, None]
    absmax = np.max(np.abs(w), axis=(0, 1, 2))
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    w8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"w8": jnp.asarray(w8), "w_scale": jnp.asarray(scale)}


def conv_sites(params: unet.Params, hp: HParams) -> Dict[str, jnp.ndarray]:
    """Map site name -> float kernel for every plain conv on the
    INFERENCE path (the same site names `unet.apply` taps/consumes).

    Covered: fused or separate down convs (level 1+), bottom, up kernel2
    and extra convs.  Excluded:

    * the ENTIRE first down block (``down0.*``): its input is the raw
      standardized image, and 8-bit input quantization measured 0.54 of
      the whole-net 0.65 max-softmax error on the real legacy weights
      (per-site ablation, BASELINE.md r3) while its FLOPs share is
      negligible (C_in = n_channels <= 2);
    * conv_transpose (int8 + lhs dilation is a separate lowering — kept
      float until measured);
    * the 1x1 top conv (its output feeds softmax directly; quantization
      error there lands on the class logits with nothing downstream to
      wash it out, for ~0.1% of the FLOPs).
    """
    def fuse_host(layer):
        # numpy mirror of unet._fuse_residual(train=False); divergence is
        # caught by calibrate()'s missing-site check (the tap names would
        # no longer line up)
        if layer["extra"]:
            return None
        k1 = np.asarray(layer["kernel1"], np.float32)
        ks = np.asarray(layer["shortcut"], np.float32)
        if k1.shape == ks.shape:
            return k1 + ks
        kh, kw = k1.shape[:2]
        if ks.shape[:2] == (1, 1) and kh % 2 and kw % 2:
            out = k1.copy()
            out[kh // 2, kw // 2] += ks[0, 0]
            return out
        return None

    sites: Dict[str, jnp.ndarray] = {}
    for i, layer in enumerate(params["down"]):
        if i == 0:
            continue  # first block stays float (docstring)
        fused = fuse_host(layer)
        if fused is not None:
            sites[f"down{i}"] = fused
        else:
            sites[f"down{i}.k1"] = layer["kernel1"]
            sites[f"down{i}.short"] = layer["shortcut"]
            for j, ke in enumerate(layer["extra"]):
                sites[f"down{i}.extra{j}"] = ke
    sites["bottom"] = params["bottom"]["kernel1"]
    for i, layer in enumerate(params["up"]):
        sites[f"up{i}.k2"] = layer["kernel2"]
        for j, ke in enumerate(layer["extra"]):
            sites[f"up{i}.extra{j}"] = ke
    return sites


def calibrate(
    params: unet.Params,
    tiles: np.ndarray,
    hp: HParams,
    variant: str,
    *,
    percentile: float = 99.99,
    bias_correct: bool = True,
) -> QuantState:
    """Build a QuantState from normalized sample tiles [N, S, S, C].

    The activation statistics run as ONE jitted forward with a tracing
    tap (eager per-op dispatch would pay a tunnel round-trip per op on
    remote-attached TPUs): per-site PER-CHANNEL scale =
    percentile(|x[..., c]|) / 127 over the whole calibration batch.
    99.99 clips only extreme outliers — absmax is one rogue pixel away
    from wasting the int8 range.  Weight quantization is host-side numpy:
    the activation scales fold into the kernel first (module docstring).
    """
    params_h = jax.tree_util.tree_map(np.asarray, params)
    site_kernels = conv_sites(params_h, hp)

    def stats_fn(p, t):
        stats: Dict[str, jnp.ndarray] = {}

        def tap(site: str, x: jnp.ndarray) -> None:
            if site in site_kernels:
                ax = jnp.abs(x.astype(jnp.float32)).reshape(-1, x.shape[-1])
                # percentile scale + absmax fallback: a nearly-dead
                # channel (≥ `percentile`% zeros but nonzero absmax)
                # would otherwise take the 1.0 fallback and quantize its
                # whole activation range to zero
                stats[site] = (
                    jnp.percentile(ax, percentile, axis=0),
                    ax.max(axis=0),
                )

        unet.apply(p, t, hp, variant, tap=tap)
        return stats

    tiles = np.asarray(tiles, np.float32)
    stats = jax.jit(stats_fn)(params_h, tiles)
    missing = set(site_kernels) - set(stats)
    if missing:
        raise ValueError(
            f"calibration never reached conv site(s) {sorted(missing)} — "
            "site naming drifted between conv_sites and unet.apply"
        )
    scales, kernels = {}, {}
    for site, w in site_kernels.items():
        m_pct, m_max = (np.asarray(v, np.float32) for v in stats[site])
        m = np.where(m_pct > 0, m_pct, m_max)  # absmax fallback (tap)
        a = np.where(m > 0, m / 127.0, 1.0).astype(np.float32)
        scales[site] = jnp.asarray(a)
        kernels[site] = _quantize_kernel(w, a)

    if bias_correct:
        # Per-output-channel mean-shift correction (standard PTQ
        # refinement): E[conv_f32(x)] - E[conv_int8(x)] measured per site
        # over the calibration tiles, with x = the FLOAT forward's site
        # inputs (the same tap).  Added after dequantize (unet.quant_conv
        # reads qk["bias"]); one extra float+int8 conv per site,
        # calibration-time only.
        def bias_fn(p, t):
            corr: Dict[str, jnp.ndarray] = {}

            def tap(site: str, x: jnp.ndarray) -> None:
                if site in site_kernels:
                    yf = unet.conv(x, jnp.asarray(
                        site_kernels[site], jnp.float32
                    ))
                    yq = unet.quant_conv(x, kernels[site], scales[site])
                    corr[site] = jnp.mean(yf - yq, axis=(0, 1, 2))

            unet.apply(p, t, hp, variant, tap=tap)
            return corr

        corr = jax.jit(bias_fn)(params_h, tiles)
        for site, b in corr.items():
            kernels[site]["bias"] = jnp.asarray(
                np.asarray(b, np.float32)
            )
    return {"kernels": kernels, "scales": scales}


def sample_tiles(
    image: np.ndarray,
    hp: HParams,
    mean: float,
    std: float,
    *,
    n: int = 64,
    seed: int = 0,
) -> np.ndarray:
    """Draw n normalized patches [n, S, S, C] from a 2D image (or [C, H, W]
    stack) for calibration, evenly spread over the slide with a seeded
    jitter (deterministic: same slide -> same scales -> cache-friendly)."""
    if image.ndim == 2:
        image = image[None]
    c, h, w = image.shape
    s = hp.im_size
    rng = np.random.RandomState(seed)
    grid = max(1, int(np.ceil(np.sqrt(n))))
    out = np.empty((min(n, grid * grid), s, s, hp.n_channels), np.float32)
    k = 0
    for gi in range(grid):
        for gj in range(grid):
            if k >= out.shape[0]:
                break
            r0 = 0 if h <= s else int(
                np.clip(gi * (h - s) / max(grid - 1, 1)
                        + rng.randint(-s // 4, s // 4 + 1), 0, h - s)
            )
            c0 = 0 if w <= s else int(
                np.clip(gj * (w - s) / max(grid - 1, 1)
                        + rng.randint(-s // 4, s // 4 + 1), 0, w - s)
            )
            patch = np.zeros((s, s, c), np.float32)
            blk = image[:, r0 : r0 + s, c0 : c0 + s]
            patch[: blk.shape[1], : blk.shape[2], :] = np.transpose(
                blk, (1, 2, 0)
            ).astype(np.float32)
            if c == 1 and hp.n_channels > 1:
                patch = np.repeat(patch, hp.n_channels, axis=-1)
            out[k] = (patch - mean) / std
            k += 1
    return out


def sample_tiles_raw(
    planes,
    hp: HParams,
    mean: float,
    std: float,
    *,
    scale: Optional[float],
    outlier: float = -1,
    rescale: bool = True,
    n: int = 64,
    seed: int = 0,
    in_range=None,
) -> np.ndarray:
    """Calibration tiles for the RAW slide path: mirrors the device-side
    preprocessing of ``infer._build_slide`` (im2double -> clip to
    (min, max|percentile) -> rescale to 0.983 -> standardize) on sampled
    windows only.  Global lo/hi come from a 4x-decimated pass — scales
    need ~1% accuracy, not exact percentiles — so no full-size float copy
    of a multi-GB slide is ever materialized.

    ``in_range``: optional pinned (lo, hi) pair (or per-channel pairs) in
    the units of ``planes`` — used instead of the decimated-pass stats so
    calibration sees exactly the normalization a pinned-range inference
    applies.
    """
    planes = np.asarray(planes)
    if planes.ndim == 2:
        planes = planes[None]
    c, h, w = planes.shape
    s = hp.im_size
    if rescale:
        if in_range is not None:
            ir = np.asarray(in_range, np.float64).reshape(-1, 2)
            if ir.shape[0] == 1 and c > 1:
                ir = np.repeat(ir, c, axis=0)
            lo = ir[:, 0].astype(np.float32)
            hi = ir[:, 1].astype(np.float32)
            if scale is not None:
                lo, hi = lo / scale, hi / scale
        else:
            dec = planes[:, ::4, ::4].astype(np.float32)
            if scale is not None:
                dec /= scale
            lo = dec.min(axis=(1, 2))
            hi = (
                np.percentile(dec, outlier, axis=(1, 2))
                if outlier != -1
                else dec.max(axis=(1, 2))
            )
    rng = np.random.RandomState(seed)
    grid = max(1, int(np.ceil(np.sqrt(n))))
    out = np.empty((min(n, grid * grid), s, s, hp.n_channels), np.float32)
    k = 0
    for gi in range(grid):
        for gj in range(grid):
            if k >= out.shape[0]:
                break
            r0 = 0 if h <= s else int(
                np.clip(gi * (h - s) / max(grid - 1, 1)
                        + rng.randint(-s // 4, s // 4 + 1), 0, h - s)
            )
            c0 = 0 if w <= s else int(
                np.clip(gj * (w - s) / max(grid - 1, 1)
                        + rng.randint(-s // 4, s // 4 + 1), 0, w - s)
            )
            blk = planes[:, r0 : r0 + s, c0 : c0 + s].astype(np.float32)
            if scale is not None:
                blk /= scale
            if rescale:
                for ci in range(c):
                    b = np.clip(blk[ci], lo[ci], hi[ci])
                    blk[ci] = (
                        (b - lo[ci]) / max(hi[ci] - lo[ci], 1e-12) * 0.983
                    )
            patch = np.zeros((s, s, c), np.float32)
            patch[: blk.shape[1], : blk.shape[2], :] = np.transpose(
                blk, (1, 2, 0)
            )
            if c == 1 and hp.n_channels > 1:
                patch = np.repeat(patch, hp.n_channels, axis=-1)
            out[k] = (patch - mean) / std
            k += 1
    return out


# the int8 conv primitive itself lives in core.unet (quant_conv) so that
# unet.apply can execute it without importing this module (cycle-free);
# re-exported here for API symmetry
quant_conv = unet.quant_conv
