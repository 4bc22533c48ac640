"""Functional residual UNet2D — both reference architecture generations.

One parameterized implementation replaces the four near-identical copies in
the reference (``UnMicst.py:29-187``, ``UnMicst1-5.py:33-237``,
``UnMicst2.py:30-235``, ``UnMicstCyto2.py:27-231``).  Pure functions over a
params pytree; ``jax.jit``/``pjit`` friendly; NHWC with HWIO kernels so the
TF1 checkpoints load without transposition.

Topology (shared by both generations, ``UnMicst.py:120-187``)::

    x: [B, S, S, C]
    for i in 0..nLayers-1:              # down_samp_layer
        c   = conv_ks(x); for extras: c = conv_ks(act(c))
        s   = conv(x)                   # 1x1 (legacy) | ks x ks (v2) shortcut
        y   = legacy: BN(act(c+s)) | v2: act(BN(c+s)) [+ dropout, duo only]
        skip[i] = x;  x = maxpool2(y)
    b = legacy: act(conv_ks(x)) | v2: dropout(act(BN(conv_ks(x))))
    for i = nLayers-1..0:               # up_samp_layer
        u  = act(conv_transpose_ks(b, stride 2))
        cc = concat([skip[i], u], channel)      # skip FIRST (UnMicst.py:156)
        b  = legacy: act(conv_ks(cc)) | v2: act(BN(conv_ks(cc))) [+ extras]
    t = conv_1x1(b); v2: t = BN(t)
    out = softmax(t, channel)

Generation deltas (verified against the reference sources):

* activation: ReLU (legacy) vs leaky-ReLU alpha=0.2 (v2, TF default)
* BN placement: legacy only in down layers, AFTER activation
  (``UnMicst.py:99``); v2 BEFORE activation everywhere, plus bottom/up/top BN
  (``UnMicst1-5.py:114,136-138,198-201,220-222``)
* shortcut kernel: 1x1 legacy (``UnMicst.py:95-97``) vs ks x ks v2
  (``UnMicst1-5.py:106-112``)
* dropout (train only): none legacy; v2 bottom 0.35 solo / 0.3 duo / 0.2
  cyto; duo additionally 0.05*i in down and 0.25-0.05*i in up layers
  (``UnMicst2.py:114,137,203``)
* kernel regularizers (train only): none legacy; L1(8e-5) solo; L2(0.01
  down / 0.005 up+top) duo; L2(1e-5) cyto

BN semantics match ``tf.layers.batch_normalization`` defaults: epsilon=1e-3,
momentum=0.99, moving stats at inference.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from unmicst_tpu.core.hp import HParams

Params = Dict[str, Any]

BN_EPS = 1e-3  # tf.layers.batch_normalization default
BN_MOMENTUM = 0.99
LEAKY_ALPHA = 0.2  # tf.nn.leaky_relu default


@dataclasses.dataclass(frozen=True)
class VariantConfig:
    """Per-tool architecture/training deltas (SURVEY #2.1 rows 1-2)."""

    name: str
    legacy: bool
    dropout_bottom: float = 0.0
    dropout_down_per_layer: float = 0.0  # rate = c * layer_index
    dropout_up_base: float = 0.0  # rate = base - c * layer_index
    dropout_up_per_layer: float = 0.0
    reg_kind: str = "none"  # 'none' | 'l1' | 'l2'
    reg_down: float = 0.0
    reg_up: float = 0.0  # also top

    @property
    def act(self):
        if self.legacy:
            return jax.nn.relu
        return partial(jax.nn.leaky_relu, negative_slope=LEAKY_ALPHA)


VARIANTS = {
    # UnMicst.py / batch*.py
    "legacy": VariantConfig(name="legacy", legacy=True),
    # UnMicst1-5.py (:84 L1 8e-5, :139 dropout .35)
    "v2": VariantConfig(
        name="v2", legacy=False, dropout_bottom=0.35, reg_kind="l1",
        reg_down=8e-5, reg_up=8e-5,
    ),
    # UnMicst2.py (:82 L2 .01, :114 dropout .05*i, :137 dropout .3,
    #             :158 L2 .005, :203 dropout .25-.05*i)
    "duo": VariantConfig(
        name="duo", legacy=False, dropout_bottom=0.3,
        dropout_down_per_layer=0.05, dropout_up_base=0.25,
        dropout_up_per_layer=0.05, reg_kind="l2", reg_down=0.01, reg_up=0.005,
    ),
    # UnMicstCyto2.py (:79,155 L2 1e-5, :134 dropout .2)
    "cyto2": VariantConfig(
        name="cyto2", legacy=False, dropout_bottom=0.2, reg_kind="l2",
        reg_down=1e-5, reg_up=1e-5,
    ),
}

def get_variant(name: str) -> VariantConfig:
    return VARIANTS[name]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,  # 1 bf16 MXU pass
    "high": jax.lax.Precision.HIGH,  # 3 passes (~bf16x3 f32 emulation)
    "highest": jax.lax.Precision.HIGHEST,  # 6 passes (full f32)
}


def _precision(compute_dtype, precision=None):
    # Explicit override wins; otherwise f32 mode defaults to full-f32 MXU
    # passes (TPU would silently round to bf16), bf16 mode to DEFAULT.
    if precision is not None:
        if isinstance(precision, str):
            if precision not in _PRECISIONS:
                raise ValueError(
                    f"precision {precision!r} not in "
                    f"{sorted(_PRECISIONS)}"
                )
            return _PRECISIONS[precision]
        return precision
    return jax.lax.Precision.HIGHEST if compute_dtype is None else None


def conv(
    x: jnp.ndarray, kernel: jnp.ndarray, compute_dtype=None, precision=None,
    grad_safe: bool = False,
) -> jnp.ndarray:
    """SAME conv, stride 1, NHWC/HWIO — MXU-friendly with f32 accumulation.

    ``grad_safe``: mixed-dtype ``preferred_element_type`` upcasts have no
    transpose rule, so the TRAINING path (bf16 compute under
    ``value_and_grad``) rounds the conv output to ``compute_dtype`` and
    upcasts explicitly — the standard mixed-precision recipe; inference
    keeps the f32-accumulated output the r2 numbers were measured on.
    """
    precision = _precision(compute_dtype, precision)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    if grad_safe and compute_dtype is not None:
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME", dimension_numbers=_DN,
            precision=precision,
        ).astype(jnp.float32)
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.float32, precision=precision,
    )


def conv_transpose(
    x: jnp.ndarray, kernel: jnp.ndarray, stride: int, compute_dtype=None,
    precision=None, grad_safe: bool = False,
) -> jnp.ndarray:
    """``tf.nn.conv2d_transpose`` parity (``UnMicst.py:153-155``).

    The TF kernel layout is ``[ks, ks, out, in]``; with
    ``transpose_kernel=True`` jax.lax.conv_transpose consumes exactly that
    layout under NHWC/HWIO dimension numbers and reproduces the
    gradient-of-conv semantics TF uses, with SAME producing
    ``out = in * stride``.
    """
    precision = _precision(compute_dtype, precision)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    if grad_safe and compute_dtype is not None:
        return jax.lax.conv_transpose(
            x, kernel, (stride, stride), "SAME", dimension_numbers=_DN,
            transpose_kernel=True, precision=precision,
        ).astype(jnp.float32)
    return jax.lax.conv_transpose(
        x, kernel, (stride, stride), "SAME", dimension_numbers=_DN,
        transpose_kernel=True, preferred_element_type=jnp.float32,
        precision=precision,
    )


def quant_conv(
    x: jnp.ndarray, qk: Params, in_scale: jnp.ndarray
) -> jnp.ndarray:
    """int8 SAME conv (s8 x s8 -> s32 on the MXU's double-rate int path),
    dequantized to f32.

    ``in_scale``: PER-INPUT-CHANNEL activation scales ``a[cin]`` from
    calibration; ``qk["w8"]`` quantizes ``a[cin] * W`` (the scales are
    folded into the weights host-side, ``core/quant.py``), so the int32
    accumulator directly approximates ``sum_k (x_k/a_k) * (a_k w_k) =
    conv(x, W)`` and dequantization is one per-output-channel multiply
    ``qk["w_scale"]``.  Per-channel activation resolution costs nothing at
    runtime and is what keeps real-weight error down: post-conv channel
    ranges differ by orders of magnitude, and the skip/upsample concat
    feeding the up-path convs doubly so.  Lives here (not quant.py) so
    ``apply`` can call it without a circular import."""
    x8 = jnp.clip(
        jnp.round(x.astype(jnp.float32) / in_scale), -127, 127
    ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x8, qk["w8"], (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, qk["w8"].shape, _DN
        ),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * qk["w_scale"]
    if "bias" in qk:
        # per-output-channel mean-shift correction measured on the
        # calibration tiles (core/quant.py::calibrate bias_correct) —
        # cancels the systematic rounding bias of the int8 path
        y = y + qk["bias"]
    return y


def max_pool(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """2x2 SAME max-pool (``UnMicst.py:101-102``)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, window, window, 1), "SAME",
    )


def bn_apply(x: jnp.ndarray, bn: Params) -> jnp.ndarray:
    """Inference-mode batch norm with moving statistics (folded scale/bias)."""
    scale = bn["gamma"] * jax.lax.rsqrt(bn["moving_variance"] + BN_EPS)
    bias = bn["beta"] - bn["moving_mean"] * scale
    return x.astype(jnp.float32) * scale + bias


def bn_train(
    x: jnp.ndarray, bn: Params
) -> Tuple[jnp.ndarray, Params]:
    """Training-mode BN: normalize with batch stats, update moving stats.

    TF (``tf.layers.batch_normalization``, fused) normalizes with the
    *biased* batch variance but feeds the Bessel-corrected (unbiased,
    ``N/(N-1)``) variance into the moving-average update — verified
    empirically against live TF and pinned by the 50-step trajectory
    oracle (``tests/fixtures/oracle_traj_*``; at a 4x4 bottom layer the
    correction is 3%, compounding over steps).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.var(x32, axis=(0, 1, 2))
    y = (x32 - mean) * jax.lax.rsqrt(var + BN_EPS) * bn["gamma"] + bn["beta"]
    n = x32.shape[0] * x32.shape[1] * x32.shape[2]
    uvar = var * (n / max(n - 1, 1))
    new_bn = dict(
        bn,
        moving_mean=bn["moving_mean"] * BN_MOMENTUM + mean * (1 - BN_MOMENTUM),
        moving_variance=bn["moving_variance"] * BN_MOMENTUM
        + uvar * (1 - BN_MOMENTUM),
    )
    return y, new_bn


def _dropout(x, rate, rng, train):
    """``tf.layers.dropout``: inverted dropout, active only in training."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_params(
    rng: jax.Array, hp: HParams, variant: str = "legacy", dtype=jnp.float32
) -> Params:
    """Initialize a params pytree matching the reference initializers.

    Legacy: all kernels ``truncated_normal(stddev=stdDev0)``
    (``UnMicst.py:82-84``).  v2: the main down kernel keeps truncated-normal
    while every ``tf.get_variable`` kernel uses VarianceScaling fan-in
    (``UnMicst1-5.py:86-97``).  BN: gamma=1, beta=0, moving stats (0, 1).
    """
    cfg = get_variant(variant)
    widths = hp.n_out_x
    ks = hp.ks
    n_extra = hp.n_extra_convs
    trunc = lambda key, shape: (
        hp.std_dev0 * jax.random.truncated_normal(key, -2.0, 2.0, shape)
    ).astype(dtype)
    vs_init = jax.nn.initializers.variance_scaling(
        1.0, "fan_in", "truncated_normal"
    )
    vscale = lambda key, shape: vs_init(key, shape, dtype)

    def bn_init(width):
        return {
            "gamma": jnp.ones((width,), jnp.float32),
            "beta": jnp.zeros((width,), jnp.float32),
            "moving_mean": jnp.zeros((width,), jnp.float32),
            "moving_variance": jnp.ones((width,), jnp.float32),
        }

    # exact consumption is 2*n_layers*(n_extra_convs+2)+2 draws; split
    # with slack so no config can hit a bare StopIteration mid-init
    n_keys = 2 * hp.n_layers * (hp.n_extra_convs + 2) + 8
    keys = iter(jax.random.split(rng, max(n_keys, 64)))
    params: Params = {"down": [], "up": []}
    for i in range(hp.n_layers):
        layer = {
            "kernel1": trunc(next(keys), (ks, ks, widths[i], widths[i + 1])),
            "extra": [
                (trunc if cfg.legacy else vscale)(
                    next(keys), (ks, ks, widths[i + 1], widths[i + 1])
                )
                for _ in range(n_extra)
            ],
            "shortcut": (
                trunc(next(keys), (1, 1, widths[i], widths[i + 1]))
                if cfg.legacy
                else vscale(next(keys), (ks, ks, widths[i], widths[i + 1]))
            ),
            "bn": bn_init(widths[i + 1]),
        }
        params["down"].append(layer)

    bottom_shape = (ks, ks, widths[hp.n_layers], widths[hp.n_layers + 1])
    params["bottom"] = {
        "kernel1": (trunc if cfg.legacy else vscale)(next(keys), bottom_shape)
    }
    if not cfg.legacy:
        params["bottom"]["bn"] = bn_init(widths[hp.n_layers + 1])

    # up layers stored by reference index: params['up'][i] == lu{i}
    for i in range(hp.n_layers):
        # kernel1/kernelU: [ks, ks, out=widths[i+1], in=widths[i+2]]
        layer = {
            "kernel1": (trunc if cfg.legacy else vscale)(
                next(keys), (ks, ks, widths[i + 1], widths[i + 2])
            ),
            "kernel2": (trunc if cfg.legacy else vscale)(
                next(keys), (ks, ks, widths[i] + widths[i + 1], widths[i + 1])
            ),
            "extra": [
                (trunc if cfg.legacy else vscale)(
                    next(keys), (ks, ks, widths[i + 1], widths[i + 1])
                )
                for _ in range(n_extra)
            ],
        }
        if not cfg.legacy:
            layer["bn"] = bn_init(widths[i + 1])
        params["up"].append(layer)

    params["top"] = {
        "kernel": (trunc if cfg.legacy else vscale)(
            next(keys), (1, 1, widths[1], hp.n_classes)
        )
    }
    if not cfg.legacy:
        params["top"]["bn"] = bn_init(hp.n_classes)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _fuse_residual(layer, train: bool):
    """Inference-time kernel for ``conv(h,K1) + conv(h,shortcut)`` as one
    conv, or None when the fold doesn't apply (extras break linearity;
    training needs the kernels separate for grads/regularizers).

    A 1x1 legacy shortcut embeds at the center tap of an odd ks x ks
    kernel (exactly equal under SAME padding)."""
    if train or layer["extra"]:
        return None
    k1, ks = layer["kernel1"], layer["shortcut"]
    if k1.shape == ks.shape:
        return k1 + ks
    kh, kw = k1.shape[:2]
    if ks.shape[:2] == (1, 1) and kh % 2 and kw % 2:
        return k1.at[kh // 2, kw // 2].add(ks[0, 0])
    return None


def apply(
    params: Params,
    x: jnp.ndarray,
    hp: HParams,
    variant: str = "legacy",
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=None,
    precision=None,
    return_logits: bool = False,
    tap=None,
    quant: Optional[Params] = None,
) -> jnp.ndarray | Tuple[jnp.ndarray, Params]:
    """Forward pass.  ``x``: [B, S, S, C] float.  Returns softmax [B, S, S, K].

    In training mode returns ``(probs, new_params)`` where ``new_params``
    carries updated BN moving statistics (the functional replacement for
    TF's UPDATE_OPS control dependency, ``UnMicst1-5.py:375-380``).
    ``train=True`` with ``rng=None`` runs DETERMINISTIC training —
    dropout off, BN still in batch-stats mode — the contract the
    trajectory/convergence oracles rely on (TF and JAX cannot share a
    dropout mask stream); pass a key for reference-faithful training.

    ``compute_dtype=jnp.bfloat16`` runs convolutions in bf16 with f32
    accumulation (the TPU fast path); BN/softmax stay f32.
    ``precision``: 'default' | 'high' | 'highest' (or a jax.lax.Precision)
    overriding the per-dtype MXU pass count — 'high' (3 bf16 passes) is the
    measured sweet spot for f32 parity at ~3x the DEFAULT cost instead of
    HIGHEST's 6x.

    ``tap``: optional ``tap(site, x)`` callback invoked with each plain
    conv's input (quantization calibration; run eagerly).  ``quant``: a
    ``core.quant.QuantState`` pytree — plain convs whose site appears in
    ``quant['kernels']`` run int8 (``quant_conv``); inference only.
    """
    if quant is not None and train:
        raise ValueError("quantized forward is inference-only")
    cfg = get_variant(variant)
    act = cfg.act
    # spatial contract: every down level must divide evenly, else the
    # SAME conv_transpose (out = in*stride) cannot meet its skip's odd
    # size.  The reference threads TF's explicit output_shape instead
    # (UnMicst.py:152-155); no shipped zoo model needs it, so this is a
    # loud documented limit rather than a cryptic concat trace error.
    s_chk = x.shape[1]
    for _lvl in range(hp.n_layers):
        if s_chk % hp.down_samp_fact:
            raise NotImplementedError(
                f"spatial size {x.shape[1]} not divisible by "
                f"down_samp_fact^n_layers "
                f"({hp.down_samp_fact}^{hp.n_layers}); odd intermediate "
                "levels need TF-style explicit transpose output_shape"
            )
        s_chk //= hp.down_samp_fact
    conv_p = partial(conv, precision=precision, grad_safe=train)
    conv_transpose_p = partial(conv_transpose, precision=precision,
                               grad_safe=train)

    def site_conv(h, site, kernel):
        """Plain conv with a calibration tap and optional int8 execution.
        Site names are the contract with ``core.quant.conv_sites``."""
        if tap is not None:
            tap(site, h)
        if quant is not None and site in quant["kernels"]:
            return quant_conv(h, quant["kernels"][site],
                              quant["scales"][site])
        return conv_p(h, kernel, compute_dtype)
    dsf = hp.down_samp_fact
    new_params = jax.tree_util.tree_map(lambda a: a, params) if train else None
    rngs = iter(jax.random.split(rng, 2 * hp.n_layers + 4)) if rng is not None else None
    next_rng = (lambda: next(rngs)) if rngs is not None else (lambda: None)

    def run_bn(h, bn_params, setter):
        if train:
            h, new_bn = bn_train(h, bn_params)
            setter(new_bn)
            return h
        return bn_apply(h, bn_params)

    skips = []
    h = x
    for i, layer in enumerate(params["down"]):
        skips.append(h)
        fused = _fuse_residual(layer, train)
        if fused is not None:
            # conv(h,K1)+conv(h,Ks) == conv(h,K1+Ks) by linearity: with no
            # extra convs both kernels see the same input, so the residual
            # add folds into the weights — half the down-path conv FLOPs
            # for every v2 zoo model (nExtraConvs=0). Inference only:
            # training needs separate grads/regularizers per kernel.
            pre = site_conv(h, f"down{i}", fused)
        else:
            c = site_conv(h, f"down{i}.k1", layer["kernel1"])
            for j, ke in enumerate(layer["extra"]):
                c = site_conv(act(c), f"down{i}.extra{j}", ke)
            short = site_conv(h, f"down{i}.short", layer["shortcut"])
            pre = c + short

        def set_down_bn(nb, i=i):
            new_params["down"][i]["bn"] = nb

        if cfg.legacy:
            y = run_bn(act(pre), layer["bn"], set_down_bn)  # UnMicst.py:99
        else:
            y = act(run_bn(pre, layer["bn"], set_down_bn))  # UnMicst1-5.py:114
            y = _dropout(y, cfg.dropout_down_per_layer * i, next_rng(), train)
        h = max_pool(y, dsf)

    b = site_conv(h, "bottom", params["bottom"]["kernel1"])
    if cfg.legacy:
        b = act(b)  # UnMicst.py:113-114
    else:

        def set_bottom_bn(nb):
            new_params["bottom"]["bn"] = nb

        b = act(run_bn(b, params["bottom"]["bn"], set_bottom_bn))
        b = _dropout(b, cfg.dropout_bottom, next_rng(), train)

    h = b
    for step in range(hp.n_layers):
        i = hp.n_layers - 1 - step  # reference lu index (UnMicst.py:181-182)
        layer = params["up"][i]
        u = act(conv_transpose_p(h, layer["kernel1"], dsf, compute_dtype))
        # NOTE: splitting this concat-conv by linearity (conv(a,K[:Ca]) +
        # conv(b,K[Ca:]), skipping the concat materialization) measured
        # +6.6% on an isolated up-layer but -5.8% in the full stripe
        # program — XLA already elides/fuses the concat in context.
        # Killed with numbers; see BASELINE.md r3.  (The int8 path keeps
        # the fused conv too: per-channel activation scales absorb the
        # skip/upsample range mismatch without a split.)
        cc = jnp.concatenate([skips[i].astype(u.dtype), u], axis=-1)
        cv = site_conv(cc, f"up{i}.k2", layer["kernel2"])

        def set_up_bn(nb, i=i):
            new_params["up"][i]["bn"] = nb

        if cfg.legacy:
            cv = act(cv)
        else:
            cv = act(run_bn(cv, layer["bn"], set_up_bn))
        for j, ke in enumerate(layer["extra"]):
            cv = act(site_conv(cv, f"up{i}.extra{j}", ke))
        if not cfg.legacy and cfg.dropout_up_base > 0:
            cv = _dropout(
                cv, cfg.dropout_up_base - cfg.dropout_up_per_layer * i,
                next_rng(), train,
            )
        h = cv

    t = conv_p(h, params["top"]["kernel"], compute_dtype)
    if not cfg.legacy:

        def set_top_bn(nb):
            new_params["top"]["bn"] = nb

        t = run_bn(t, params["top"]["bn"], set_top_bn)
    t = t.astype(jnp.float32)
    out = t if return_logits else jax.nn.softmax(t, axis=-1)
    if train:
        return out, new_params
    return out


def regularization_loss(params: Params, variant: str) -> jnp.ndarray:
    """Kernel regularization matching per-variant reference settings.

    The reference registers regularizers only on the ``tf.get_variable``
    kernels (shortcut/extra/bottom/up/top for v2; none for legacy) —
    ``UnMicst1-5.py:84,106-109,126-129,160-174,213-217``.
    """
    cfg = get_variant(variant)
    if cfg.reg_kind == "none":
        return jnp.zeros(())
    f = (lambda k: jnp.sum(jnp.abs(k))) if cfg.reg_kind == "l1" else (
        lambda k: jnp.sum(jnp.square(k))
    )
    # Note: the extra-conv kernels carry no regularizer in the reference
    # (get_variable calls without the regularizer kwarg, UnMicst1-5.py:94-97,
    # :171-174), so they are excluded here too.
    total = jnp.zeros(())
    for layer in params["down"]:
        total += cfg.reg_down * f(layer["shortcut"])
    total += cfg.reg_down * f(params["bottom"]["kernel1"])
    for layer in params["up"]:
        total += cfg.reg_up * f(layer["kernel1"])
        total += cfg.reg_up * f(layer["kernel2"])
    total += cfg.reg_up * f(params["top"]["kernel"])
    return total
