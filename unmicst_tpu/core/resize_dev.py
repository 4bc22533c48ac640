"""Device-side resize matching :func:`unmicst_tpu.io.preprocess.resize`.

The reference resizes on the host with ``skimage.transform.resize``
(``UnMicst1-5.py:813-815``); the r2 device-side slide path fused the
scale-1 preprocessing onto the chip, and this module extends that path
to any ``--scalingFactor``: the gaussian anti-alias (sigma=(f-1)/2,
truncate 4.0, mirror boundary — skimage's downscale default) runs as a
tap-sum over shifted slices and the bilinear resample as two take+lerp
stages — the same op chain the host ``resize`` computes in float64,
here in float32 on the device (end-to-end parity <= 1 uint8 level,
pinned by ``test_infer_slide_scale.py``).

Everything static (kernel taps, gather indices, lerp fractions) is
precomputed in numpy at trace time; only the image rides through jnp
ops, so the whole resize fuses into the jitted slide program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _gauss_kernel(sigma: float) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d weights (truncate=4.0)."""
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _fold(coords: np.ndarray, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Mirror-fold sample coords into [0, n-1] -> (lo index, fraction);
    the numpy math mirrors io/preprocess._fold_coords."""
    c = np.abs(coords)
    c = np.where(c > n - 1, 2.0 * (n - 1) - c, c)
    lo = np.floor(c).astype(np.int32)
    np.clip(lo, 0, max(n - 2, 0), out=lo)
    return lo, (c - lo).astype(np.float32)


class ResizePlan:
    """Static pieces of one (in_shape -> out_shape) resize."""

    def __init__(self, in_shape: Tuple[int, int],
                 out_shape: Tuple[int, int]):
        in_h, in_w = in_shape
        out_h, out_w = out_shape
        if min(in_h, in_w, out_h, out_w) < 1:
            raise ValueError(
                f"degenerate resize {in_shape} -> {out_shape}"
            )
        self.identity = (in_h, in_w) == (out_h, out_w)
        fr, fc = in_h / out_h, in_w / out_w
        sr, sc = max(0.0, (fr - 1.0) / 2.0), max(0.0, (fc - 1.0) / 2.0)
        self.kr: Optional[np.ndarray] = _gauss_kernel(sr) if sr > 0 else None
        self.kc: Optional[np.ndarray] = _gauss_kernel(sc) if sc > 0 else None
        rows = (np.arange(out_h) + 0.5) * fr - 0.5
        cols = (np.arange(out_w) + 0.5) * fc - 0.5
        self.rlo, self.rfrac = _fold(rows, in_h)
        self.clo, self.cfrac = _fold(cols, in_w)
        self.n_in = (in_h, in_w)

    # -- traced application (jnp ops only past this point) -------------------

    def _blur_axis(self, x, kernel: np.ndarray, axis: int):
        import jax.numpy as jnp

        radius = (len(kernel) - 1) // 2
        n = x.shape[axis]
        if radius >= n:
            # extreme downscale of a tiny axis: the reflect pad would
            # exceed the axis; gather each tap through a precomputed
            # mirror index map instead (scipy mirror = period 2(n-1))
            out = None
            base = np.arange(n, dtype=np.int64)
            for i, w in enumerate(kernel):
                idx = base + (i - radius)
                if n == 1:
                    idx = np.zeros_like(idx)
                else:
                    period = 2 * (n - 1)
                    idx = np.abs(idx) % period
                    idx = np.where(idx > n - 1, period - idx, idx)
                term = jnp.take(x, idx, axis=axis) * jnp.float32(w)
                out = term if out is None else out + term
            return out
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad, mode="reflect")  # numpy reflect == scipy mirror
        out = None
        for i, w in enumerate(kernel):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + n)
            term = xp[tuple(sl)] * jnp.float32(w)
            out = term if out is None else out + term
        return out

    def _lerp_axis(self, x, lo: np.ndarray, frac: np.ndarray, axis: int):
        import jax.numpy as jnp

        n = x.shape[axis]
        if n == 1:
            reps = [1] * x.ndim
            reps[axis] = len(lo)
            return jnp.tile(x, reps)
        a = jnp.take(x, lo, axis=axis)
        b = jnp.take(x, np.minimum(lo + 1, n - 1), axis=axis)
        shape = [1] * x.ndim
        shape[axis] = len(lo)
        f = jnp.asarray(frac).reshape(shape)
        return a + (b - a) * f

    def apply(self, x):
        """Resize the last two axes of a float32 array ([..., H, W])."""
        if self.identity:
            return x
        if self.kr is not None:
            x = self._blur_axis(x, self.kr, x.ndim - 2)
        if self.kc is not None:
            x = self._blur_axis(x, self.kc, x.ndim - 1)
        x = self._lerp_axis(x, self.rlo, self.rfrac, x.ndim - 2)
        return self._lerp_axis(x, self.clo, self.cfrac, x.ndim - 1)
