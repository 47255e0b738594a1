"""Spatial resize / pooling primitives with torch-parity semantics.

mmseg resizes logits/features with ``F.interpolate(..., align_corners=...)``
(reference gaiaseg/models/decode_heads/dynamic_decode_head.py:147-170,
dynamic_psp_head.py:60-66) and pools with ``AdaptiveAvgPool2d``
(dynamic_psp_head.py:33). Both are reimplemented here for NHWC:

- ``align_corners=False`` maps to ``jax.image.resize`` (half-pixel centers,
  identical sampling grid to torch).
- ``align_corners=True`` is a separable gather with corner-aligned sample
  positions, matching torch bit-for-bit on the grid definition.
- ``adaptive_avg_pool2d`` uses torch's floor/ceil bin edges, computed exactly
  via 2D integral images (one cumsum, then 4 gathers — no data-dependent
  window loops, so XLA tiles it cleanly).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _axis_weights(in_size: int, out_size: int):
    """Corner-aligned linear sample positions: lo idx, hi idx, hi weight."""
    if out_size == 1 or in_size == 1:
        pos = jnp.zeros((out_size,), jnp.float32)
    else:
        pos = jnp.arange(out_size, dtype=jnp.float32) * (
            (in_size - 1) / (out_size - 1))
    lo = jnp.clip(jnp.floor(pos), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (pos - lo.astype(jnp.float32))
    return lo, hi, w


def resize_bilinear(x: Array, size: Tuple[int, int],
                    align_corners: bool = False) -> Array:
    """NHWC bilinear resize to ``size=(H, W)``."""
    n, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w):
        return x
    if not align_corners:
        # antialias=False: torch F.interpolate / cv2 sampling semantics
        return jax.image.resize(x, (n, oh, ow, c), method="bilinear",
                                antialias=False).astype(x.dtype)
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ylo, yhi, wy = _axis_weights(h, oh)
    xlo, xhi, wx = _axis_weights(w, ow)
    top = jnp.take(xf, ylo, axis=1)
    bot = jnp.take(xf, yhi, axis=1)
    rows = top + (bot - top) * wy[None, :, None, None]
    left = jnp.take(rows, xlo, axis=2)
    right = jnp.take(rows, xhi, axis=2)
    out = left + (right - left) * wx[None, None, :, None]
    return out.astype(dtype)


def resize(x: Array, size: Tuple[int, int] = None, scale_factor: float = None,
           align_corners: bool = False) -> Array:
    if size is None:
        size = (int(x.shape[1] * scale_factor), int(x.shape[2] * scale_factor))
    return resize_bilinear(x, size, align_corners)


def adaptive_avg_pool2d(x: Array, output_size) -> Array:
    """NHWC adaptive average pooling, torch bin-edge semantics:
    bin i spans [floor(i*H/s), ceil((i+1)*H/s))."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    n, h, w, c = x.shape
    sh, sw = int(output_size[0]), int(output_size[1])
    if (sh, sw) == (h, w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # 2D integral image with a leading zero row/col
    integ = jnp.cumsum(jnp.cumsum(xf, axis=1), axis=2)
    integ = jnp.pad(integ, ((0, 0), (1, 0), (1, 0), (0, 0)))

    def edges(in_size, out_size):
        i = jnp.arange(out_size)
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        return start.astype(jnp.int32), end.astype(jnp.int32)

    y0, y1 = edges(h, sh)
    x0, x1 = edges(w, sw)
    # sum over bin = I[y1,x1] - I[y0,x1] - I[y1,x0] + I[y0,x0]
    a = integ[:, y1][:, :, x1]
    b = integ[:, y0][:, :, x1]
    cc = integ[:, y1][:, :, x0]
    d = integ[:, y0][:, :, x0]
    sums = a - b - cc + d
    area = ((y1 - y0).astype(jnp.float32)[:, None]
            * (x1 - x0).astype(jnp.float32)[None, :])
    return (sums / area[None, :, :, None]).astype(dtype)
