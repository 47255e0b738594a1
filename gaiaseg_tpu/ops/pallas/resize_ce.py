"""Fused bilinear-upsample + softmax cross-entropy Pallas TPU kernel.

Why: mmseg loss semantics resize decode-head logits to LABEL resolution
before the CE (reference dynamic_decode_head.py:219-239) — at 512x512
batch 8 that materializes a [8,512,512,19] float32 tensor whose minor dim
pads 19 -> 128 lanes, so the fwd+bwd chain moves ~6GB of pure HBM traffic
and costs ~7.5ms of a ~48ms train step (tools/perf_probe.py, v5e). The
upsampled logits are never wanted — only the scalar loss and the gradient
at SOURCE resolution are.

Design: bilinear resize is separable and linear, ``up = A_H @ src @ A_W``
with static 2-tap interpolation matrices. The width interp (``mid = src @
A_W``) stays in XLA (tiny: [N,h,W,C]). The kernel streams label row-blocks
and expands ``mid`` rows on the fly IN VMEM — one output block of f = H/h
rows interpolates between 3 consecutive ``mid`` rows — computing
logsumexp/NLL partial sums without ever writing full-res logits. Layout is
``[h, C, W]`` per image: C=19 on sublanes / W on lanes (no 19->128 lane
padding), and the dynamically-sliced row dim h stays OUTSIDE the tiled
last-two dims (Mosaic requires static 8-aligned dynamic starts there).
The custom VJP recomputes the softmax per tile and accumulates
``grad_mid`` rows in a VMEM-resident output block; the width adjoint
(``grad_mid @ A_W^T``) is again XLA. Total HBM traffic drops to reading
labels + ~5MB of mids.

Numerics: align_corners=False half-pixel sampling with edge clamp —
identical grid to ops/resize.py::resize_bilinear (jax.image.resize
antialias=False) — but interpolation runs in f32 where the XLA path
interpolates in the logit dtype (bf16); equality is property-tested at
f32 and within bf16 tolerance otherwise (tests/test_resize_ce.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[in_size, out_size] f32: column X holds the (<=2-tap) half-pixel
    bilinear weights with edge clamp (jax.image.resize antialias=False)."""
    A = np.zeros((in_size, out_size), np.float32)
    if in_size == out_size:
        np.fill_diagonal(A, 1.0)
        return A
    scale = in_size / out_size
    for X in range(out_size):
        fx = (X + 0.5) * scale - 0.5
        lo = int(np.floor(fx))
        w = fx - lo
        A[min(max(lo, 0), in_size - 1), X] += 1.0 - w
        A[min(max(lo + 1, 0), in_size - 1), X] += w
    return A


def _row_weights(factor: int):
    """Per-output-row hi-tap weights inside one f-row block, as [f/2,1,1]
    iota-derived arrays (Pallas kernels cannot capture host constants):
    first half interpolates (row j-1, row j) with weight 1+d, second half
    (row j, row j+1) with weight d, where d = (r+0.5)/f - 0.5."""
    f2 = factor // 2
    # Mosaic iota must be integer-typed; convert after
    rr = jax.lax.broadcasted_iota(jnp.int32, (f2, 1, 1), 0).astype(jnp.float32)
    wf = 1.0 + (rr + 0.5) / factor - 0.5          # r in [0, f/2)
    ws = (rr + f2 + 0.5) / factor - 0.5           # r in [f/2, f)
    return wf, ws


def _expand_rows(mid_ref, j, h, f):
    """Interpolate one f-row output block from mid rows [h,C,W] in VMEM.

    Returns (up_first, up_second) each [f/2, C, W] plus the slice start s0
    and edge predicates — shared by fwd and bwd kernels. ``mid_ref`` is the
    (1,h,C,W) block ref: dynamic slicing must happen on the ref (pl.ds) on a
    NON-tiled dim — value-level dynamic_slice has no Pallas TPU lowering and
    dynamic starts on the last-two (tiled) dims need static 8-alignment."""
    wf, ws = _row_weights(f)
    s0 = jnp.clip(j - 1, 0, h - 3)
    r3 = mid_ref[0, pl.ds(s0, 3), :, :]                   # [3, C, W]
    r0, r1, r2 = r3[0], r3[1], r3[2]
    top = j == 0
    bot = j == h - 1
    fh_lo = jnp.where(top, r0, jnp.where(bot, r1, r0))
    fh_hi = jnp.where(top, r0, jnp.where(bot, r2, r1))
    sh_lo = jnp.where(bot, r2, jnp.where(top, r0, r1))
    sh_hi = jnp.where(bot, r2, jnp.where(top, r1, r2))
    up_f = fh_lo[None] * (1.0 - wf) + fh_hi[None] * wf
    up_s = sh_lo[None] * (1.0 - ws) + sh_hi[None] * ws
    return up_f, up_s, s0, top, bot


def _nll_parts(up, lab, num_classes, ignore_index):
    """(sum nll*valid, sum valid, lse, pick_mask) for one half-block.
    ``up`` [f2, C, W] f32, ``lab`` [f2, W] int32."""
    mx = jnp.max(up, axis=1)
    lse = mx + jnp.log(jnp.sum(jnp.exp(up - mx[:, None]), axis=1))
    cls = jax.lax.broadcasted_iota(jnp.int32, up.shape, 1)
    onehot = (cls == lab[:, None]).astype(jnp.float32)
    pick = jnp.sum(up * onehot, axis=1)
    valid = (lab != ignore_index).astype(jnp.float32)
    nll = (lse - pick) * valid
    return jnp.sum(nll), jnp.sum(valid), lse, onehot, valid


def _fwd_kernel(mid_ref, lab_ref, loss_ref, wsum_ref, *,
                h, f, num_classes, ignore_index):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        loss_ref[0, 0] = 0.0
        wsum_ref[0, 0] = 0.0

    lab = lab_ref[0]                                  # [f, W]
    f2 = f // 2
    up_f, up_s, _, _, _ = _expand_rows(mid_ref, j, h, f)
    l1, w1, _, _, _ = _nll_parts(up_f, lab[:f2], num_classes, ignore_index)
    l2, w2, _, _, _ = _nll_parts(up_s, lab[f2:], num_classes, ignore_index)
    # grid steps run sequentially on TPU: scalar accumulation is safe
    loss_ref[0, 0] += l1 + l2
    wsum_ref[0, 0] += w1 + w2


def _bwd_kernel(mid_ref, lab_ref, scale_ref, gmid_ref, *,
                h, f, num_classes, ignore_index):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _zero():
        gmid_ref[0] = jnp.zeros_like(gmid_ref[0])

    lab = lab_ref[0]
    f2 = f // 2
    scale = scale_ref[0, 0]                           # g / max(sum valid, 1)
    up_f, up_s, s0, top, bot = _expand_rows(mid_ref, j, h, f)
    wf, ws = _row_weights(f)

    def diff(up, lab_half):
        _, _, lse, onehot, valid = _nll_parts(up, lab_half, num_classes,
                                              ignore_index)
        p = jnp.exp(up - lse[:, None])
        return (p - onehot) * (valid[:, None] * scale)

    d_f = diff(up_f, lab[:f2])                        # [f2, C, W]
    d_s = diff(up_s, lab[f2:])
    # adjoint of the 2-tap row interp: weighted sums over the block's rows
    fh_lo_c = jnp.sum((1.0 - wf) * d_f, axis=0)
    fh_hi_c = jnp.sum(wf * d_f, axis=0)
    sh_lo_c = jnp.sum((1.0 - ws) * d_s, axis=0)
    sh_hi_c = jnp.sum(ws * d_s, axis=0)
    zero = jnp.zeros_like(fh_lo_c)
    # route each tap back to the mid row it read (mirrors _expand_rows)
    a0 = jnp.where(top, fh_lo_c + fh_hi_c + sh_lo_c,
                   jnp.where(bot, zero, fh_lo_c))
    a1 = jnp.where(top, sh_hi_c,
                   jnp.where(bot, fh_lo_c, fh_hi_c + sh_lo_c))
    a2 = jnp.where(top, zero,
                   jnp.where(bot, fh_hi_c + sh_lo_c + sh_hi_c, sh_hi_c))
    upd = jnp.stack([a0, a1, a2], axis=0)             # [3, C, W]
    gmid_ref[0, pl.ds(s0, 3), :, :] += upd


def _mid(logits: jnp.ndarray, out_w: int) -> jnp.ndarray:
    """Width-interp in XLA: [N,h,w,C] -> [N,h,C,W] f32."""
    n, h, w, c = logits.shape
    A_W = jnp.asarray(_interp_matrix(w, out_w))
    return jnp.einsum("nhwc,wX->nhcX", logits.astype(jnp.float32), A_W,
                      preferred_element_type=jnp.float32)


def _sums(logits, label, out_hw, ignore_index, interpret):
    n, h, w, c = logits.shape
    H, W = out_hw
    f = H // h
    mid = _mid(logits, W)
    kern = functools.partial(_fwd_kernel, h=h, f=f, num_classes=c,
                             ignore_index=ignore_index)
    loss_p, wsum_p = pl.pallas_call(
        kern,
        grid=(n, h),
        in_specs=[
            pl.BlockSpec((1, h, c, W), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, W), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(mid, label.astype(jnp.int32))
    return loss_p[0, 0], wsum_p[0, 0], mid


def supports_fused_resize_ce(src_hw, out_hw, align_corners: bool) -> bool:
    """Static gate: integer even row factor >= 2, >=3 source rows, and the
    half-pixel (align_corners=False) grid."""
    h, _ = src_hw
    H, _ = out_hw
    return (not align_corners) and h >= 3 and H % h == 0 \
        and (H // h) % 2 == 0 and H // h >= 2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_resize_ce(logits: jnp.ndarray, label: jnp.ndarray,
                    out_hw: Tuple[int, int], ignore_index: int = 255,
                    interpret: bool = False) -> jnp.ndarray:
    """mean-over-valid CE of bilinear-upsampled logits.

    Bit-compatible (f32) with
    ``softmax_cross_entropy(resize_bilinear(logits, out_hw), label)``
    for plain CE (no class/pixel weights, reduction='mean',
    avg_non_ignore) — the flagship loss configuration.
    """
    ls, ws, _ = _sums(logits, label, out_hw, ignore_index, interpret)
    return ls / jnp.maximum(ws, 1.0)


def _frc_fwd(logits, label, out_hw, ignore_index, interpret):
    ls, wsum, mid = _sums(logits, label, out_hw, ignore_index, interpret)
    loss = ls / jnp.maximum(wsum, 1.0)
    # logits itself rides along only for its (tiny) shape/dtype
    return loss, (mid, label, wsum, logits)


def _frc_bwd(out_hw, ignore_index, interpret, res, g):
    mid, label, wsum, logits = res
    n, h, c, W_mid = mid.shape
    H, W = out_hw
    f = H // h
    scale = (g / jnp.maximum(wsum, 1.0)).reshape(1, 1).astype(jnp.float32)
    kern = functools.partial(_bwd_kernel, h=h, f=f, num_classes=c,
                             ignore_index=ignore_index)
    gmid = pl.pallas_call(
        kern,
        grid=(n, h),
        in_specs=[
            pl.BlockSpec((1, h, c, W), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, W), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, c, W), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, c, W), jnp.float32),
        interpret=interpret,
    )(mid, label.astype(jnp.int32), scale)
    w_src = logits.shape[2]
    A_W = jnp.asarray(_interp_matrix(w_src, W))
    glogits = jnp.einsum("nhcX,wX->nhwc", gmid, A_W,
                         preferred_element_type=jnp.float32)
    return glogits.astype(logits.dtype), \
        np.zeros(label.shape, jax.dtypes.float0)


fused_resize_ce.defvjp(_frc_fwd, _frc_bwd)
