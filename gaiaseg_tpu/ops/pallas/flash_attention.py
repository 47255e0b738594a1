"""Pallas TPU flash attention (non-causal, fixed head_dim) for the elastic
ViT backbones.

Why: full-resolution elastic-transformer attention in the reference is a
dense ``[B, heads, N, N]`` matmul (reference elastic_transformer.py:161);
at 512x1024 crops with patch 16 that is N=2048 and the scores tensor alone
is 100+ MB — an HBM round-trip per layer. This kernel tiles K/V with the
online-softmax recurrence so scores never leave VMEM (SURVEY.md §5
"long-context": blockwise attention is the scaling path).

Design: one-level KV tiling (block_k = 128 lanes), deferred normalization
(accumulate unnormalized P@V, divide by the running sum once at the end),
f32 statistics, tail masking for sequence lengths that are not
tile-multiples. Backward runs the Pallas dQ / dK-dV kernels in
flash_attention_bwd.py using saved per-row softmax residuals.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 512x512 measured fastest on v5e at N=4096/d=64 (3.9ms vs 4.2ms dense XLA,
# 5.1ms @256, 7.8ms @128) and the VMEM win over dense grows with N
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
               m_scr, l_scr, acc_scr, *,
               kv_tiles: int, block_k: int, n_real: int):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0, 0]                      # [block_q, d]
    k = k_ref[0, 0]                      # [block_k, d]
    v = v_ref[0, 0]                      # [block_k, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [block_q, block_k]

    # mask padded key columns (sequence tail)
    col = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < n_real, s, NEG_INF)

    m_prev = m_scr[:]                                 # [block_q, 128]
    l_prev = l_scr[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)        # [block_q, 1]
    m_next = jnp.maximum(m_prev, m_curr)              # [block_q, 128]
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])                    # [block_q, block_k]
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_next
    l_scr[:] = l_next

    acc_scr[:] = acc_scr[:] * alpha[:, :1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_tiles - 1)
    def _store():
        l_final = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l_final).astype(o_ref.dtype)
        # residuals for the Pallas backward kernels (lane-padded to 128,
        # Mosaic block-shape requirement)
        m_ref[0, 0] = m_scr[:]
        l_ref[0, 0] = l_scr[:]


def _flash_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               block_q: int, block_k: int, save_residuals: bool = False):
    """q,k,v: [B, H, N, D] (q pre-scaled). Returns out [B, H, N, D]
    (+ padded residuals (q,k,v,out,m,l) when ``save_residuals``)."""
    b, h, n, d = q.shape
    n_pad = -(-n // max(block_q, block_k)) * max(block_q, block_k)
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    q_tiles = n_pad // block_q
    kv_tiles = n_pad // block_k

    grid = (b, h, q_tiles, kv_tiles)
    out, m, l = pl.pallas_call(
        functools.partial(_fa_kernel, kv_tiles=kv_tiles, block_k=block_k,
                          n_real=n),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n_pad, 128), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_q, 128),
                             lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_q, 128),
                             lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # running max
                pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
                pltpu.VMEM((block_q, d), jnp.float32),    # output accum
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v)
    if save_residuals:
        return out[:, :, :n, :], (q, k, v, out, m, l)
    return out[:, :, :n, :]


def _dense_attention(q, k, v):
    """Reference dense path (q pre-scaled); used for the exact VJP."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, block_q, block_k):
    return _flash_fwd(q, k, v, block_q, block_k)


def _flash_vjp_fwd(q, k, v, block_q, block_k):
    n = q.shape[2]
    out, res = _flash_fwd(q, k, v, block_q, block_k, save_residuals=True)
    return out, (res, n)


def _flash_vjp_bwd(block_q, block_k, residuals, g):
    from .flash_attention_bwd import flash_attention_bwd
    (qp, kp, vp, op, m, l), n = residuals
    n_pad = qp.shape[2]
    if n_pad != n:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    dq, dk, dv = flash_attention_bwd(qp, kp, vp, op, m, l, g,
                                     block_q, block_k, n)
    return dq[:, :, :n], dk[:, :, :n], dv[:, :, :n]


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K) -> jnp.ndarray:
    """Multi-head attention, [B, N, H, D] layout (q pre-scaled by 1/sqrt(d)).

    Tiles K/V through VMEM with online softmax; numerically identical to
    dense softmax attention (tested against the XLA path).
    """
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash(qt, kt, vt, block_q, block_k)
    return out.transpose(0, 2, 1, 3)
