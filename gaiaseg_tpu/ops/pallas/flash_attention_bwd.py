"""Pallas backward kernels for flash attention (dQ and dK/dV).

Standard flash backward decomposition: the forward saves per-row softmax
statistics (running max ``m`` and normalizer ``l``); backward recomputes
P = exp(QK - m)/l tile-by-tile (never materializing the full scores matrix)
and accumulates

    dV_j  = sum_i P_ij^T dO_i
    dS_ij = P_ij * (dO_i V_j^T - di_i),   di = sum(dO * O)
    dK_j  = sum_i dS_ij^T Q_i
    dQ_i  = sum_j dS_ij K_j

as two kernels with transposed iteration orders (dKV: outer KV tiles /
inner Q; dQ: outer Q tiles / inner KV), mirroring the JAX reference
structure. Q arrives pre-scaled (same convention as the forward kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *,
                q_tiles: int, block_q: int, n_real: int):
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[:] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[:] = jnp.zeros(dv_scr.shape, jnp.float32)

    q = q_ref[0, 0]                       # [block_q, d]
    k = k_ref[0, 0]                       # [block_k, d]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)  # [block_q, d]
    m = m_ref[0, 0][:, :1]                 # [block_q, 1]
    l = l_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = pl.program_id(2) * s.shape[1] + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < n_real, s, NEG_INF)
    l_safe = jnp.maximum(l, 1e-30)
    p = jnp.exp(s - m) / l_safe

    dv_scr[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [block_k, d]
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - di)
    dk_scr[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [block_k, d]

    @pl.when(q_idx == q_tiles - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref,
               dq_ref, dq_scr, *, kv_tiles: int, block_q: int,
               block_k: int, n_real: int):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[:] = jnp.zeros(dq_scr.shape, jnp.float32)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0][:, :1]
    l = l_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < n_real, s, NEG_INF)
    l_safe = jnp.maximum(l, 1e-30)
    p = jnp.exp(s - m) / l_safe
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - di)
    dq_scr[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_tiles - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def flash_attention_bwd(q, k, v, o, m, l, do, block_q: int, block_k: int,
                        n_real: int):
    """q,k,v,o,do: [B,H,Npad,D]; m,l: [B,H,Npad]. Returns (dq, dk, dv)."""
    b, h, n_pad, d = q.shape
    q_tiles = n_pad // block_q
    kv_tiles = n_pad // block_k
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], di.shape + (128,))

    row_spec_q = pl.BlockSpec((1, 1, block_q, 128),
                              lambda bi, hi, ki, qi: (bi, hi, qi, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, q_tiles=q_tiles, block_q=block_q,
                          n_real=n_real),
        out_shape=(jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, h, kv_tiles, q_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, ki, qi: (bi, hi, qi, 0)),  # q
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, ki, qi: (bi, hi, ki, 0)),  # k
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, ki, qi: (bi, hi, ki, 0)),  # v
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, ki, qi: (bi, hi, qi, 0)),  # do
                row_spec_q,                                            # m
                row_spec_q,                                            # l
                row_spec_q,                                            # di
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v, do, m, l, di)

    row_spec_q2 = pl.BlockSpec((1, 1, block_q, 128),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, kv_tiles=kv_tiles, block_q=block_q,
                          block_k=block_k, n_real=n_real),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, h, q_tiles, kv_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
                row_spec_q2,
                row_spec_q2,
                row_spec_q2,
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v, do, m, l, di)
    return dq, dk, dv
