#!/usr/bin/env python
"""Raw XLA conv MFU per flagship stage shape, on the chip.

Times a jitted stack of bottleneck-shaped convs (1x1 expand-in, 3x3,
1x1 expand-out; bf16 NHWC, no BN/masking) at each stage's spatial/width
shape of the MAX supernet and of the R50 anchor, forward and
forward+backward. Achieved TF/s (2*MAC) against the v5e's ~183 TF/s
bf16 peak tells us the per-stage hardware ceiling the full train step
(bench.py train_mfu_executed) should be compared to: if raw convs only
reach X%, the model step can't beat X%.
"""
import os.path as osp
import sys
import time
from functools import partial

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def timeit(fn, n=32):
    fetch(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / n


def conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def block_stack(params, x):
    # n_blocks x (1x1 down, 3x3, 1x1 up) + residual add + relu, like a
    # ResNet bottleneck but without BN/masking.
    for (k1, k2, k3) in params:
        y = jax.nn.relu(conv(x, k1))
        y = jax.nn.relu(conv(y, k2))
        y = conv(y, k3)
        x = jax.nn.relu(x + y)
    return x


def stage_params(rng, c_out, c_mid, n_blocks):
    ks = []
    for i in range(n_blocks):
        k = jax.random.fold_in(rng, i)
        ks.append((
            jax.random.normal(k, (1, 1, c_out, c_mid), jnp.bfloat16) * .02,
            jax.random.normal(k, (3, 3, c_mid, c_mid), jnp.bfloat16) * .02,
            jax.random.normal(k, (1, 1, c_mid, c_out), jnp.bfloat16) * .02,
        ))
    return ks


def stage_macs(batch, hw, c_out, c_mid, n_blocks):
    per = hw * hw * (c_out * c_mid * 2 + 9 * c_mid * c_mid)
    return batch * per * n_blocks


def main():
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    peak = 183e12
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = jax.random.PRNGKey(0)

    # (name, spatial, c_out, c_mid, n_blocks): MAX supernet + R50 anchor
    cases = [
        ("max_s1", 128, 320, 80, 4),
        ("max_s2", 64, 640, 160, 6),
        ("max_s3", 32, 1280, 320, 12),
        ("max_s4", 16, 2560, 640, 4),
        ("r50_s1", 128, 256, 64, 3),
        ("r50_s2", 64, 512, 128, 4),
        ("r50_s3", 32, 1024, 256, 6),
        ("r50_s4", 16, 2048, 512, 3),
    ]

    @partial(jax.jit, static_argnames=())
    def fwd(params, x):
        return block_stack(params, x)

    def loss_fn(params, x):
        return jnp.sum(block_stack(params, x).astype(jnp.float32))

    grad_fn = jax.jit(jax.grad(loss_fn))

    for name, hw, c_out, c_mid, nb in cases:
        # marginal cost between two stack depths cancels the fixed
        # dispatch/fetch overhead of the relay (~0.65ms/dispatch + ~30ms
        # one fetch) that dominates absolute small-program timings
        nb2 = nb * 3
        p1 = stage_params(rng, c_out, c_mid, nb)
        p2 = stage_params(rng, c_out, c_mid, nb2)
        x = jax.random.normal(rng, (batch, hw, hw, c_out), jnp.bfloat16)
        macs = stage_macs(batch, hw, c_out, c_mid, nb2 - nb)
        tf = timeit(lambda: fwd(p2, x)) - timeit(lambda: fwd(p1, x))
        tb = timeit(lambda: grad_fn(p2, x)) - timeit(lambda: grad_fn(p1, x))
        mfu_f = 2 * macs / tf / peak
        mfu_b = 3 * 2 * macs / tb / peak
        print(f"{name}: b{batch} {hw}x{hw} c{c_out}/{c_mid} marginal x{nb2-nb}"
              f"  fwd {tf*1e3:7.2f}ms {mfu_f*100:5.1f}% MFU | "
              f"fwd+bwd {tb*1e3:7.2f}ms {mfu_b*100:5.1f}% MFU")


if __name__ == "__main__":
    main()
