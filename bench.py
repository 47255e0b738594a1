#!/usr/bin/env python
"""Benchmark: supernet train + slide-inference throughput on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Measures (BASELINE.json metric "512x512 images/sec/chip (train + slide
infer); subnets eval/hr"):
  - train_img_per_sec: flagship supernet (ar50to101v2 + PSP head) train step
    at 512x512 crops, sandwich-sampled archs (one compile, arch switching
    live, like real supernet training).
  - slide_img_per_sec: 1024x2048 slide inference (512x1024 crop, 341x683
    stride) at the R50 anchor.
  - subnets_per_hour: subnet-switch + eval cost at one 1024x2048 val image
    per subnet, zero recompiles.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    """Force execution by pulling one scalar to the host.

    On the axon relay backend ``block_until_ready`` returns immediately;
    a device->host copy of the last output is the only reliable sync, and
    device-stream ordering makes it cover every enqueued step."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def _time_steps(fn, n_warmup, n_iter):
    out = None
    for i in range(n_warmup):
        out = fn(i)
    _fetch(out)
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = fn(n_warmup + i)
    _fetch(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    from gaiaseg_tpu.archspace import build_model_sampler
    from gaiaseg_tpu.engine import create_train_state, make_train_step
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.utils import Config
    import __graft_entry__ as ge

    n_chips = jax.device_count()
    model = build_segmentor(ge._FLAGSHIP)
    max_arch = model_max_arch(ge._FLAGSHIP)

    sampler_cfg = Config.fromfile(
        "configs/_dynamic_/model_samplers/ar50to101v2.py")
    train_sampler = build_model_sampler(sampler_cfg["train_sampler"])
    archs = [encode_arch(max_arch, train_sampler.sample())
             for _ in range(8)]  # one full sandwich cycle

    schedule = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 1000)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9,
                              weight_decay=5e-4),
                         dict(grad_clip=dict(max_norm=20)), schedule)
    # production mix (engine/train.py): silent fast step (no loss/stat
    # outputs — each costs ~2x) with one full logging step per 10 here
    train_step = make_train_step(model, tx, update_stats=True,
                                 with_logs=True)
    train_step_fast = make_train_step(model, tx, update_stats=False,
                                      with_logs=False)

    # ---- train throughput at 512x512 ---------------------------------- #
    import sys

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    rng = jax.random.PRNGKey(0)
    train_ips = None
    batch = 8 * n_chips
    while batch >= n_chips:
        try:
            img = jax.random.normal(rng, (batch, 512, 512, 3),
                                    jnp.bfloat16)
            gt = jax.random.randint(rng, (batch, 512, 512), 0, 19)
            log(f"init train state (batch {batch})...")
            state = create_train_state(model, rng, img, archs[0], tx)

            def step(i, _state=[state]):
                fn = train_step if i % 10 == 0 else train_step_fast
                _state[0], logs = fn(_state[0], img, gt,
                                     archs[i % len(archs)], rng)
                return _state[0].step

            log("timing train steps...")
            dt = _time_steps(step, 2, 10)
            train_ips = batch / dt / n_chips
            log(f"train: {dt * 1e3:.1f} ms/step -> {train_ips:.2f} img/s")
            break
        except Exception as e:  # OOM -> halve the batch
            if "RESOURCE_EXHAUSTED" in str(e) or "memory" in str(e).lower():
                log(f"batch {batch} OOM; halving")
                batch //= 2
                continue
            raise
    del state

    # ---- slide inference at 1024x2048 (R50 anchor) --------------------- #
    r50 = encode_arch(max_arch, {
        "arch.backbone.stem.width": 64,
        "arch.backbone.body.width": [64, 128, 256, 512],
        "arch.backbone.body.depth": [3, 4, 6, 3]})
    img1 = jax.random.normal(rng, (1, 1024, 2048, 3), jnp.bfloat16)
    # init through forward_train so aux-head params exist (extraction needs
    # the full tree)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
        jnp.zeros((1, 64, 64), jnp.int32), r50, method="forward_train")

    @jax.jit
    def slide(v, im, arch):
        return model.apply(v, im, arch, (512, 1024), (341, 683),
                           method=model.slide_inference)

    def slide_step(i):
        return slide(variables, img1, archs[i % len(archs)])

    log("timing slide inference...")
    dt_slide = _time_steps(slide_step, 1, 4)
    slide_ips = 1.0 / dt_slide / n_chips

    # ---- subnet eval rate (arch switch + 1 val image, zero recompile) -- #
    @jax.jit
    def eval_pred(v, im, arch):
        return model.apply(v, im, arch, method=model.simple_test)

    def subnet_step(i):
        return eval_pred(variables, img1, archs[i % len(archs)])

    log("timing subnet eval...")
    dt_sub = _time_steps(subnet_step, 1, 8)
    subnets_per_hour = 3600.0 / dt_sub

    # ---- extracted (deployed) R50 subnet: true serving cost ------------ #
    from gaiaseg_tpu.engine.extract import extract_subnet
    r50_meta = {"arch.backbone.stem.width": 64,
                "arch.backbone.body.width": [64, 128, 256, 512],
                "arch.backbone.body.depth": [3, 4, 6, 3]}
    sub_cfg, sub_vars, _ = extract_subnet(ge._FLAGSHIP, variables, r50_meta)
    sub_model = build_segmentor(sub_cfg)
    sub_arch = encode_arch(model_max_arch(sub_cfg))

    @jax.jit
    def slide_sub(v, im):
        return sub_model.apply(v, im, sub_arch, (512, 1024), (341, 683),
                               method=sub_model.slide_inference)

    log("timing extracted-R50 slide inference...")
    dt_ext = _time_steps(lambda i: slide_sub(sub_vars, img1), 1, 4)
    ext_slide_ips = 1.0 / dt_ext / n_chips

    result = {
        "metric": "supernet_train_512x512_images_per_sec_per_chip",
        "value": round(float(train_ips), 3),
        "unit": "img/s/chip",
        "vs_baseline": None,
        "extras": {
            "train_batch": batch,
            "slide_1024x2048_img_per_sec_per_chip": round(float(slide_ips), 4),
            "extracted_r50_slide_img_per_sec_per_chip":
                round(float(ext_slide_ips), 4),
            "subnets_per_hour_1img_eval": round(float(subnets_per_hour), 1),
            "n_chips": n_chips,
            "device": str(jax.devices()[0].device_kind),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
