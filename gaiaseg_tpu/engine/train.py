"""Supernet training driver: the TPU equivalent of reference apis/train.py.

Capability parity (SURVEY.md §2.1, §3.1): dataloaders, LR scaling by global
batch, optimizer + poly schedule, ManipulateArch per-iter subnet sampling
(the sandwich rule), checkpoint/log hooks, per-val cross-arch eval hook,
resume/load.

TPU redesign of the hot loop: ONE jitted ``train_step`` takes the sampled
subnet as a traced mask pytree — the reference's per-iter Python attribute
writes (a recompile trigger under XLA, SURVEY.md §3.1 CONTROL-PLANE note)
become a device-array swap. Data parallelism is the mesh ``data`` axis:
batch sharded, state replicated, gradient/BN all-reduce inserted by XLA over
ICI. Augmentation is the fused on-device pipeline, so each iteration is
host-IO + exactly two device programs (augment, step).
"""
from __future__ import annotations

import functools
import inspect
import json
import logging
import os
import os.path as osp
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..archspace.samplers import BaseSampler, build_model_sampler
from ..data.datasets import build_dataset
from ..data.loader import BatchLoader, device_prefetch
from ..data.pipeline_cfg import parse_test_pipeline, parse_train_pipeline
from ..data.transforms import augment_batch
from ..models.arch_util import (ArchBounds, cycle_dispatch, encode_arch,
                                jit_init, make_depth_bucketer,
                                model_max_arch, scan_dispatch)
from ..parallel.mesh import (broadcast_object, make_mesh, replicate,
                             shard_batch)
from .checkpoint import (latest_checkpoint, load_checkpoint, save_checkpoint,
                         update_latest)
from .evaluate import cross_arch_evaluate
from .optim import (build_lr_schedule, build_optimizer, freeze_labels,
                    scale_lr, set_learning_rate)

logger = logging.getLogger("gaiaseg_tpu")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, rng, sample_img, arch, tx) -> TrainState:
    # init through forward_train so auxiliary-head params exist too.
    # jit_init: ONE compiled program instead of eager per-op dispatches
    # (~8 min -> one cached compile + one dispatch on the relay)
    dummy_gt = jnp.zeros(sample_img.shape[:3], jnp.int32)
    variables = jit_init(model, {"params": rng, "dropout": rng}, sample_img,
                         dummy_gt, arch, method=model.forward_train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


def make_train_step(model, tx, update_stats: bool = True,
                    with_logs: bool = True):
    """jitted (state, img, gt, arch, rng) -> (state, logs). Donated state.

    The HOT path uses ``update_stats=False, with_logs=False``: measured on
    v5e (batch 8, 512x512 max supernet), a grad+update-only step is 66 ms,
    while returning EITHER the loss value OR the BN running-stat updates
    from the jitted program is ~133 ms — each forces XLA to materialize the
    forward CE / pre-norm chains that the gradient alone never needs. The
    train loop therefore runs the silent fast step and interleaves one full
    step (loss logs + BN stat refresh) every ``log_interval`` iterations;
    BN running stats are eval-only bookkeeping and subnet eval recalibrates
    per arch anyway (engine/calibrate.py).
    """

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("bounds",))
    def train_step(state: TrainState, img, gt, arch, rng, bounds=None):
        # ``bounds``: STATIC ArchBounds — jit specializes one depth-
        # proportional program per bucket (anchors get exact bounds; the
        # bucketer caps the number of variants, see make_depth_bucketer)
        def loss_fn(params):
            # compute_acc=False: accuracy-as-output also costs ~2.2x
            (total, logs), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, gt, arch, False, bounds, method=model.forward_train,
                mutable=["batch_stats"] if update_stats else [],
                rngs={"dropout": rng})
            return total, (logs, mut)

        if with_logs:
            (loss, (logs, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            logs = dict(logs)
            logs["grad_norm"] = optax.global_norm(grads)
        else:
            grads = jax.grad(lambda p: loss_fn(p)[0])(state.params)
            logs = {}
            mut = {}
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_stats = mut.get("batch_stats", state.batch_stats) \
            if update_stats else state.batch_stats
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            batch_stats=new_stats)
        return new_state, logs

    return train_step


def make_multi_train_step(model, tx, k: int):
    """K train steps per device dispatch.

    On relay-attached TPUs each dispatch pays a fixed RPC + per-buffer cost
    (~75ms measured for this state pytree), and ALTERNATING executables
    per step costs another ~20ms/step (measured: a 6-program bucket mix
    averages 74.9ms/step while its per-program times average 48.1ms).
    Running K steps inside one program removes both. Batches/archs/rngs
    arrive stacked on a leading K axis — one dispatch per full sandwich
    cycle (K=8) runs every anchor + random subnet of the cycle.

    Three modes, selected by the STATIC ``scan_candidates``/``bounds_seq``:
    - ``scan_candidates`` (tuple of ArchBounds, the PRODUCTION default):
      ``lax.scan`` over ONE silent step body whose gradient is a
      ``lax.switch(bucket_ids[i], branches)`` with one branch per
      candidate — anchors select their exact bounds, randoms their
      cheapest cover, so per-step executed cost equals the unrolled
      path's, while the compiled program is K times smaller (the
      flagship unrolled cycle is 23 fwd+bwd graph copies / a 193MB
      executable / ~20min cold compile; the scan body is 10). The
      static key (the candidate tuple) is draw-order-INDEPENDENT:
      bench, warmup and every training cycle share one program.
      ``actives`` ([k] int32, REQUIRED in this mode) gates each
      position behind ``lax.cond``: position i with actives[i]==0
      leaves the state bit-untouched (no step/param/momentum change).
      The train loop pads a short run TAIL (max_iters - it < k) to a
      full cycle with inactive positions, so the tail rides this same
      program — without it, the tail fell into the single-step path
      and cold-compiled a fresh per-bucket fwd+bwd program (~8 min
      EACH on the relay; the round-3/4 "e2e hang" class).
    - ``bounds_seq`` tuple of K entries: UNROLLED cycle, silent. An
      ``ArchBounds`` entry executes step i at those STATIC bounds; a
      ``BoundsSwitch`` entry emits ``lax.switch`` over its candidates
      (kept for A/B measurement — ``cycle_mode: unroll``).
    - neither: lax.scan of K full steps (loss logs + BN stat updates
      every step; one shared MAX-cost program).
    """

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("bounds_seq", "scan_candidates"))
    def multi_step(state: TrainState, imgs, gts, archs, rngs,
                   bucket_ids=None, bounds_seq=None, lrs=None,
                   scan_candidates=None, actives=None):
        # ``lrs``: [k] f32 — the exact per-position schedule values,
        # applied via the injected-lr optimizer state so the schedule
        # never bakes into the program (see optim.build_optimizer). The
        # production loop always passes it; None keeps the state's lr.
        if scan_candidates is not None:
            if actives is None:
                # actives must be DATA even in the common all-active case:
                # materializing ones here would constant-fold the cond and
                # fork a second (incompatible) compile key from the padded-
                # tail dispatch — exactly the program duplication this mode
                # exists to prevent.
                raise ValueError(
                    "scan mode requires the actives=[k] int32 mask "
                    "(all ones for a full cycle)")

            def sbody(st, xs):
                img, gt, arch, rng, bid, lr_i, act = xs

                def do_step(st):
                    # value_and_grad instead of grad: the primal (and its
                    # component-loss aux dict — a handful of f32 scalars)
                    # is computed by the backward pass anyway, and
                    # returning it lets the host log losses straight from
                    # the scan outputs instead of dispatching a separate
                    # full-step program every log window (that 56MB
                    # program alternating with this one cost the cached
                    # e2e loop ~25% of its throughput on the relay).
                    def vgrad_at(b):
                        def loss_fn(params):
                            (total, logs), _ = model.apply(
                                {"params": params,
                                 "batch_stats": st.batch_stats},
                                img, gt, arch, False, b,
                                method=model.forward_train, mutable=[],
                                rngs={"dropout": rng})
                            return total, dict(logs)

                        return jax.value_and_grad(loss_fn, has_aux=True)

                    if len(scan_candidates) == 1:
                        (_, logs), grads = vgrad_at(
                            scan_candidates[0])(st.params)
                    else:
                        (_, logs), grads = jax.lax.switch(
                            bid, [vgrad_at(c) for c in scan_candidates],
                            st.params)
                    opt_in = st.opt_state if lr_i is None else \
                        set_learning_rate(st.opt_state, lr_i)
                    updates, opt_state = tx.update(grads, opt_in,
                                                   st.params)
                    params = optax.apply_updates(st.params, updates)
                    return st.replace(step=st.step + 1, params=params,
                                      opt_state=opt_state), logs

                # inactive (tail-padded) positions skip the step and emit
                # a zeroed log dict; eval_shape is trace-time only
                log_sd = jax.eval_shape(lambda s: do_step(s)[1], st)
                zero_logs = jax.tree_util.tree_map(
                    lambda a: jnp.zeros(a.shape, a.dtype), log_sd)
                return jax.lax.cond(act > 0, do_step,
                                    lambda s: (s, zero_logs), st)

            state, logs_k = jax.lax.scan(
                sbody, state,
                (imgs, gts, archs, rngs, bucket_ids,
                 None if lrs is None else lrs, actives))
            return state, logs_k  # leaves stacked [k]; padded rows zero

        if bounds_seq is not None:
            st = state
            for i in range(k):
                img, gt, rng = imgs[i], gts[i], rngs[i]
                arch = jax.tree_util.tree_map(lambda x: x[i], archs)

                def grad_at(b, img=img, gt=gt, arch=arch, rng=rng, st=st):
                    def loss_fn(params):
                        (total, logs), _ = model.apply(
                            {"params": params,
                             "batch_stats": st.batch_stats},
                            img, gt, arch, False, b,
                            method=model.forward_train, mutable=[],
                            rngs={"dropout": rng})
                        return total

                    return jax.grad(loss_fn)

                b_i = bounds_seq[i]
                if isinstance(b_i, ArchBounds) or b_i is None:
                    grads = grad_at(b_i)(st.params)
                else:
                    # BoundsSwitch: runtime candidate selection — one
                    # gradient branch per candidate bound, lax.switch on
                    # the traced bucket id. Grad pytrees are full param
                    # shapes in every branch (inactive slices zero), so
                    # the optimizer update below stays shared.
                    grads = jax.lax.switch(
                        bucket_ids[i],
                        [grad_at(c) for c in b_i.candidates],
                        st.params)
                opt_in = st.opt_state if lrs is None else \
                    set_learning_rate(st.opt_state, lrs[i])
                updates, opt_state = tx.update(grads, opt_in, st.params)
                params = optax.apply_updates(st.params, updates)
                st = st.replace(step=st.step + 1, params=params,
                                opt_state=opt_state)
            return st, {}

        def body(st, xs):
            img, gt, arch, rng, lr_i = xs

            def loss_fn(params):
                (total, logs), mut = model.apply(
                    {"params": params, "batch_stats": st.batch_stats},
                    img, gt, arch, False, method=model.forward_train,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                return total, (logs, mut)

            (loss, (logs, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            opt_in = st.opt_state if lr_i is None else \
                set_learning_rate(st.opt_state, lr_i)
            updates, opt_state = tx.update(grads, opt_in, st.params)
            params = optax.apply_updates(st.params, updates)
            new_st = st.replace(
                step=st.step + 1, params=params, opt_state=opt_state,
                batch_stats=mut.get("batch_stats", st.batch_stats))
            return new_st, dict(logs)

        state, logs = jax.lax.scan(
            body, state,
            (imgs, gts, archs, rngs,
             None if lrs is None else lrs))
        return state, logs  # logs leaves stacked [k]

    return multi_step


def load_teacher_checkpoint(path: str, params: Dict[str, Any],
                            batch_stats: Optional[Dict[str, Any]] = None,
                            model_cfg: Optional[Dict[str, Any]] = None
                            ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load the distiller's frozen-teacher weights (reference
    dynamic_distiller.py:195-200 loads a FULL teacher segmentor ckpt:
    backbone + decode_head, incl. the pos-embedding surgery — here inside
    the BEiT converter). Returns (params, batch_stats).

    ``.pth``/``.pt``: a torch checkpoint. ``backbone.*`` keys convert into
    ``params['t_backbone']`` (tables resampled to our window); if
    ``decode_head.*`` keys exist they convert into ``t_decode_head`` —
    never silently dropped, since a fresh-random teacher head would corrupt
    ``distill_loss_seg`` with no error. Other paths: an our-format
    checkpoint whose params tree carries the ``t_backbone``/``t_decode_head``
    subtrees (e.g. saved from a distiller run)."""
    params = dict(params)
    batch_stats = dict(batch_stats or {})
    if path.endswith((".pth", ".pt")):
        import torch
        from .torch_convert import _convert_head, beit_state_dict_to_params
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict):
            sd = sd.get("state_dict", sd.get("model", sd))
        dh_sd = {k[len("decode_head."):]: v for k, v in sd.items()
                 if k.startswith("decode_head.")}
        bb_sd = {(k[len("backbone."):] if k.startswith("backbone.") else k):
                 v for k, v in sd.items()
                 if not k.startswith(("decode_head.", "auxiliary_head."))}
        params["t_backbone"] = beit_state_dict_to_params(
            bb_sd, params["t_backbone"])
        if dh_sd:
            if "t_decode_head" not in params:
                raise ValueError(
                    f"teacher checkpoint {path} carries decode_head.* keys "
                    "but the distiller has no teacher_decode_head configured")
            import copy
            head_cfg = dict((model_cfg or {}).get("teacher_decode_head")
                            or {})
            params["t_decode_head"] = copy.deepcopy(params["t_decode_head"])
            batch_stats["t_decode_head"] = copy.deepcopy(
                batch_stats.get("t_decode_head", {}))
            _convert_head(dh_sd, params["t_decode_head"],
                          batch_stats["t_decode_head"], head_cfg)
            logger.info("loaded torch teacher backbone + decode_head "
                        "from %s", path)
        elif "t_decode_head" in params:
            raise ValueError(
                f"teacher checkpoint {path} has no decode_head.* keys but "
                "the distiller computes distill_loss_seg from "
                "t_decode_head — supply a full teacher segmentor ckpt or "
                "an our-format checkpoint with the t_decode_head subtree")
        else:
            logger.info("loaded torch BEiT teacher from %s", path)
        return params, batch_stats
    from .checkpoint import load_checkpoint
    keys = [k for k in ("t_backbone", "t_decode_head", "t_neck")
            if k in params]
    tmpl = {"params": {k: params[k] for k in keys}}
    # BN running stats ride along with the params: the teacher runs with
    # use_running_average=True, so leaving its stats at fresh init (0/1)
    # would silently corrupt the distillation signal — the same failure
    # the .pth branch guards against via _convert_head.
    bs_keys = [k for k in keys if batch_stats.get(k)]
    if bs_keys:
        tmpl["batch_stats"] = {k: batch_stats[k] for k in bs_keys}
    loaded, _ = load_checkpoint(path, tmpl)
    for k in keys:
        params[k] = loaded["params"][k]
    for k in bs_keys:
        batch_stats[k] = loaded["batch_stats"][k]
    logger.info("loaded teacher subtrees %s (+stats %s) from %s",
                keys, bs_keys, path)
    return params, batch_stats


def _max_iters(cfg) -> int:
    runner = cfg.get("runner") or {}
    if runner.get("max_iters"):
        return int(runner["max_iters"])
    if cfg.get("total_iters"):
        return int(cfg["total_iters"])
    # epoch-based schedules (reference schedule_all_42e.py): epochs * steps
    return int(runner.get("max_epochs", 1)) * 1000


def resolve_epoch_schedule(cfg, n_samples: int, global_batch: int):
    """mmcv EpochBasedRunner semantics -> this loop's iter domain.

    The reference fast-finetune schedules are written in epochs
    (reference schedule_ft1x.py: step=[9,12] epochs, warmup_by_epoch,
    total_epochs=13; schedule_all_42e.py: step=[32,38,41],
    total_epochs=42). Returns (max_iters, lr_config) with epoch counts
    scaled by iters-per-epoch, or (None, lr_config) when the config is
    already iter-based (runner.max_iters / total_iters present or no
    epoch count given).
    """
    runner = cfg.get("runner") or {}
    epochs = cfg.get("total_epochs") or runner.get("max_epochs")
    lrc = dict(cfg.get("lr_config") or {})
    if not epochs or runner.get("max_iters") or cfg.get("total_iters"):
        return None, lrc
    ipe = max(int(n_samples) // max(int(global_batch), 1), 1)
    if lrc.get("by_epoch", True) and \
            str(lrc.get("policy", "")).lower() == "step":
        lrc["step"] = [int(s) * ipe for s in lrc.get("step", [])]
        lrc["by_epoch"] = False
    if lrc.pop("warmup_by_epoch", False):
        lrc["warmup_iters"] = int(lrc.get("warmup_iters", 1)) * ipe
    return int(epochs) * ipe, lrc


def _sync_window_clock(sync_fn, _time=time.time):
    """Device-sync FIRST, then read the wall clock.

    The log-window throughput is sync-to-sync wall time: ``sync_fn`` must
    block until every step enqueued in the window has executed (on the
    axon relay that means a device->host fetch — ``block_until_ready`` is
    a no-op there) BEFORE the timestamp is taken. Reading the clock before
    the fetch measures host *dispatch* rate: the r4 driver bench logged a
    physically impossible 774 img/s against a 204 img/s ceiling that way.
    Returns (sync_fn(), timestamp). tests/test_train_e2e.py pins the
    call order.
    """
    out = sync_fn()
    return out, _time()


def train_segmentor(model, cfg, *, work_dir: str,
                    train_dataset=None, val_dataset=None,
                    train_sampler: Optional[BaseSampler] = None,
                    val_sampler: Optional[BaseSampler] = None,
                    max_iters: Optional[int] = None,
                    steps_per_dispatch: int = 1,
                    seed: int = 0,
                    state: Optional[TrainState] = None,
                    resume_from: Optional[str] = None,
                    load_from: Optional[str] = None,
                    progress_cb=None,
                    window_cb=None) -> Tuple[TrainState, Dict[str, Any]]:
    """Run supernet training per config. Returns (final_state, history)."""
    os.makedirs(work_dir, exist_ok=True)
    # model_parallel=K (TPU extension): data x model mesh; params are
    # tensor-parallel sharded over the model axis (parallel/mesh.py
    # tp_spec) and GSPMD inserts the collectives. Default: pure DP.
    mesh = make_mesh(model_parallel=int(cfg.get("model_parallel", 1) or 1))
    data_cfg = cfg.get("data", {})
    if train_dataset is None:
        train_dataset = build_dataset(data_cfg["train"])
    if val_dataset is None and data_cfg.get("val"):
        try:
            val_dataset = build_dataset(data_cfg["val"])
            if len(val_dataset) == 0:
                val_dataset = None
        except FileNotFoundError:
            val_dataset = None

    # samplers (ManipulateArchHook equivalent, reference apis/train.py:142-146)
    if train_sampler is None and cfg.get("train_sampler"):
        train_sampler = build_model_sampler(cfg["train_sampler"])
    if val_sampler is None and cfg.get("val_sampler"):
        val_sampler = build_model_sampler(cfg["val_sampler"])

    pipe = parse_train_pipeline(
        (data_cfg.get("train") or {}).get("pipeline"))
    test_pipe = parse_test_pipeline(
        (data_cfg.get("val") or {}).get("pipeline"))

    samples_per_gpu = int(data_cfg.get("samples_per_gpu", 2))
    n_dev = mesh.devices.size
    global_batch = samples_per_gpu * n_dev
    epoch_iters, lr_config = resolve_epoch_schedule(
        cfg, len(train_dataset), global_batch)
    max_iters = max_iters or epoch_iters or _max_iters(cfg)

    # optimizer + schedule (LR scaling: reference apis/train.py:102-113)
    opt_cfg = dict(cfg.get("optimizer") or {"type": "SGD", "lr": 0.01})
    base_lr = scale_lr(opt_cfg.get("lr", 0.01), global_batch,
                       cfg.get("lr_scaler"))
    opt_cfg["lr"] = base_lr
    schedule = build_lr_schedule(lr_config, base_lr, max_iters)
    model_cfg = dict(cfg.get("model") or {})
    needs_freeze = (model_cfg.get("type") == "DynamicDistiller"
                    or int((model_cfg.get("backbone") or {})
                           .get("frozen_stages", -1)) >= 0)
    freeze_mask = (lambda params: freeze_labels(params, model_cfg)) \
        if needs_freeze else None
    tx = build_optimizer(opt_cfg, cfg.get("optimizer_config"), schedule,
                         freeze_mask=freeze_mask)

    # state init at crop size, MAX arch
    max_arch = model_max_arch(cfg["model"])
    crop_h, crop_w = pipe.crop_size
    rng = jax.random.PRNGKey(seed)
    init_img = jnp.zeros((samples_per_gpu, crop_h, crop_w, 3), jnp.bfloat16)
    if state is None:
        state = create_train_state(model, rng, init_img,
                                   encode_arch(max_arch), tx)
        start_step = 0
        if resume_from or (cfg.get("auto_resume")
                           and latest_checkpoint(work_dir)):
            path = resume_from or latest_checkpoint(work_dir)
            state, meta = load_checkpoint(path, state)
            start_step = int(state.step)
            logger.info("resumed from %s at step %d", path, start_step)
        elif load_from:
            tmpl = {"params": state.params, "batch_stats": state.batch_stats}
            if str(load_from).endswith((".pth", ".pt")):
                # reference-format full segmentor checkpoint (reference
                # tools/extract_subnet.py:91-94 load path)
                from .torch_convert import load_torch_segmentor
                loaded = load_torch_segmentor(load_from, tmpl, model_cfg)
            else:
                loaded, _ = load_checkpoint(load_from, tmpl)
            state = state.replace(params=loaded["params"],
                                  batch_stats=loaded["batch_stats"])
            logger.info("loaded weights from %s", load_from)
        pretrained = (model_cfg.get("backbone") or {}).get("pretrained") \
            or model_cfg.get("pretrained")
        if pretrained and str(pretrained).endswith((".pth", ".pt")) \
            and not (resume_from or load_from):
            # torch pretrained backbone (reference dynamic_resnet.py:343-345
            # strict=False load) via the torch->jax converter
            from .torch_convert import load_torch_resnet
            p, s = load_torch_resnet(str(pretrained), state.params,
                                     state.batch_stats)
            state = state.replace(params=p, batch_stats=s)
            logger.info("loaded torch pretrained backbone from %s",
                        pretrained)
        teacher_ckpt = cfg.get("teacher_checkpoint") \
            or model_cfg.get("teacher_ckpt")
        if teacher_ckpt and "t_backbone" in state.params \
                and not resume_from:
            if osp.exists(str(teacher_ckpt)):
                t_params, t_stats = load_teacher_checkpoint(
                    str(teacher_ckpt), state.params, state.batch_stats,
                    model_cfg)
                state = state.replace(params=t_params, batch_stats=t_stats)
            else:
                logger.warning("teacher_checkpoint %s not found; teacher "
                               "keeps fresh init", teacher_ckpt)
    start_step = int(state.step)
    if mesh.shape["model"] > 1:
        from ..parallel.mesh import shard_state
        state = shard_state(state, mesh)
    else:
        state = replicate(state, mesh)

    k_disp = max(int(steps_per_dispatch), 1)
    if cfg.get("steps_per_dispatch"):
        k_disp = max(int(cfg["steps_per_dispatch"]), k_disp)
    if k_disp > 1:
        multi_step = make_multi_train_step(model, tx, k_disp)
    log_interval = int((cfg.get("log_config") or {}).get("interval", 50))
    # cadence of the BN-refresh full step (a separate full-variant program
    # the scan cycle otherwise never needs). Defaults to the log interval;
    # raising it keeps the hot loop inside ONE compiled program, but then
    # the running stats are near-initial between refreshes — so eval and
    # checkpoint auto-calibrate below unless calibrate_bn is explicitly 0.
    bn_interval = int(cfg.get("bn_refresh_interval") or log_interval)
    ckpt_cfg = dict(cfg.get("checkpoint_config") or {})
    eval_cfg = dict(cfg.get("evaluation") or {})
    # Silent fast steps skip BN running-stat updates (the 2x-cost
    # finding, make_train_step), so running stats EMA-converge
    # log_interval-times slower than the reference's every-iter updates:
    # measured on-chip, a 772-iter run still carried ~0.9^12 = 28% of its
    # fresh-init stats and mid-run cross-arch mIoU sat at chance until
    # the stats finally converged. Whenever the loop takes silent steps,
    # eval and checkpoint therefore re-estimate the stats (calibrate_bn,
    # default 8 batches at the MAX anchor) — the TPU-loop equivalent of
    # the reference's per-iter stat updates. Explicit
    # {checkpoint_config,evaluation}.calibrate_bn overrides (0 disables).
    silent_steps = k_disp > 1 or log_interval > 1
    _ck, _ev = ckpt_cfg.get("calibrate_bn"), eval_cfg.get("calibrate_bn")
    ckpt_calib_n = int(_ck) if _ck is not None else (8 if silent_steps
                                                     else 0)
    eval_calib_n = int(_ev) if _ev is not None else (8 if silent_steps
                                                     else 0)
    if bn_interval > log_interval and (_ck is None or _ev is None):
        logger.warning(
            "bn_refresh_interval=%d > log_interval=%d: BN running stats "
            "stay near-initial between refreshes; checkpoints and "
            "cross-arch eval auto-calibrate (%d batches at the MAX "
            "anchor). Set checkpoint_config.calibrate_bn / "
            "evaluation.calibrate_bn explicitly (0 disables).",
            bn_interval, log_interval, ckpt_calib_n or eval_calib_n)
    train_step = make_train_step(model, tx, update_stats=True,
                                 with_logs=True)
    train_step_fast = make_train_step(model, tx, update_stats=False,
                                      with_logs=False) \
        if log_interval > 1 else train_step

    # Device-cached datasets skip pixel materialization in the loader: the
    # prep thread fuses row-gather + augment into ONE program per step
    # (transforms.gather_augment_batch — ~2.7ms vs ~8.4ms for the split
    # gather/augment dispatches on the relay, measured 8x512x512).
    from ..data.device_cache import DeviceCachedDataset
    _dev_cache = train_dataset \
        if isinstance(train_dataset, DeviceCachedDataset) else None
    loader = BatchLoader(train_dataset, global_batch, shuffle=True,
                         seed=seed, drop_last=True, infinite=True,
                         shard_id=jax.process_index(),
                         num_shards=jax.process_count(),
                         index_only=_dev_cache is not None)
    mean = jnp.asarray(pipe.mean)
    std = jnp.asarray(pipe.std)
    num_classes = model.num_classes

    # base scale for Resize(img_scale, keep_ratio): factor that maps the
    # dataset's native size onto img_scale (identity for cityscapes)
    base_scale = 1.0
    if pipe.img_scale is not None and len(train_dataset) > 0:
        rec = train_dataset[0]
        h, w = rec["img"].shape[:2]
        tw, th = pipe.img_scale  # mmcv (w, h)
        base_scale = min(max(th, tw) / max(h, w), min(th, tw) / min(h, w))

    ckpt_interval = int(ckpt_cfg.get("interval", 8000))
    eval_interval = int(eval_cfg.get("interval", 8000))

    # two-phase workflow [('train',N),('val',M)] (reference apis/train.py:186
    # + tools/train_supernet.py:192-196): every N train iters, M val-loss
    # iterations run on the val set — same losses, frozen stats, no update
    workflow = list(cfg.get("workflow") or [("train", 1)])
    wf_train = next((int(n) for m, n in workflow if m == "train"), 1)
    wf_val = next((int(n) for m, n in workflow if m == "val"), 0)
    val_loss_step = val_iter = None
    if wf_val and val_dataset is not None:
        mean_v = jnp.asarray(test_pipe.mean)
        std_v = jnp.asarray(test_pipe.std)

        # eval-mode losses (BN running stats, no dropout) — matches mmcv's
        # model.eval() during the val workflow phase, so the recorded
        # val_loss history is comparable to the reference's. Distillers
        # keep train-mode internals (their forward_train has no eval path).
        _val_kw = {"train": False} \
            if "train" in inspect.signature(model.forward_train).parameters \
            else {}

        @jax.jit
        def val_loss_step(state, img, gt, arch, rng):
            (total, logs), _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                img, gt, arch, False, method=model.forward_train,
                mutable=[], rngs={"dropout": rng}, **_val_kw)
            return logs

        val_iter = iter(BatchLoader(val_dataset, samples_per_gpu * n_dev,
                                    shuffle=False, drop_last=False,
                                    infinite=True,
                                    shard_id=jax.process_index(),
                                    num_shards=jax.process_count()))

        # independent sampler: val-phase draws must NOT consume train
        # sampler draws, or the 8-long sandwich cycle rotates relative to
        # the K-dispatch window and every rotation becomes a fresh
        # bounds_seq compile of the unrolled cycle program
        val_phase_sampler = build_model_sampler(cfg["train_sampler"]) \
            if cfg.get("train_sampler") else None

        def run_val_phase(state, it):
            from ..data.transforms import prepare_eval_batch
            nonlocal rng
            v_losses = []
            for _ in range(wf_val):
                vb = next(val_iter)
                vimg = prepare_eval_batch(jnp.asarray(vb["img"]),
                                          mean_v, std_v)
                vgt = jnp.asarray(vb["gt"])
                varch = encode_arch(
                    max_arch, broadcast_object(val_phase_sampler.sample())
                ) if val_phase_sampler is not None else encode_arch(max_arch)
                rng, k_v = jax.random.split(rng)
                vlogs = val_loss_step(state, vimg, vgt, varch, k_v)
                v_losses.append(float(vlogs["decode.loss_seg"]))
            history["val_loss"].append(
                {"iter": it, "loss": sum(v_losses) / len(v_losses)})

    history: Dict[str, Any] = {"loss": [], "eval": [], "val_loss": []}
    # depth-proportional fast path: bucket sampled archs into a bounded set
    # of STATIC depth bounds (exact for sandwich anchors). Off when
    # scan_blocks (stacked-param layout pins the trip count) or when the
    # config disables it.
    bucketer = None
    if cfg.get("use_arch_bounds", True) and train_sampler is not None \
            and not (model_cfg.get("backbone") or {}).get("scan_blocks"):
        try:
            bucketer = make_depth_bucketer(
                train_sampler, max_arch,
                rand_k=int(cfg.get("arch_bounds_rand_k", 6)))
        except Exception:
            bucketer = None
    # "scan" (default): cycle program is a lax.scan over one switch-
    # dispatched body — same executed cost as the unrolled cycle, ~2.3x
    # smaller executable / cold compile, and a draw-order-independent
    # compile key. "unroll" keeps the per-position static-bounds program.
    cycle_mode = str(cfg.get("cycle_mode", "scan"))
    data_iter = iter(loader)
    t_last = time.time()
    loss_acc, n_acc, last_loss = 0.0, 0, float("nan")
    # device-side (logs, n_active) per cycle awaiting the log boundary:
    # EVERY cycle of the window is kept (k scalars each) so the window
    # loss is the mean over all its steps, not just the last cycle's
    pend_cycles = []

    # Device-side batch prefetch: upload + augment dispatch + shard run in
    # a background thread so host->device transfer (the relay link moves
    # ~140MB/s; a [8,512,512] cycle's uploads cost ~0.5s serial) overlaps
    # the train step instead of serializing before it. Labels travel as
    # uint8 (trainIds < num_classes plus ignore=255 fit; 4x fewer bytes,
    # measured 84ms -> 44ms per batch upload). The queue holds augmented
    # device batches, bounding resident HBM to ~20MB each. Replaces the
    # reference's DataLoader worker/compute overlap (SURVEY.md §3.1) —
    # same property, one thread, no subprocess. The prep thread owns the
    # rng_data stream (single consumer of data_iter => deterministic key
    # sequence).
    rng, rng_data = jax.random.split(rng)
    _rng_box = [rng_data]

    _aug_kw = dict(crop_size=pipe.crop_size,
                   ratio_range=(pipe.ratio_range[0] * base_scale,
                                pipe.ratio_range[1] * base_scale),
                   cat_max_ratio=pipe.cat_max_ratio,
                   num_classes=num_classes,
                   photometric=pipe.photometric,
                   flip_prob=pipe.flip_prob)

    def _prep_batch(batch):
        _rng_box[0], k_aug = jax.random.split(_rng_box[0])
        gt = batch["gt"]
        if gt.dtype != np.uint8 and num_classes <= 255:
            gt = gt.astype(np.uint8)
        aug = augment_batch(k_aug, jnp.asarray(batch["img"]),
                            jnp.asarray(gt), mean, std, **_aug_kw)
        return shard_batch(aug, mesh)

    if _dev_cache is not None:
        # device-resident feed: the prep thread's per-step work is ONE
        # program dispatch with zero host->device bytes — indices upload
        # as a [W,B] buffer once per W steps, the PRNG key and buffer
        # position chain through the program on device (the relay charges
        # ~2.5ms latency per upload and ~1ms per host-side key split —
        # at a ~40ms step that tax was ~9%). The in-program split chain
        # reproduces the host `split(box)` sequence exactly, so the
        # augment stream is bit-identical to the streaming path's.
        from ..data.transforms import gather_augment_step

        def _cached_items(chunk_w: int = 32):
            import itertools
            src = data_iter
            while True:
                chunk = list(itertools.islice(src, chunk_w))
                if not chunk:
                    return
                buf = np.stack([b["idx"] for b in chunk])
                if len(chunk) < chunk_w:  # static shape: pad, yield len()
                    buf = np.concatenate(
                        [buf, np.repeat(buf[-1:], chunk_w - len(chunk), 0)])
                idx_buf = jnp.asarray(np.ascontiguousarray(buf, np.int32))
                pos = jnp.zeros((), jnp.int32)
                for _ in chunk:
                    _rng_box[0], pos, aug = gather_augment_step(
                        _rng_box[0], pos, idx_buf,
                        _dev_cache._imgs, _dev_cache._gts,
                        mean, std, **_aug_kw)
                    yield shard_batch(aug, mesh)

        from ..data.loader import _pump
        _pf_iter = _pump(_cached_items,
                         int(cfg.get("device_prefetch",
                                     max(2 * k_disp, 4))))
    else:
        _pf_iter = device_prefetch(
            data_iter, _prep_batch,
            depth=int(cfg.get("device_prefetch", max(2 * k_disp, 4))))

    def next_aug_batch():
        return next(_pf_iter)

    def next_arch(with_meta: bool = False):
        if train_sampler is not None:
            meta = broadcast_object(train_sampler.sample())
            bounds = bucketer(meta) if bucketer is not None else None
            arch = encode_arch(max_arch, meta)
            return (arch, bounds, meta) if with_meta else (arch, bounds)
        arch = encode_arch(max_arch)
        return (arch, None, {}) if with_meta else (arch, None)

    it = start_step
    logs: Dict[str, Any] = {}
    # scan availability is a property of the bucketer alone (its candidate
    # table), not of any cycle's draws — decide once. When available, the
    # run TAIL (max_iters - it < k) is padded to a full cycle with
    # INACTIVE positions and rides the same compiled program; without
    # this, tail iterations fell into the single-step path below and
    # cold-compiled a per-bucket fwd+bwd program EACH (~8 min on the
    # relay — the round-3/4 e2e "hang").
    scan_ok = cycle_mode == "scan" \
        and scan_dispatch([], bucketer)[0] is not None
    while it < max_iters:
        rem = max_iters - it
        n_act = min(k_disp, rem)
        if k_disp > 1 and (rem >= k_disp or scan_ok):
            # K steps per dispatch: fixed RPC/buffer + executable-switch
            # overhead amortized. With a bucketer the cycle is UNROLLED
            # with per-position depth bounds (silent); a full logging/BN
            # step then runs whenever a log boundary is crossed below.
            batches = [next_aug_batch() for _ in range(n_act)]
            triples = [next_arch(with_meta=True) for _ in range(n_act)]
            # pad a short tail to the program's static K by repeating the
            # last entry; padded positions are gated off by ``actives``
            pad = k_disp - n_act
            batches += batches[-1:] * pad
            triples += triples[-1:] * pad
            archs = [a for a, _, _ in triples]
            # SCAN mode (default): one lax.scan program whose switch
            # branch table (the static key) never changes across cycles;
            # UNROLL keeps the per-position static-bounds cycle for A/B.
            # Both enumerations are shared with bench.py and
            # tools/warmup_cache.py, so precompiled variants match.
            if cycle_mode == "scan":
                bseq, bids = None, None
                scands, sids = scan_dispatch([m for _, _, m in triples],
                                             bucketer)
            else:
                scands, sids = None, None
                bseq, bids = cycle_dispatch([m for _, _, m in triples],
                                            bucketer)
            rng, k_drop = jax.random.split(rng)
            state, logs_k = multi_step(
                state,
                jnp.stack([b["img"] for b in batches]),
                jnp.stack([b["gt"] for b in batches]),
                jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *archs),
                jax.random.split(k_drop, k_disp),
                bucket_ids=jnp.asarray(sids or bids or [0] * k_disp,
                                       jnp.int32),
                bounds_seq=bseq,
                scan_candidates=scands,
                # exact per-position schedule values as DATA (the schedule
                # never bakes into the program — optim.build_optimizer);
                # padded positions repeat the last active value (inactive,
                # never applied — some host schedules reject > max_iters)
                lrs=jnp.asarray(
                    [schedule(it + min(i, n_act - 1))
                     for i in range(k_disp)], jnp.float32),
                actives=None if scands is None else jnp.asarray(
                    [1] * n_act + [0] * pad, jnp.int32))
            if logs_k:
                # stacked [k] device scalars from the cycle program
                # (padded tail rows are zero). No host fetch and no
                # device op here — a float()/mean() would sync the host
                # to every cycle dispatch (~30ms RPC each on the relay);
                # stash the arrays and reduce+fetch ONCE at the log
                # boundary below.
                pend_cycles.append((logs_k, n_act))
            step_inc = n_act
            if (it + n_act) % bn_interval < n_act \
                    and it + n_act < max_iters:
                # (the second clause keeps the cycle from overshooting
                # max_iters by one — the final checkpoint must fire at
                # exactly it == max_iters)
                # crossing a BN-refresh boundary: one full step refreshes
                # BN running stats (the scan cycle runs with frozen
                # running stats; batch-statistics normalization — and so
                # the loss — is identical either way, running stats only
                # feed eval/ckpt). Default cadence is the log interval
                # (historical behavior); configs whose stats are consumed
                # only at eval/ckpt (which calibrate anyway) can raise
                # ``bn_refresh_interval`` and skip this program entirely —
                # on the relay the 56MB full-step executable alternating
                # with the scan program cost the cached e2e loop ~25%.
                # Reuses the cycle's LAST arch instead of drawing a new
                # one — an extra draw would rotate the sandwich-cycle
                # phase and every rotation is a fresh bounds_seq compile
                # of the unrolled cycle program.
                sharded = next_aug_batch()
                rng, k_drop = jax.random.split(rng)
                # bounds=None: ONE full program (MAX bounds) serves every
                # arch here — numerics are identical and it avoids a full-
                # variant compile per bucket for a once-per-log-line step
                state = state.replace(opt_state=set_learning_rate(
                    state.opt_state, schedule(it + k_disp)))
                state, logs = train_step(state, sharded["img"],
                                         sharded["gt"], archs[-1], k_drop)
                loss_acc += float(logs["decode.loss_seg"])
                n_acc += 1
                step_inc += 1
        else:
            sharded = next_aug_batch()
            arch, bounds = next_arch()
            rng, k_drop = jax.random.split(rng)
            # full step (loss logs + BN stat refresh) on logging
            # iterations; silent fast step otherwise (see make_train_step)
            step_fn = train_step if (it + 1) % log_interval == 0 \
                else train_step_fast
            state = state.replace(opt_state=set_learning_rate(
                state.opt_state, schedule(it)))
            state, logs = step_fn(state, sharded["img"], sharded["gt"],
                                  arch, k_drop, bounds=bounds)
            if logs:
                loss_acc += float(logs["decode.loss_seg"])
                n_acc += 1
            step_inc = 1
        it += step_inc
        if val_loss_step is not None and it % wf_train < step_inc:
            run_val_phase(state, it)
        if it % log_interval < step_inc:
            comp: Dict[str, float] = {}
            if pend_cycles:
                # ONE device reduce + ONE host fetch for the whole log
                # line: mean loss over EVERY cycle's active positions in
                # this window, plus every component loss of the last
                # cycle's final active step. The fetch doubles as the
                # window's device sync (stream ordering covers all
                # enqueued steps).
                last_logs, last_n = pend_cycles[-1]
                names = [k for k in last_logs
                         if "loss" in k and k != "loss"]
                parts = [jnp.concatenate(
                    [c["decode.loss_seg"][:n] for c, n in pend_cycles])]
                head = sum(n for _, n in pend_cycles)
                if names:
                    parts.append(jnp.stack(
                        [last_logs[k][last_n - 1] for k in names]))
                vals, t_now = _sync_window_clock(
                    lambda: np.asarray(jnp.concatenate(parts)))
                comp = dict(zip(names, map(float, vals[head:])))
                loss_acc += float(vals[:head].mean())
                n_acc += 1
                pend_cycles = []
            else:
                # no pending device logs: still force an explicit device
                # sync (fetch one scalar) BEFORE reading the clock, so
                # the window time includes device execution, never just
                # host dispatch
                _, t_now = _sync_window_clock(
                    lambda: np.asarray(state.step))
                if logs:
                    comp = {k: float(v) for k, v in logs.items()
                            if "loss" in k and k != "loss"}
            dt = t_now - t_last
            ips = log_interval * global_batch / max(dt, 1e-9)
            lr_now = float(schedule(it))
            if n_acc:
                last_loss = loss_acc / n_acc
            # n_acc == 0 happens in the run's FINAL window (the boundary
            # full step is skipped to keep `it` from overshooting
            # max_iters) when no cycle logs are pending: carry the
            # previous window's loss instead of recording a bogus 0.0.
            logger.info(
                "iter %d/%d loss=%.4f lr=%.2e %.1f img/s",
                it, max_iters, last_loss, lr_now, ips)
            row = {"iter": it, "loss": last_loss,
                   "img_per_sec": ips,
                   # component losses (e.g. the distiller's
                   # distill_loss_seg / pairwise_loss_seg) so history.json
                   # suffices to audit a run's loss breakdown
                   **comp}
            history["loss"].append(row)
            if window_cb:
                window_cb(row)
            loss_acc, n_acc = 0.0, 0
            # sync-to-sync windows: the next window starts at THIS sync
            # point; host-side logging time after it charges to the next
            # window (it delays the next dispatches)
            t_last = t_now
        if progress_cb:
            progress_cb(it - 1, logs)

        calibrated_this_iter = False
        if it % ckpt_interval < step_inc or it == max_iters:
            calib_n = ckpt_calib_n
            if calib_n and train_dataset is not None:
                # re-estimate BN running stats at the MAX anchor before
                # saving: silent fast steps never update stats, so
                # checkpointed stats otherwise reflect only the sparse
                # log-boundary refreshes (whatever arch those sampled)
                from .calibrate import calibrate_bn
                vs = calibrate_bn(
                    model,
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    train_dataset, encode_arch(max_arch),
                    num_batches=calib_n,
                    batch_size=samples_per_gpu,
                    test_params=test_pipe)
                state = state.replace(batch_stats=vs["batch_stats"])
                calibrated_this_iter = calib_n >= eval_calib_n
            if jax.process_index() == 0:
                path = osp.join(work_dir, f"iter_{it}.ckpt")
                save_checkpoint(path, state, meta={
                    "iter": it,
                    "CLASSES": list(getattr(train_dataset, "CLASSES", [])),
                    "PALETTE": getattr(train_dataset, "PALETTE", None),
                    "max_arch": max_arch,
                })
                update_latest(work_dir, path)

        if val_dataset is not None and val_sampler is not None and \
                it % eval_interval < step_inc:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            if eval_calib_n and train_dataset is not None and \
                    not calibrated_this_iter:
                # cross_arch_evaluate consumes running stats directly;
                # when bn_refresh_interval starves the in-loop refresh,
                # re-estimate them here (eval-only — train state keeps
                # its own stats). Skipped when the checkpoint block just
                # calibrated state.batch_stats at this same iteration:
                # `variables` above already carries those stats, and a
                # second calibrate_bn would repeat the whole estimation
                # for identical results.
                from .calibrate import calibrate_bn
                variables = calibrate_bn(
                    model, variables, train_dataset,
                    encode_arch(max_arch), num_batches=eval_calib_n,
                    batch_size=samples_per_gpu, test_params=test_pipe)
            res = cross_arch_evaluate(model, variables, val_sampler,
                                      val_dataset, max_arch,
                                      test_params=test_pipe)
            history["eval"].append({"iter": it, "metrics": res})

    # shut the prefetch thread down and release its staged device batches
    # (the data iterator is infinite, so it never closes by exhaustion;
    # without this every train_segmentor call in a sweep pins ~depth
    # augmented batches in HBM). The exception path is covered by _pump's
    # finally when the abandoned generator is collected.
    _pf_iter.close()
    with open(osp.join(work_dir, "history.json"), "w") as f:
        json.dump(history, f, indent=2, default=float)
    return state, history
