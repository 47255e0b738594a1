"""Optimizer + LR schedule construction from mmcv-style configs.

Capability parity with the reference's optimizer surface (SURVEY.md §2.8
schedules): SGD lr/momentum/weight_decay (pspnet config :175), poly LR decay
``lr = base * (1 - iter/max_iter)^power`` with ``min_lr`` floor, step decay,
``grad_clip=dict(max_norm=N)`` and the ``lr_scaler`` linear/power scaling of
base LR by global batch size (reference apis/train.py:102-113).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import optax


def scale_lr(base_lr: float, global_batch: int, scaler_cfg: Optional[Dict]
             ) -> float:
    """reference apis/train.py:102-113: linear => base_lr*global_batch;
    power => base_lr*sqrt(global_batch). ``base_lr`` in the scaler config is
    per-sample."""
    if not scaler_cfg:
        return base_lr
    policy = scaler_cfg.get("policy", scaler_cfg.get("type", "linear"))
    per_sample = scaler_cfg.get("base_lr", base_lr)
    if policy == "linear":
        return per_sample * global_batch
    if policy in ("power", "sqrt"):
        return per_sample * (global_batch ** 0.5)
    raise ValueError(f"unknown lr_scaler policy {policy!r}")


def build_lr_schedule(lr_config: Optional[Dict], base_lr: float,
                      max_iters: int) -> optax.Schedule:
    cfg = dict(lr_config or {})
    policy = cfg.get("policy", "fixed").lower()
    warmup = cfg.get("warmup")
    warmup_iters = int(cfg.get("warmup_iters", 0))
    warmup_ratio = float(cfg.get("warmup_ratio", 0.1))

    # Pure host-side float math (NOT jnp): schedules are evaluated on the
    # host every dispatch and shipped as DATA into the injected-lr
    # optimizer state (build_optimizer) — a jnp formulation here would
    # dispatch tiny device programs per step and bake nothing anyway.
    if policy == "poly":
        power = float(cfg.get("power", 0.9))
        min_lr = float(cfg.get("min_lr", 0.0))

        def main(step):
            p = min(max(1.0 - float(step) / max(max_iters, 1), 0.0), 1.0)
            return min_lr + (base_lr - min_lr) * (p ** power)
    elif policy == "step":
        steps = sorted(int(s) for s in cfg.get("step", []))
        gamma = float(cfg.get("gamma", 0.1))

        def main(step):
            # decay AT the milestone (mmcv StepLrUpdaterHook counts
            # milestones <= progress, like torch MultiStepLR)
            return base_lr * gamma ** sum(float(step) >= s for s in steps)
    elif policy in ("fixed", "constant"):
        def main(step):
            return base_lr
    else:
        raise ValueError(f"unknown lr policy {policy!r}")

    if warmup:
        def schedule(step):
            w = step / max(warmup_iters, 1)
            warm = base_lr * (warmup_ratio + (1 - warmup_ratio) * w)
            m = main(step)
            return warm * (step < warmup_iters) + m * (step >= warmup_iters)
        return schedule
    return main


def set_learning_rate(opt_state, lr):
    """Functionally set the injected learning rate in an optimizer state.

    Works host-side between dispatches (a one-scalar upload) and inside a
    jitted program with a traced ``lr`` (make_multi_train_step applies the
    exact per-position schedule value this way). Finds every
    inject_hyperparams node (any NamedTuple whose ``hyperparams`` dict has
    a ``learning_rate`` entry — optax 0.2.6 names it
    InjectStatefulHyperparamsState) without assuming where it sits in the
    chain/masked wrapper nesting."""
    import jax.numpy as jnp
    lr = jnp.asarray(lr, jnp.float32)

    def rec(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            return s._replace(hyperparams={**hp, "learning_rate": lr})
        if hasattr(s, "_fields"):  # other NamedTuple states: recurse
            return type(s)(*(rec(getattr(s, f)) for f in s._fields))
        if isinstance(s, (tuple, list)):
            return type(s)(rec(x) for x in s)
        return s

    return rec(opt_state)


def freeze_labels(params: Dict[str, Any], model_cfg: Optional[Dict] = None
                  ) -> Optional[Dict[str, Any]]:
    """True-labeled subtrees get zero updates (optax.masked):
    - distiller teacher params (t_backbone/t_neck/t_decode_head)
    - backbone ``frozen_stages`` (reference dynamic_resnet.py:304-334:
      stem + layer1..layerN frozen when frozen_stages >= 0/N)
    Returns None when nothing is frozen."""
    frozen_prefixes = {"t_backbone", "t_neck", "t_decode_head"}
    frozen_bb: set = set()
    if model_cfg:
        fs = int((model_cfg.get("backbone") or {}).get("frozen_stages", -1))
        if fs >= 0:
            frozen_bb.add("stem0")
            frozen_bb.update({"stem1", "stem2"})
            for i in range(1, fs + 1):
                frozen_bb.add(f"layer{i}")

    any_frozen = [False]

    def walk(tree, frozen, in_backbone):
        if not isinstance(tree, dict):
            any_frozen[0] = any_frozen[0] or frozen
            return frozen
        out = {}
        for k, v in tree.items():
            f = frozen or k in frozen_prefixes or \
                (in_backbone and k in frozen_bb)
            out[k] = walk(v, f, in_backbone or k == "backbone_m")
        return out

    labels = walk(params, False, False)
    return labels if any_frozen[0] else None


def build_optimizer(optimizer_cfg: Dict[str, Any],
                    optimizer_config: Optional[Dict[str, Any]] = None,
                    schedule: Optional[optax.Schedule] = None,
                    freeze_mask: Optional[Dict[str, Any]] = None
                    ) -> optax.GradientTransformation:
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop("type", "SGD").lower()
    lr = cfg.pop("lr", 0.01)
    wd = cfg.pop("weight_decay", 0.0)
    lr_or_sched = schedule if schedule is not None else lr

    chain = []
    grad_clip = (optimizer_config or {}).get("grad_clip")
    if grad_clip:
        chain.append(optax.clip_by_global_norm(float(grad_clip["max_norm"])))

    if opt_type == "sgd":
        momentum = cfg.pop("momentum", 0.0)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if momentum:
            chain.append(optax.trace(decay=momentum,
                                     nesterov=cfg.pop("nesterov", False)))
    elif opt_type == "adamw":
        betas = cfg.pop("betas", (0.9, 0.999))
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                         eps=cfg.pop("eps", 1e-8)))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
    elif opt_type == "adam":
        chain.append(optax.scale_by_adam())
    else:
        raise ValueError(f"unknown optimizer {opt_type!r}")

    # The learning rate rides in the optimizer STATE (inject_hyperparams),
    # never in the compiled program: baking a schedule closure here turns
    # max_iters/warmup/base_lr into HLO constants, so EVERY different run
    # length recompiles every step program — 10-20 min per unrolled-cycle
    # program on the relay (this is why bench's 64-iter e2e run used to
    # recompile programs an 80k-iter warmup had already cached). The train
    # loop sets the exact per-step value host-side (``set_learning_rate``
    # / the ``lrs`` arg of make_multi_train_step); a caller that never
    # does runs at the base lr. ``schedule`` stays in the signature for
    # the callers that evaluate it host-side.
    del lr_or_sched
    chain.append(optax.inject_hyperparams(optax.scale_by_learning_rate)(
        learning_rate=float(lr)))
    tx = optax.chain(*chain)
    if freeze_mask is not None:
        tx = optax.chain(tx, optax.masked(
            optax.set_to_zero(), freeze_mask))
    return tx
