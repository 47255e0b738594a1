"""Injected-learning-rate optimizer mechanics.

The LR rides in the optimizer STATE (optax.inject_hyperparams), never in
the compiled program, so one compiled train program serves every schedule
and run length (reference apis/train.py builds an mmcv LrUpdaterHook that
mutates optimizer.param_groups between steps — same decoupling, done the
functional way). These tests pin:
  * set_learning_rate finds the injected node through chain/masked nesting
  * the applied update scales exactly with the injected value
  * host-side schedules (poly/step/warmup) produce the reference formulas
  * the jitted step does NOT retrace when only the lr value changes
"""
import jax
import jax.numpy as jnp
import numpy as np

from gaiaseg_tpu.engine.optim import (build_lr_schedule, build_optimizer,
                                      set_learning_rate)


def _params():
    return {"w": jnp.ones((4, 4), jnp.float32),
            "b": jnp.zeros((4,), jnp.float32)}


def _grads():
    return {"w": jnp.full((4, 4), 2.0), "b": jnp.ones((4,))}


def test_set_learning_rate_scales_updates_through_chain():
    # full production chain: clip + wd + momentum + injected lr
    tx = build_optimizer(dict(type="SGD", lr=0.5, momentum=0.9,
                              weight_decay=1e-4),
                         dict(grad_clip=dict(max_norm=100.0)))
    params = _params()
    st = tx.init(params)

    up1, _ = tx.update(_grads(), st, params)
    up2, _ = tx.update(_grads(), set_learning_rate(st, 0.25), params)
    up0, _ = tx.update(_grads(), set_learning_rate(st, 0.0), params)
    for k in params:
        np.testing.assert_allclose(np.asarray(up2[k]),
                                   0.5 * np.asarray(up1[k]), rtol=1e-6)
        assert float(jnp.abs(up0[k]).max()) == 0.0


def test_set_learning_rate_survives_freeze_mask_wrapper():
    mask = {"w": False, "b": True}  # b frozen
    tx = build_optimizer(dict(type="SGD", lr=1.0), None,
                         freeze_mask=mask)
    params = _params()
    st = tx.init(params)
    up, _ = tx.update(_grads(), set_learning_rate(st, 0.1), params)
    np.testing.assert_allclose(np.asarray(up["w"]), -0.2, rtol=1e-6)
    assert float(jnp.abs(up["b"]).max()) == 0.0


def test_lr_is_data_not_compile_key():
    """Changing the injected lr must NOT retrace the jitted step — the
    whole point of the injected-lr design (a retrace per schedule value
    would re-upload the executable every step on the relay)."""
    tx = build_optimizer(dict(type="SGD", lr=0.5, momentum=0.9), None)
    params = _params()
    st = tx.init(params)
    traces = []

    @jax.jit
    def step(opt_state, grads, params):
        traces.append(1)
        up, new_state = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, up), new_state

    p, s = step(st, _grads(), params)
    for lr in (0.3, 0.1, 0.03):
        p, s = step(set_learning_rate(s, lr), _grads(), p)
    assert len(traces) == 1, f"retraced {len(traces)}x on lr change"


def test_poly_schedule_matches_reference_formula():
    # reference pspnet config :178: poly power 0.9, min_lr 1e-4
    sched = build_lr_schedule(
        dict(policy="poly", power=0.9, min_lr=1e-4), 0.01, 100)
    for it in (0, 1, 50, 99, 100, 150):
        p = min(max(1.0 - it / 100, 0.0), 1.0)
        expect = 1e-4 + (0.01 - 1e-4) * p ** 0.9
        assert abs(sched(it) - expect) < 1e-12, it


def test_step_schedule_and_warmup():
    sched = build_lr_schedule(dict(policy="step", step=[4, 8], gamma=0.1),
                              1.0, 12)
    # decay fires AT the milestone (mmcv StepLrUpdaterHook / MultiStepLR)
    assert [round(sched(i), 6) for i in (0, 3, 4, 7, 8)] == \
        [1.0, 1.0, 0.1, 0.1, 0.01]
    wsched = build_lr_schedule(
        dict(policy="fixed", warmup="linear", warmup_iters=4,
             warmup_ratio=0.5), 1.0, 12)
    np.testing.assert_allclose([wsched(i) for i in (0, 2, 4, 8)],
                               [0.5, 0.75, 1.0, 1.0])
