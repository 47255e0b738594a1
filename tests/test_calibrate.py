"""BN-calibration correctness: EMA debias, frozen-teacher stat
preservation, jitted-step reuse, and the depth-only (None-width) bucketer
space.

Reference parity: calibration re-implements ``caliberate_bn.reset_stats``
(reference apis/train.py:177-184) and the minibatch-stats eval mode
(tools/test_supernet.py:190-198); the debias makes the k-batch estimate
unbiased instead of carrying ``momentum^k`` of the fresh-init values.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaiaseg_tpu.engine.calibrate import (_calib_step, _debias_stats,
                                          calibrate_bn, reset_bn_stats)
from gaiaseg_tpu.models import build_segmentor
from gaiaseg_tpu.models.arch_util import encode_arch, model_max_arch

MODEL = dict(
    type="DynamicEncoderDecoder",
    backbone=dict(type="DynamicResNet", stem_width=8,
                  body_width=[8, 16, 24, 32], body_depth=[1, 1, 2, 1],
                  out_indices=(0, 1, 2, 3)),
    decode_head=dict(type="DynamicFCNHead", in_channels=128, channels=16,
                     num_convs=1, in_index=3, num_classes=4,
                     dropout_ratio=0.0),
    test_cfg=dict(mode="whole"),
)


def test_debias_recovers_batch_stats_exactly():
    """Simulate the DynBatchNorm EMA from reset over k batches of KNOWN
    statistics: the debiased result must equal the exponentially weighted
    average of the observed batch stats with the init contribution fully
    removed (the raw EMA keeps momentum^k of init — 43% at k=8)."""
    m, k = 0.9, 8
    rng = np.random.default_rng(0)
    means = rng.normal(3.0, 1.0, size=(k, 5))
    varis = rng.uniform(0.5, 4.0, size=(k, 5))
    ema_mean, ema_var = np.zeros(5), np.ones(5)  # reset init
    w = np.zeros(5)
    acc_mean, acc_var = np.zeros(5), np.zeros(5)
    for i in range(k):
        ema_mean = m * ema_mean + (1 - m) * means[i]
        ema_var = m * ema_var + (1 - m) * varis[i]
        acc_mean = m * acc_mean + (1 - m) * means[i]
        acc_var = m * acc_var + (1 - m) * varis[i]
        w = m * w + (1 - m)
    # the raw EMA is visibly biased toward the (0, 1) init
    assert np.all(np.abs(ema_mean) < np.abs(acc_mean / w) + 1e-9)
    stats = {"bn": {"mean": jnp.asarray(ema_mean),
                    "var": jnp.asarray(ema_var)}}
    out = _debias_stats(stats, momentum=m, num_batches=k)
    np.testing.assert_allclose(np.asarray(out["bn"]["mean"]),
                               acc_mean / w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["bn"]["var"]),
                               acc_var / w, rtol=1e-6)


def test_debias_keeps_untouched_leaves_at_init():
    """Inactive channels / depth-gated blocks never update: their stats
    stay exactly (0, 1) after reset, and the debias must map (0, 1) back
    to (0, 1) — the correction is safe on the whole tree."""
    stats = {"dead": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}
    out = _debias_stats(stats, momentum=0.9, num_batches=8)
    np.testing.assert_allclose(np.asarray(out["dead"]["mean"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["dead"]["var"]), 1.0,
                               rtol=1e-6)


def test_reset_and_debias_skip_frozen_teacher():
    """DynamicDistiller teacher stats are TRAINED values consumed with
    use_running_average=True; reset would permanently lobotomize the
    teacher (teacher_forward(train=False) never re-estimates)."""
    t_mean, t_var = jnp.full(3, 7.0), jnp.full(3, 2.5)
    stats = {
        "t_backbone": {"bn": {"mean": t_mean, "var": t_var}},
        "backbone": {"bn": {"mean": jnp.full(3, 4.0),
                            "var": jnp.full(3, 9.0)}},
    }
    reset = reset_bn_stats(stats)
    np.testing.assert_allclose(np.asarray(reset["t_backbone"]["bn"]["mean"]),
                               7.0)
    np.testing.assert_allclose(np.asarray(reset["t_backbone"]["bn"]["var"]),
                               2.5)
    np.testing.assert_allclose(np.asarray(reset["backbone"]["bn"]["mean"]),
                               0.0)
    np.testing.assert_allclose(np.asarray(reset["backbone"]["bn"]["var"]),
                               1.0)
    out = _debias_stats(reset, momentum=0.9, num_batches=8)
    np.testing.assert_allclose(np.asarray(out["t_backbone"]["bn"]["mean"]),
                               7.0)
    np.testing.assert_allclose(np.asarray(out["t_backbone"]["bn"]["var"]),
                               2.5)


def test_calibrate_estimate_independent_of_num_batches():
    """With a dataset whose every batch carries identical statistics
    (length == batch_size: each batch is a permutation of the same
    images), the debiased estimate is k-invariant. The pre-fix EMA
    shrank means by 1 - 0.9^k toward 0 (34% at k=4 vs 57% at k=8)."""
    from gaiaseg_tpu.data import SyntheticDataset

    model = build_segmentor(MODEL)
    max_arch = model_max_arch(MODEL)
    img = jnp.zeros((1, 32, 32, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), img,
                           encode_arch(max_arch))
    ds = SyntheticDataset(length=2, size=(32, 32), num_classes=4, cells=2)
    arch = encode_arch(max_arch)

    c2 = calibrate_bn(model, variables, ds, arch, num_batches=2,
                      batch_size=2)
    c8 = calibrate_bn(model, variables, ds, arch, num_batches=8,
                      batch_size=2)
    flat2 = jax.tree_util.tree_leaves(c2["batch_stats"])
    flat8 = jax.tree_util.tree_leaves(c8["batch_stats"])
    for a, b in zip(flat2, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_calib_step_reused_across_calls():
    """Repeated calibrate_bn calls (every ckpt/eval boundary of a soak)
    must reuse ONE jitted step — a fresh @jax.jit closure per call is a
    separate executable upload on the relay."""
    model = build_segmentor(MODEL)
    assert _calib_step(model) is _calib_step(model)


def test_depth_only_space_bucketer():
    """make_depth_bucketer over a search space with NO width keys
    (body_width/stem_width None throughout): candidate sorting and
    covering must work — None means 'covers every width' and sorts after
    concrete bounds of equal cost (tie-break is None-safe)."""
    from gaiaseg_tpu.archspace import build_model_sampler
    from gaiaseg_tpu.models.arch_util import make_depth_bucketer

    max_arch = {"backbone": {"body": {"depth": [2, 2, 5, 2]}}}
    sampler = build_model_sampler(dict(type="anchor", anchors=[
        {"name": "MIN", "arch.backbone.body.depth": [1, 1, 2, 1]},
        {"name": "MID", "arch.backbone.body.depth": [2, 2, 3, 2]},
    ]))
    bk = make_depth_bucketer(sampler, max_arch)
    assert bk({"arch.backbone.body.depth": [1, 1, 2, 1]}).body_depth == \
        (1, 1, 2, 1)
    # a draw between MID and MAX routes to the cheapest covering bound
    # (the dominant-stage quantization provides a (2,2,4,2) candidate)
    assert bk({"arch.backbone.body.depth": [2, 2, 4, 2]}).body_depth == \
        (2, 2, 4, 2)
    assert bk({"arch.backbone.body.depth": [1, 2, 3, 1]}).body_depth == \
        (2, 2, 3, 2)
