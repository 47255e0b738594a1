"""vmapped population eval == per-subnet sequential eval."""
import jax
import jax.numpy as jnp
import numpy as np

from gaiaseg_tpu.data import SyntheticDataset
from gaiaseg_tpu.engine import evaluate
from gaiaseg_tpu.engine.evaluate import evaluate_population
from gaiaseg_tpu.models import build_segmentor, encode_arch, model_max_arch
import pytest

F32 = jnp.float32

MODEL = dict(
    type="DynamicEncoderDecoder",
    backbone=dict(type="DynamicResNet", stem_width=8,
                  body_width=[8, 8, 16, 16], body_depth=[2, 1, 1, 1],
                  out_indices=(0, 1, 2, 3), dtype=F32),
    decode_head=dict(type="DynamicPSPHead", in_index=3, channels=8,
                     pool_scales=(1, 2), dropout_ratio=0.0, num_classes=4,
                     dtype=F32, loss_decode=dict(type="CrossEntropyLoss")),
    test_cfg=dict(mode="whole"),
)

METAS = [
    None,
    {"arch.backbone.body.width": [4, 8, 8, 8],
     "arch.backbone.body.depth": [1, 1, 1, 1]},
    {"arch.backbone.stem.width": 8,
     "arch.backbone.body.depth": [2, 1, 1, 1],
     "arch.backbone.body.width": [8, 8, 8, 16]},
]


def test_population_matches_sequential():
    model = build_segmentor(MODEL)
    max_arch = model_max_arch(MODEL)
    img = jnp.zeros((1, 32, 32, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), img,
                           encode_arch(max_arch))
    ds = SyntheticDataset(length=4, size=(32, 32), num_classes=4, cells=2)

    archs = [encode_arch(max_arch, m) for m in METAS]
    pop = evaluate_population(model, variables, ds, archs, batch_size=2)
    assert len(pop) == 3
    for meta, pop_res in zip(METAS, pop):
        seq = evaluate(model, variables, ds, encode_arch(max_arch, meta),
                       batch_size=2)
        assert abs(seq["mIoU"] - pop_res["mIoU"]) < 1e-9
        assert abs(seq["aAcc"] - pop_res["aAcc"]) < 1e-9


@pytest.mark.slow  # >15s-ish on the 1-core box
def test_population_bucketed_matches_sequential():
    """Depth-bucketed population sweep (per-group STATIC bounds) returns
    the same metrics, in input order, as the sequential eval — the
    correctness contract behind the bounded subnets/hr path."""
    from gaiaseg_tpu.models.arch_util import exact_bounds

    model = build_segmentor(MODEL)
    max_arch = model_max_arch(MODEL)
    img = jnp.zeros((1, 32, 32, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), img,
                           encode_arch(max_arch))
    ds = SyntheticDataset(length=4, size=(32, 32), num_classes=4, cells=2)

    archs = [encode_arch(max_arch, m) for m in METAS]
    pop = evaluate_population(
        model, variables, ds, archs, batch_size=2, metas=METAS,
        bucketer=lambda m: exact_bounds(max_arch, m), chunk=2)
    assert len(pop) == 3
    for meta, pop_res in zip(METAS, pop):
        seq = evaluate(model, variables, ds, encode_arch(max_arch, meta),
                       batch_size=2)
        assert abs(seq["mIoU"] - pop_res["mIoU"]) < 1e-9
        assert abs(seq["aAcc"] - pop_res["aAcc"]) < 1e-9


def test_bn_calibration():
    """reset + re-estimate running stats for a subnet; eval still works and
    stats actually moved."""
    import numpy as np
    from gaiaseg_tpu.data import SyntheticDataset
    from gaiaseg_tpu.engine import calibrate_bn, evaluate
    from gaiaseg_tpu.engine.calibrate import reset_bn_stats

    model = build_segmentor(MODEL)
    max_arch = model_max_arch(MODEL)
    img = jnp.zeros((1, 32, 32, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), img,
                           encode_arch(max_arch))
    ds = SyntheticDataset(length=8, size=(32, 32), num_classes=4, cells=2)
    arch = encode_arch(max_arch, METAS[1])

    reset = reset_bn_stats(variables["batch_stats"])
    flat = jax.tree_util.tree_leaves(reset)
    assert all(float(jnp.max(jnp.abs(x))) in (0.0, 1.0) for x in flat)

    calibrated = calibrate_bn(model, variables, ds, arch, num_batches=3,
                              batch_size=2)
    moved = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree_util.tree_map(lambda a, b: a - b,
                               calibrated["batch_stats"],
                               variables["batch_stats"]), 0.0)
    assert moved > 0
    res = evaluate(model, calibrated, ds, arch, batch_size=2)
    assert 0.0 <= res["mIoU"] <= 1.0
