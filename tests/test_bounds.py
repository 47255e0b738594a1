"""ArchBounds (depth-proportional execution) correctness.

The bounded fast path must be numerically IDENTICAL to the round-1 masked
path: blocks at index >= bound never execute; blocks in [depth, bound) stay
masked identities (matching the reference semantics where blocks beyond
``depth_state`` do not run, reference dynamic_res_layer.py:166-172).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaiaseg_tpu.archspace import build_model_sampler
from gaiaseg_tpu.models import (ArchBounds, build_segmentor, covering_bounds,
                                encode_arch, exact_bounds,
                                make_depth_bucketer, model_max_arch)

# long-running module: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

F32 = jnp.float32

MODEL = dict(
    type="DynamicEncoderDecoder",
    backbone=dict(type="DynamicResNet", stem_width=8,
                  body_width=[8, 16, 24, 32], body_depth=[2, 3, 5, 2],
                  out_indices=(0, 1, 2, 3), dtype=F32),
    decode_head=dict(type="DynamicPSPHead", in_index=3, channels=16,
                     pool_scales=(1, 2), dropout_ratio=0.0, num_classes=7,
                     dtype=F32, loss_decode=dict(type="CrossEntropyLoss")),
    auxiliary_head=dict(type="DynamicFCNHead", in_index=2, channels=8,
                        num_convs=1, concat_input=False, dropout_ratio=0.0,
                        num_classes=7, dtype=F32,
                        loss_decode=dict(type="CrossEntropyLoss",
                                         loss_weight=0.4)),
    test_cfg=dict(mode="whole"))

SUB = {"arch.backbone.stem.width": 8,
       "arch.backbone.body.width": [8, 8, 16, 24],
       "arch.backbone.body.depth": [1, 2, 3, 1]}


@pytest.fixture(scope="module")
def setup():
    model = build_segmentor(MODEL)
    max_arch = model_max_arch(MODEL)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3), F32)
    gt = jax.random.randint(jax.random.PRNGKey(2), (2, 32, 32), 0, 7)
    arch = encode_arch(max_arch, SUB)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(3)},
        img, gt, arch, method=model.forward_train)
    return model, max_arch, variables, img, gt, arch


def test_bounded_forward_matches_masked(setup):
    model, max_arch, variables, img, _, arch = setup
    ref = model.apply(variables, img, arch)
    # depth-only bounds leave every contraction dim unchanged -> bitwise
    for bounds in (ArchBounds(body_depth=(1, 2, 3, 1)),  # exact depths
                   ArchBounds(body_depth=(2, 2, 4, 2)),  # loose bucket
                   ArchBounds(body_depth=(2, 3, 5, 2))): # == MAX
        out = model.apply(variables, img, arch, bounds=bounds)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    # width bounds shrink contraction dims: identical math over the active
    # lanes, but XLA may re-tile the shorter reductions -> allclose
    for bounds in (exact_bounds(max_arch, SUB),          # exact fit
                   ArchBounds(body_depth=(2, 2, 4, 2),   # loose width cover
                              body_width=(8, 16, 16, 32),
                              stem_width=8)):
        out = model.apply(variables, img, arch, bounds=bounds)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-4, atol=1e-5)


def test_bounded_train_step_matches_masked(setup):
    model, max_arch, variables, img, gt, arch = setup
    rngs = {"dropout": jax.random.PRNGKey(4)}
    (l0, _), mut0 = model.apply(variables, img, gt, arch, False,
                                method=model.forward_train,
                                mutable=["batch_stats"], rngs=rngs)
    (l1, _), mut1 = model.apply(variables, img, gt, arch, False,
                                exact_bounds(max_arch, SUB),
                                method=model.forward_train,
                                mutable=["batch_stats"], rngs=rngs)
    # train-mode BN divides by batch stddev, amplifying reduction-order
    # noise of the width-sliced contractions layer over layer -> 1e-3
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-3)
    # the bounded program must return the COMPLETE batch_stats collection
    # (skipped blocks and lanes beyond the width bound keep their old
    # stats), or the train state would drop stats of inactive blocks
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-3, atol=1e-4),
        mut0["batch_stats"], mut1["batch_stats"])


def test_bounded_grads_match_masked(setup):
    model, max_arch, variables, img, gt, arch = setup

    def loss(params, bounds):
        (total, _) = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            img, gt, arch, False, bounds, method=model.forward_train,
            rngs={"dropout": jax.random.PRNGKey(4)})
        return total

    g0 = jax.grad(lambda p: loss(p, None))(variables["params"])
    g1 = jax.grad(lambda p: loss(p, exact_bounds(max_arch, SUB)))(
        variables["params"])
    # Masked-MAX and width-bounded are the same function up to float
    # reduction order, but train-mode BN divides by batch stddev and
    # amplifies that noise multiplicatively per layer — so masked-vs-
    # bounded grads only agree loosely. The GROUND-TRUTH check (bounded
    # grads == physically-extracted grads, bitwise) is
    # test_width_bounded_grads_equal_extracted below.
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(a).max()), 1e-2)
        assert float(np.abs(a - b).max()) <= 0.05 * scale + 1e-4


def test_width_bounded_grads_equal_extracted(setup):
    """Gradients of the width+depth-bounded supernet step equal the
    physically-extracted subnet's gradients EXACTLY on every leaf whose
    extraction is a prefix slice (concat consumers use row gathers and are
    covered by the loss identity in test_width_bounded_equals_extracted)."""
    from gaiaseg_tpu.engine.extract import extract_subnet
    model, max_arch, variables, img, gt, arch = setup
    sub_cfg, sub_vars, _ = extract_subnet(MODEL, variables, SUB)
    sub_model = build_segmentor(sub_cfg)
    sub_arch = encode_arch(model_max_arch(sub_cfg))
    rngs = {"dropout": jax.random.PRNGKey(4)}

    def loss_sup(params):
        (total, _) = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, gt, arch, False, exact_bounds(max_arch, SUB),
            method=model.forward_train, rngs=rngs)
        return total

    def loss_sub(params):
        (total, _) = sub_model.apply(
            {"params": params, "batch_stats": sub_vars["batch_stats"]},
            img, gt, sub_arch, False, method=sub_model.forward_train,
            rngs=rngs)
        return total

    g_sup = jax.grad(loss_sup)(variables["params"])
    g_sub = jax.grad(loss_sub)(sub_vars["params"])

    from jax.tree_util import tree_flatten_with_path, keystr
    sup_flat = dict((keystr(k), v)
                    for k, v in tree_flatten_with_path(g_sup)[0])
    checked = 0
    for k, gs in tree_flatten_with_path(g_sub)[0]:
        key = keystr(k)
        if key not in sup_flat or "bottleneck" in key or "conv_cat" in key:
            continue  # concat consumers: rows are gathered, not sliced
        gl = np.asarray(sup_flat[key])
        gs = np.asarray(gs)
        sl = tuple(slice(0, s) for s in gs.shape)
        np.testing.assert_allclose(gl[sl], gs, rtol=1e-6, atol=1e-7,
                                   err_msg=key)
        checked += 1
    assert checked > 20


def test_width_bounded_equals_extracted(setup):
    """Exact width+depth bounds reproduce the PHYSICALLY SLICED subnet
    bitwise — the bounded program and the extracted model run identical
    convolutions on identical weights (the reference's slice semantics,
    dynamic_res_layer.py:154-157). The masked-MAX path differs from both
    only by float reduction order."""
    from gaiaseg_tpu.engine.extract import extract_subnet
    model, max_arch, variables, img, gt, arch = setup
    sub_cfg, sub_vars, _ = extract_subnet(MODEL, variables, SUB)
    sub_model = build_segmentor(sub_cfg)
    sub_arch = encode_arch(model_max_arch(sub_cfg))
    rngs = {"dropout": jax.random.PRNGKey(4)}
    (ls, _), _ = sub_model.apply(sub_vars, img, gt, sub_arch, False,
                                 method=sub_model.forward_train,
                                 mutable=["batch_stats"], rngs=rngs)
    (lb, _), _ = model.apply(variables, img, gt, arch, False,
                             exact_bounds(max_arch, SUB),
                             method=model.forward_train,
                             mutable=["batch_stats"], rngs=rngs)
    assert float(ls) == float(lb)


def test_bucketer_covers_and_is_bounded():
    max_arch = model_max_arch(MODEL)
    sampler = build_model_sampler(dict(type="concat", model_samplers=[
        dict(type="anchor", anchors=[
            {"name": "MIN", "arch.backbone.body.depth": [1, 1, 2, 1]},
            {"name": "MID", "arch.backbone.body.depth": [2, 2, 3, 1]}]),
        dict(type="repeat", times=3, model_sampler=dict(
            type="range", key="arch.backbone.body.depth",
            start=[1, 1, 2, 1], end=[2, 3, 5, 2], step=[1, 1, 1, 1]))]))
    bucketer = make_depth_bucketer(sampler, max_arch)
    seen = set()
    for _ in range(64):
        meta = sampler.sample()
        b = bucketer(meta)
        assert b.covers(meta.get("arch.backbone.body.depth",
                                 max_arch["backbone"]["body"]["depth"]))
        seen.add(b)
    # distinct compiled variants stay bounded: anchors + dominant-stage
    # quantization levels + MAX
    assert len(seen) <= 2 + 4 + 1
    # anchors map to their exact tuple (smallest covering candidate)
    assert bucketer({"arch.backbone.body.depth": [1, 1, 2, 1]}
                    ).body_depth == (1, 1, 2, 1)


def test_covering_bounds():
    max_arch = model_max_arch(MODEL)
    metas = [{"arch.backbone.body.depth": [1, 3, 2, 1]},
             {"arch.backbone.body.depth": [2, 1, 4, 2]}]
    cb = covering_bounds(max_arch, metas)
    assert cb.body_depth == (2, 3, 4, 2)
    assert covering_bounds(max_arch, []).body_depth == (2, 3, 5, 2)


def test_bounded_population_eval_matches(setup):
    from gaiaseg_tpu.engine.evaluate import population_eval_steps
    model, max_arch, variables, img, gt, arch = setup
    metas = [SUB, {"arch.backbone.body.depth": [2, 1, 4, 2]}]
    archs = [encode_arch(max_arch, m) for m in metas]
    stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *archs)
    step = population_eval_steps(model, 7)
    cm0 = step(variables, img, gt, stack)
    cm1 = step(variables, img, gt, stack,
               bounds=covering_bounds(max_arch, metas))
    np.testing.assert_array_equal(np.asarray(cm0), np.asarray(cm1))


def test_bounded_cycle_matches_sequential_fast_steps(setup):
    """make_multi_train_step(bounds_seq=...) — the one-dispatch unrolled
    sandwich cycle — produces exactly the same final state as K sequential
    silent fast steps with the same per-step bounds."""
    from gaiaseg_tpu.engine import (create_train_state,
                                    make_multi_train_step, make_train_step)
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer

    model, max_arch, variables, img, gt, arch = setup
    metas = [SUB,
             {"arch.backbone.body.depth": [2, 1, 4, 2]},
             {"arch.backbone.body.depth": [1, 1, 2, 1]}]
    archs = [encode_arch(max_arch, m) for m in metas]
    # depth-only bounds: the sequential and cycle programs then execute
    # identical contraction shapes, so the comparison stays tight (width
    # bounds re-tile reductions; their numerics are pinned against the
    # extracted model in test_width_bounded_grads_equal_extracted)
    bseq = tuple(exact_bounds(max_arch, m)._replace(
        body_width=None, stem_width=None) for m in metas)
    k = len(metas)

    sched = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 100)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9),
                         dict(grad_clip=dict(max_norm=20)), sched)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.stack([img] * k)
    gts = jnp.stack([gt] * k)
    rngs = jax.random.split(jax.random.PRNGKey(4), k)
    arch_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *archs)

    s_seq = create_train_state(model, rng, img, archs[0], tx)
    fast = make_train_step(model, tx, update_stats=False, with_logs=False)
    for i in range(k):
        s_seq, _ = fast(s_seq, imgs[i], gts[i], archs[i], rngs[i],
                        bounds=bseq[i])

    s_cyc = create_train_state(model, rng, img, archs[0], tx)
    cycle = make_multi_train_step(model, tx, k)
    s_cyc, logs = cycle(s_cyc, imgs, gts, arch_stack, rngs, bounds_seq=bseq)

    assert logs == {}
    assert int(s_cyc.step) == int(s_seq.step) == k
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s_seq.params, s_cyc.params)


def test_switch_cycle_matches_sequential_and_reuses_program(setup):
    """BoundsSwitch dispatch (cycle_dispatch + lax.switch in multi_step):
    random cycle positions pay their OWN candidate's sliced cost, selected
    by a traced bucket id, while the compile key stays constant across
    cycles. The switch cycle must equal K sequential fast steps run at each
    position's effective candidate bounds, and a second cycle with
    different random draws must reuse the compiled program."""
    import time

    from gaiaseg_tpu.engine import (create_train_state,
                                    make_multi_train_step, make_train_step)
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from gaiaseg_tpu.models import BoundsSwitch, cycle_dispatch
    from gaiaseg_tpu.models.arch_util import make_depth_bucketer

    model, max_arch, variables, img, gt, _ = setup
    sampler = build_model_sampler(dict(type="concat", model_samplers=[
        dict(type="anchor", anchors=[
            {"name": "MIN", "arch.backbone.body.depth": [1, 1, 2, 1],
             "arch.backbone.body.width": [8, 8, 8, 16],
             "arch.backbone.stem.width": 8}]),
        dict(type="repeat", times=2, model_sampler=dict(
            type="composite", model_samplers=[
                dict(type="range", key="arch.backbone.body.width",
                     start=[8, 8, 8, 16], end=[8, 16, 24, 32],
                     step=[8, 8, 8, 8], ascending=True),
                dict(type="range", key="arch.backbone.body.depth",
                     start=[1, 1, 2, 1], end=[2, 3, 5, 2],
                     step=[1, 1, 1, 1])]))]))
    bucketer = make_depth_bucketer(sampler, max_arch, rand_k=2)
    assert len(bucketer.rand_candidates) == 2

    # one anchor position + one switch position whose draw maps to the
    # EXPENSIVE candidate (so the wrong branch truncates the arch — a
    # different function, not just reduction noise)
    k = 2
    metas = [
        {"name": "MIN", "arch.backbone.body.depth": [1, 1, 2, 1],
         "arch.backbone.body.width": [8, 8, 8, 16],
         "arch.backbone.stem.width": 8},
        {"arch.backbone.body.depth": [2, 2, 5, 2],
         "arch.backbone.body.width": [8, 16, 16, 24],
         "arch.backbone.stem.width": 8},
    ]
    bseq, bids = cycle_dispatch(metas, bucketer)
    assert isinstance(bseq[0], ArchBounds)        # anchor: static bounds
    assert isinstance(bseq[1], BoundsSwitch)      # randoms: runtime switch
    for m, b, i in zip(metas, bseq, bids):
        if isinstance(b, BoundsSwitch):
            assert b.candidates[i].covers(
                m.get("arch.backbone.body.depth"),
                m.get("arch.backbone.body.width"),
                m.get("arch.backbone.stem.width"))
    assert bids[1] > 0 and not bseq[1].candidates[0].covers(
        metas[1]["arch.backbone.body.depth"],
        metas[1]["arch.backbone.body.width"],
        metas[1]["arch.backbone.stem.width"])

    archs = [encode_arch(max_arch, m) for m in metas]
    sched = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 100)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9),
                         dict(grad_clip=dict(max_norm=20)), sched)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.stack([img] * k)
    gts = jnp.stack([gt] * k)
    rngs = jax.random.split(jax.random.PRNGKey(4), k)
    arch_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *archs)

    cycle = make_multi_train_step(model, tx, k)

    def run_cycle(ids, use_switch):
        s = create_train_state(model, rng, img, archs[0], tx)
        if use_switch:
            seq = bseq
        else:  # same cycle program shape, candidate baked in STATICALLY
            seq = tuple(b if not isinstance(b, BoundsSwitch)
                        else b.candidates[i] for b, i in zip(bseq, ids))
        s, _ = cycle(s, imgs, gts, arch_stack, rngs,
                     bucket_ids=jnp.asarray(ids, jnp.int32),
                     bounds_seq=seq)
        return s

    s_static = run_cycle(bids, use_switch=False)
    # a trajectory that deliberately takes the WRONG branch on every
    # switch position — the discrimination baseline below
    wrong = tuple((i + 1) % len(bseq[j].candidates)
                  if isinstance(bseq[j], BoundsSwitch) else i
                  for j, i in enumerate(bids))
    s_wrong = run_cycle(wrong, use_switch=False)
    s_cyc = run_cycle(bids, use_switch=True)

    def dist(a, b):
        return sum(float(np.abs(np.asarray(x) - np.asarray(y)).sum())
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    # width-sliced programs compiled in different surroundings disagree by
    # float reduction order amplified through train-mode BN (see
    # test_bounded_grads_match_masked), so exact equality is the wrong
    # check; correctness of the bounded math itself is pinned against the
    # extracted model elsewhere. THIS test pins branch SELECTION: against
    # an identically-shaped cycle program with the candidate baked in
    # statically, the switch cycle must land an order of magnitude closer
    # to the right-branch trajectory than to the wrong-branch one.
    d_right = dist(s_cyc.params, s_static.params)
    d_wrong = dist(s_cyc.params, s_wrong.params)
    assert d_right * 10 < d_wrong, (d_right, d_wrong)

    # a later cycle with different random draws produces the SAME static
    # key and therefore dispatches without compiling
    metas2 = [sampler.sample() for _ in range(k)]
    bseq2, bids2 = cycle_dispatch(metas2, bucketer)
    assert bseq2 == bseq
    t0 = time.time()
    s_cyc, _ = cycle(s_cyc, imgs, gts, arch_stack, rngs,
                     bucket_ids=jnp.asarray(bids2, jnp.int32),
                     bounds_seq=bseq2)
    jax.block_until_ready(s_cyc.params)
    assert time.time() - t0 < 5.0


def test_scan_cycle_matches_switch_and_reuses_program(setup):
    """SCAN dispatch (scan_dispatch + lax.scan over a switch body in
    multi_step, the production default): every position — anchor or
    random — selects its branch at runtime from ONE shared candidate
    table, so the compiled program is K× smaller than the unrolled cycle
    and its static key never depends on the cycle's draw order. Pins:
    (a) anchors select their EXACT bounds (cheapest cover of an anchor
    is itself), (b) randoms select a covering branch, (c) the scan cycle
    lands an order of magnitude closer to the right-branch trajectory
    than to a wrong-branch one, (d) a later cycle with different draws
    reuses the program (same static key by construction)."""
    import time

    from gaiaseg_tpu.engine import create_train_state, make_multi_train_step
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from gaiaseg_tpu.models.arch_util import (make_depth_bucketer,
                                              scan_dispatch)

    model, max_arch, variables, img, gt, _ = setup
    sampler = build_model_sampler(dict(type="concat", model_samplers=[
        dict(type="anchor", anchors=[
            {"name": "MIN", "arch.backbone.body.depth": [1, 1, 2, 1],
             "arch.backbone.body.width": [8, 8, 8, 16],
             "arch.backbone.stem.width": 8}]),
        dict(type="repeat", times=2, model_sampler=dict(
            type="composite", model_samplers=[
                dict(type="range", key="arch.backbone.body.width",
                     start=[8, 8, 8, 16], end=[8, 16, 24, 32],
                     step=[8, 8, 8, 8], ascending=True),
                dict(type="range", key="arch.backbone.body.depth",
                     start=[1, 1, 2, 1], end=[2, 3, 5, 2],
                     step=[1, 1, 1, 1])]))]))
    bucketer = make_depth_bucketer(sampler, max_arch, rand_k=2)

    k = 2
    metas = [
        {"name": "MIN", "arch.backbone.body.depth": [1, 1, 2, 1],
         "arch.backbone.body.width": [8, 8, 8, 16],
         "arch.backbone.stem.width": 8},
        {"arch.backbone.body.depth": [2, 2, 5, 2],
         "arch.backbone.body.width": [8, 16, 16, 24],
         "arch.backbone.stem.width": 8},
    ]
    scands, sids = scan_dispatch(metas, bucketer)
    assert scands == bucketer.scan_candidates
    # (a) the anchor's selected branch IS its exact bounds: covering
    # implies every dim >=, so nothing cheaper can cover it
    assert scands[sids[0]] == exact_bounds(max_arch, metas[0])
    # (b) every position's branch covers its meta
    for m, i in zip(metas, sids):
        assert scands[i].covers(m.get("arch.backbone.body.depth"),
                                m.get("arch.backbone.body.width"),
                                m.get("arch.backbone.stem.width"))
    # the random's branch is NOT the first (cheapest) candidate, so a
    # wrong-branch trajectory is a genuinely different function
    assert sids[1] > 0

    archs = [encode_arch(max_arch, m) for m in metas]
    sched = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 100)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9),
                         dict(grad_clip=dict(max_norm=20)), sched)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.stack([img] * k)
    gts = jnp.stack([gt] * k)
    rngs = jax.random.split(jax.random.PRNGKey(4), k)
    arch_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *archs)

    cycle = make_multi_train_step(model, tx, k)

    def run_static(ids):
        # identically-shaped UNROLLED cycle with each position's candidate
        # baked in statically — the discrimination baseline
        s = create_train_state(model, rng, img, archs[0], tx)
        s, _ = cycle(s, imgs, gts, arch_stack, rngs,
                     bounds_seq=tuple(scands[i] for i in ids))
        return s

    s_right = run_static(sids)
    wrong = tuple((i + 1) % len(scands) for i in sids)
    s_wrong = run_static(wrong)

    ones_k = jnp.ones((k,), jnp.int32)
    s_scan = create_train_state(model, rng, img, archs[0], tx)
    s_scan, logs = cycle(s_scan, imgs, gts, arch_stack, rngs,
                         bucket_ids=jnp.asarray(sids, jnp.int32),
                         scan_candidates=scands, actives=ones_k)
    # scan mode returns the per-position component losses stacked [k]
    # (the train loop logs from these instead of dispatching a separate
    # full-step program every log window)
    assert "decode.loss_seg" in logs
    assert all(np.asarray(v).shape == (k,) for v in logs.values())
    assert np.all(np.asarray(logs["decode.loss_seg"]) > 0)
    assert int(s_scan.step) == k

    def dist(a, b):
        return sum(float(np.abs(np.asarray(x) - np.asarray(y)).sum())
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    d_right = dist(s_scan.params, s_right.params)
    d_wrong = dist(s_scan.params, s_wrong.params)
    assert d_right * 10 < d_wrong, (d_right, d_wrong)

    # (d) a later cycle with different random draws: the static part of
    # the dispatch — the candidate table — is IDENTICAL by construction,
    # so the second dispatch must not recompile
    metas2 = [sampler.sample() for _ in range(k)]
    scands2, sids2 = scan_dispatch(metas2, bucketer)
    assert scands2 == scands
    t0 = time.time()
    s_scan, _ = cycle(s_scan, imgs, gts, arch_stack, rngs,
                      bucket_ids=jnp.asarray(sids2, jnp.int32),
                      scan_candidates=scands2, actives=ones_k)
    jax.block_until_ready(s_scan.params)
    assert time.time() - t0 < 5.0

    # scan cycle honours per-position lr values (injected-lr state);
    # multi_step DONATES the state arg, so capture step before the call
    step_before = int(s_scan.step)
    lrs = jnp.asarray([0.02, 0.01], jnp.float32)
    s_lr, _ = cycle(s_scan, imgs, gts, arch_stack, rngs,
                    bucket_ids=jnp.asarray(sids2, jnp.int32),
                    scan_candidates=scands2, lrs=lrs, actives=ones_k)
    assert int(s_lr.step) == step_before + k

    # (e) TAIL padding: a cycle with the last position INACTIVE must
    # leave the state bit-identical to running only the active prefix —
    # the train loop pads short run tails (max_iters - it < k) through
    # this same program instead of compiling single-step variants.
    s_a = create_train_state(model, rng, img, archs[0], tx)
    s_a, logs_a = cycle(s_a, imgs, gts, arch_stack, rngs,
                        bucket_ids=jnp.asarray(sids2, jnp.int32),
                        scan_candidates=scands2, lrs=lrs,
                        actives=jnp.asarray([1] + [0] * (k - 1), jnp.int32))
    la = np.asarray(logs_a["decode.loss_seg"])
    assert la[0] > 0 and np.all(la[1:] == 0)  # padded rows log zero
    s_b = create_train_state(model, rng, img, archs[0], tx)
    one = make_multi_train_step(model, tx, 1)
    s_b, _ = one(s_b, imgs[:1], gts[:1],
                 jax.tree_util.tree_map(lambda x: x[:1], arch_stack),
                 rngs[:1], bucket_ids=jnp.asarray(sids2[:1], jnp.int32),
                 scan_candidates=scands2, lrs=lrs[:1],
                 actives=jnp.ones((1,), jnp.int32))
    assert int(s_a.step) == int(s_b.step) == 1
    for xa, xb in zip(jax.tree_util.tree_leaves(s_a.params),
                      jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

    # scan mode REFUSES a missing actives mask (a constant-folded ones
    # would fork a second compile key — the padding exists to avoid that)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="actives"):
        cycle(s_lr, imgs, gts, arch_stack, rngs,
              bucket_ids=jnp.asarray(sids2, jnp.int32),
              scan_candidates=scands2)


def test_bounds_noop_for_backbones_without_support():
    """Backbones that don't declare ``supports_bounds`` must treat bounds
    as a no-op (MAX execution, same numerics) rather than crash — the
    train loop builds the depth bucketer unconditionally (review finding:
    DynamicConvNeXt got TypeError on the first bounded step)."""
    cfg = dict(
        type="DynamicEncoderDecoder",
        backbone=dict(type="DynamicConvNeXt", body_width=[8, 16, 24, 32],
                      body_depth=[1, 1, 2, 1], out_indices=(0, 1, 2, 3),
                      dtype=F32),
        decode_head=dict(type="DynamicFCNHead", in_index=3, channels=8,
                         num_convs=1, concat_input=False, dropout_ratio=0.0,
                         num_classes=5, dtype=F32,
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    max_arch = model_max_arch(cfg)
    arch = encode_arch(max_arch)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3), F32)
    variables = model.init(jax.random.PRNGKey(1), img, arch)
    ref = model.apply(variables, img, arch)
    out = model.apply(variables, img, arch,
                      bounds=ArchBounds(body_depth=(1, 1, 1, 1)))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
