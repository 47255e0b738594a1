#!/usr/bin/env python
"""Benchmark: supernet train + slide-inference throughput on real hardware.

Stdout protocol: emits the JSON result line REPEATEDLY (after every
section and every ~75 s); the LAST line on stdout is the result —
always present, no matter when the process is killed:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Harness contract (this file may be killed by an external timeout, so it
must never be able to ship nothing — rounds 3 and 4 scored zero because
the JSON was emitted exactly once at the very end and the external kill
always won):
  - the (partial) JSON line is RE-EMITTED after EVERY completed section
    and every ~75 s from a ticker thread; the driver parses the last
    line, so a kill at ANY moment still finds the freshest result;
  - a GLOBAL deadline (GAIASEG_BENCH_DEADLINE, seconds, default 1500 —
    well inside the driver's ~1800 s kill) gates STARTING sections; a
    started section may overrun it by a small grace; a backstop timer at
    deadline+150 emits and exits regardless;
  - sections carry a ``min_required_s`` — the known cold minimum (e.g.
    the flagship cycle's ~600-1200 s relay executable load,
    docs/PERF.md) — and are refused outright when the remaining budget
    cannot cover it, instead of burning the margin on a doomed start;
  - every section runs in a worker thread under a PER-SECTION cap,
    budgeted for a COLD cache (driver-observed r4 costs). A section
    that exceeds its cap means the device client may be wedged or still
    mid-RPC: the harness emits the final JSON and EXITS immediately —
    it never runs further device work next to an abandoned thread (two
    concurrent relay clients wedge silently, CLAUDE.md);
  - results accumulate incrementally (the e2e loops push each log
    window into the result as it lands), so a section killed mid-way
    still contributes what it finished;
  - plausibility guards: throughput headlines are cross-checked against
    the dispatch-only ceiling and the section's own wall time; a
    violation ships the conservative wall-derived number plus a
    ``suspect`` flag instead of a fast fiction (the r4 774 img/s);
  - after the final JSON line the process exits via os._exit so a
    wedged device client can never hang process teardown.

Measures (BASELINE.json metric "512x512 images/sec/chip (train + slide
infer); subnets eval/hr"):
  - train img/s/chip: flagship supernet (ar50to101v2 + PSP head) train
    step at 512x512 crops, sandwich-sampled archs, via the K=8
    bounded-cycle dispatch (one unrolled program per sandwich cycle with
    per-position depth bounds — engine/train.py's steps_per_dispatch
    path). This is the headline.
  - slide img/s/chip: 1024x2048 slide inference (512x1024 crop, 341x683
    stride) at the R50 anchor, masked supernet with exact R50 bounds
    (production eval path), batch 4 (the relay is per-op-latency-bound;
    batching amortizes the ~0.65ms dispatch floor, +80% measured r3).
  - subnets_per_hour_fullval: depth-bucketed chunked-vmap population eval
    (engine/evaluate.py group_population + population_eval_steps) timed
    on-chip at whole-mode 1024x2048, weighted by bucket population and
    extrapolated to a 500-image Cityscapes-val sweep per subnet
    (reference test_supernet.py:268-292 per-subnet val-sweep semantics).
  - extras: steady-state e2e train loop (real packed loader + device
    augment), the same loop with the dataset device-cached (HBM
    resident, zero per-step host bytes), extracted-R50 serving cost.

GAIASEG_BENCH_SMOKE=1 runs the identical section flow on a tiny model /
tiny shapes on CPU (harness validation; numbers meaningless).
GAIASEG_BENCH_LEGACY=1 adds the round-1 MAX-masked single-program step.
"""
import faulthandler
import json
import os
import sys
import threading
import time

_DEADLINE_S = float(os.environ.get("GAIASEG_BENCH_DEADLINE", 1500))
_GRACE_S = float(os.environ.get("GAIASEG_BENCH_GRACE", 120))
_SMOKE = bool(int(os.environ.get("GAIASEG_BENCH_SMOKE", "0") or 0))


def log(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


class SectionRunner:
    """Runs named sections in daemon worker threads under a global
    deadline and per-section caps. A section that exceeds its cap sets
    ``hang_seen`` — the caller must then emit and EXIT (the abandoned
    thread may still be mid-RPC; running more device work beside it is
    the two-concurrent-clients wedge). Pure stdlib — unit-tested
    without jax."""

    def __init__(self, deadline_s: float, now=time.perf_counter,
                 grace_s: float = _GRACE_S):
        self._now = now
        self._t0 = now()
        self.deadline_s = deadline_s
        self.grace_s = grace_s
        self.skipped = {}   # name -> reason
        self.hang_seen = False

    def remaining(self) -> float:
        return self.deadline_s - (self._now() - self._t0)

    @staticmethod
    def _in_compile(t) -> bool:
        """True when thread ``t``'s current Python stack contains an XLA
        compile/lowering frame (e.g. backend_compile_and_load,
        _cached_compilation, jit lowering) — the signature that a cap
        overrun is a slow compile, not a wedged execution RPC."""
        fr = sys._current_frames().get(t.ident)
        while fr is not None:
            n = fr.f_code.co_name
            if "compile" in n or "lower" in n:
                return True
            fr = fr.f_back
        return False

    def run(self, name: str, cap_s: float, fn, core: bool = True,
            min_required_s: float = 30.0) -> bool:
        """Execute ``fn()`` under the cap. Returns True iff it finished.
        A section is refused (skipped) when the remaining budget cannot
        cover its known cold minimum; a STARTED section may overrun the
        deadline by ``grace_s``."""
        rem = self.remaining()
        if rem < min_required_s:
            self.skipped[name] = (f"deadline ({rem:.0f}s left < "
                                  f"{min_required_s:.0f}s cold minimum)")
            log(f"SKIP {name}: {self.skipped[name]}")
            return False
        if self.hang_seen:
            self.skipped[name] = "prior section hang"
            log(f"SKIP {name}: a prior section hung (device may be wedged)")
            return False
        cap = min(cap_s, rem + self.grace_s)
        box = {}

        def target():
            try:
                fn()
                box["ok"] = True
            except BaseException as e:  # noqa: BLE001 — recorded, not raised
                box["err"] = e

        t = threading.Thread(target=target, daemon=True,
                             name=f"bench-{name}")
        log(f"section {name} (cap {cap:.0f}s)...")
        t_start = self._now()
        t.start()
        t.join(cap)
        # Cap reached with the worker mid-COMPILE is not a wedge: relay
        # compiles look like hangs (the r3 "e2e hang" root cause —
        # diagnose by stack, CLAUDE.md), and abandoning one wastes the
        # whole section AND caches nothing for the next run. While the
        # worker's stack shows XLA compile/lowering frames, extend in
        # slices as long as the global deadline (+grace) allows; a true
        # wedge (no compile frame) still exits immediately, and the
        # deadline+150 backstop bounds a never-returning compile.
        while t.is_alive() and self.remaining() + self.grace_s > 60 \
                and self._in_compile(t):
            log(f"{name} still compiling at cap; extending "
                f"({self.remaining():.0f}s of global budget left)")
            t.join(min(30.0, self.remaining() + self.grace_s - 60))
        took = self._now() - t_start
        if t.is_alive():
            self.hang_seen = True
            self.skipped[name] = f"hang (> {cap:.0f}s cap)"
            log(f"HANG {name}: still running after {cap:.0f}s; "
                f"dumping stacks — emitting final JSON and exiting "
                f"(never run device work beside an abandoned client)")
            try:
                faulthandler.dump_traceback(file=sys.stderr)
            except Exception:
                pass
            return False
        if "err" in box:
            self.skipped[name] = f"error: {box['err']!r:.500}"
            log(f"FAIL {name} after {took:.1f}s: {box['err']!r}")
            return False
        log(f"done {name} in {took:.1f}s")
        return True


# RLock: _finish holds it across {set _FINISHED, emit final, exit} while
# _emit re-acquires inside — so a ticker iteration can never print a stale
# partial AFTER the final line (the driver parses the LAST line)
_PRINT_LOCK = threading.RLock()


def _emit(result: dict):
    with _PRINT_LOCK:
        print(json.dumps(result), flush=True)


def _emit_partial(runner, R, ctx, why=""):
    """Assemble + print the CURRENT (possibly partial) JSON line. Called
    after every section and from the ticker: the driver parses the last
    line on stdout, so an external kill at any moment still finds the
    freshest complete result."""
    try:
        result = _assemble(runner, R, ctx)
    except BaseException as e:  # noqa: BLE001 — emit SOMETHING no matter what
        log(f"assemble error ({why}): {e!r}")
        result = {
            "metric": "supernet_train_512x512_images_per_sec_per_chip",
            "value": R.get("train_ips_k8"), "unit": "img/s/chip",
            "vs_baseline": None,
            "extras": {"assemble_error": repr(e)[:500],
                       "skipped_sections": dict(runner.skipped)},
        }
    _emit(result)
    return result


def main():
    runner = SectionRunner(_DEADLINE_S)
    R = {}      # measured values, filled incrementally by sections
    ctx = {}    # live objects handed between sections

    # backstop: even if the coordinator logic itself wedges, a final JSON
    # line goes out before any external killer fires
    def _backstop():
        log("BACKSTOP fired: emitting partial JSON and exiting")
        _finish(runner, R, ctx, backstop=True)

    backstop = threading.Timer(_DEADLINE_S + 150, _backstop)
    backstop.daemon = True
    backstop.start()

    # ticker: re-emit the partial line every ~75s so even mid-section
    # progress (e.g. the e2e loops' per-window updates) is driver-visible
    def _tick():
        while True:
            time.sleep(75)
            with _PRINT_LOCK:
                if _FINISHED.is_set():
                    return
                _emit_partial(runner, R, ctx, why="ticker")

    ticker = threading.Thread(target=_tick, daemon=True, name="bench-tick")
    ticker.start()

    try:
        _run_sections(runner, R, ctx)
    except BaseException as e:  # noqa: BLE001
        log(f"coordinator error: {e!r}")
    _finish(runner, R, ctx)


_FINISHED = threading.Event()
_EMITTED = threading.Lock()


def _finish(runner, R, ctx, backstop=False):
    if not _EMITTED.acquire(blocking=False):
        return  # someone already finished
    with _PRINT_LOCK:  # bars the ticker from printing after the final line
        _FINISHED.set()
        _emit_partial(runner, R, ctx, why="final")
        log(f"emitted final JSON ({'backstop' if backstop else 'normal'} "
            f"path); exiting")
        os._exit(0)


def _run_sections(runner, R, ctx):
    # caps budgeted for a COLD persistent cache on the relay
    # (driver-observed r4: train_k8 1169.6s; relay loads ~1-10 min per
    # ~100MB program even warm — docs/PERF.md "relay cache-load reality")
    caps = {k: (240 if _SMOKE else v) for k, v in dict(
        setup=300, train_k8=1280, slide=420, population=600,
        e2e=700, e2e_cached=700, extracted=500, legacy=600).items()}
    # known cold minimums: refuse to start a section the remaining budget
    # cannot cover (r4 started e2e_cached with 364s left against its
    # ~572s executable load — a guaranteed-futile burn of the margin)
    mins = dict(setup=30, train_k8=240, slide=45, population=60,
                e2e=240, e2e_cached=240, extracted=90, legacy=60)
    hang_in = os.environ.get("GAIASEG_BENCH_TEST_HANG", "")

    def sect(name, fn, core=True):
        if hang_in == name:
            fn = lambda: time.sleep(10 ** 6)  # noqa: E731 — test hook
        ok = runner.run(name, caps[name], fn, core=core,
                        min_required_s=(5 if _SMOKE else mins[name]))
        if runner.hang_seen:
            # abandoned worker may still hold the device: emit + exit NOW
            _finish(runner, R, ctx)
        _emit_partial(runner, R, ctx, why=f"after {name}")
        return ok

    # ---- core sections ------------------------------------------------ #
    if not sect("setup", lambda: _setup(R, ctx)):
        return  # nothing can run without the model/sampler context
    sect("train_k8", lambda: _sec_train_k8(R, ctx))
    sect("slide", lambda: _sec_slide(R, ctx))
    sect("population", lambda: _sec_population(R, ctx, runner))
    # ---- extras (never at the expense of the core numbers) ------------ #
    # e2e_cached FIRST: the flagship production feed. Its scan-cycle
    # program shares train_k8's compile key, so the load is the smallest
    # of the extras — and its windows stream into R as they land.
    sect("e2e_cached", lambda: _sec_e2e(R, ctx, cached=True), core=False)
    sect("e2e", lambda: _sec_e2e(R, ctx, cached=False), core=False)
    sect("extracted", lambda: _sec_extracted(R, ctx), core=False)
    if os.environ.get("GAIASEG_BENCH_LEGACY"):
        sect("legacy", lambda: _sec_legacy(R, ctx), core=False)


# --------------------------------------------------------------------- #
# sections
# --------------------------------------------------------------------- #

def _fetch(out):
    """Force execution by pulling one scalar to the host.

    On the axon relay backend ``block_until_ready`` returns immediately;
    a device->host copy of the last output is the only reliable sync, and
    device-stream ordering makes it cover every enqueued step."""
    import jax
    import numpy as np
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


def _is_oom(e) -> bool:
    return "RESOURCE_EXHAUSTED" in str(e) or "memory" in str(e).lower()


def _setup(R, ctx):
    if _SMOKE:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from gaiaseg_tpu.archspace import build_model_sampler
    from gaiaseg_tpu.archspace.complexity import get_model_complexity_info
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.models.arch_util import (BoundsSwitch, cycle_dispatch,
                                              make_depth_bucketer,
                                              scan_dispatch)
    from gaiaseg_tpu.utils import Config
    import __graft_entry__ as ge

    model_cfg = ge._TINY if _SMOKE else ge._FLAGSHIP
    ctx["model_cfg"] = model_cfg
    ctx["model"] = build_segmentor(model_cfg)
    ctx["max_arch"] = model_max_arch(model_cfg)
    ctx["n_chips"] = jax.device_count()

    # bf16 peak for MFU (spec sheet; the relay measures ~183 TF/s for
    # v5e — MFU in the JSON uses the value recorded in peak_bf16_tflops)
    kind = str(jax.devices()[0].device_kind).lower()
    ctx["peak_tflops"] = next(
        (v for k, v in (("v5 lite", 197.0), ("v5e", 197.0),
                        ("v6 lite", 918.0), ("v6e", 918.0),
                        ("v5p", 459.0), ("v4", 275.0)) if k in kind), None)

    def gflops(arch, hw):
        """Analytic forward GFLOPs(=GMACs)/img at input (3, H, W)."""
        return get_model_complexity_info(
            model_cfg, arch, input_shape=(3,) + tuple(hw))["flops"] / 1e9

    ctx["gflops"] = gflops

    if _SMOKE:
        sampler_cfg = {"train_sampler": dict(
            type="concat", model_samplers=[
                dict(type="anchor", anchors=[{
                    "name": "MIN",
                    "arch.backbone.stem.width": 8,
                    "arch.backbone.body.width": [4, 8, 16, 16],
                    "arch.backbone.body.depth": [1, 1, 2, 1]}]),
                dict(type="repeat", times=1, model_sampler=dict(
                    type="range", key="arch.backbone.body.depth",
                    start=[1, 1, 2, 1], end=[2, 2, 3, 2],
                    step=[1, 1, 1, 1])),
            ])}
    else:
        sampler_cfg = Config.fromfile(
            "configs/_dynamic_/model_samplers/ar50to101v2.py")
    ctx["sampler_cfg"] = sampler_cfg
    sampler = build_model_sampler(sampler_cfg["train_sampler"])
    ctx["train_sampler"] = sampler
    bucketer = make_depth_bucketer(sampler, ctx["max_arch"])
    ctx["bucketer"] = bucketer
    k = 2 if _SMOKE else 8
    ctx["k"] = k
    metas = [sampler.sample() for _ in range(k)]  # one sandwich cycle
    ctx["metas"] = metas
    ctx["archs"] = [encode_arch(ctx["max_arch"], m) for m in metas]
    # the EXACT production cycle dispatch (shared enumeration with
    # engine/train.py and tools/warmup_cache.py). Default = SCAN mode
    # (lax.scan over one switch body, draw-order-independent compile
    # key); GAIASEG_BENCH_CYCLE=unroll times the per-position
    # static-bounds program instead (A/B).
    ctx["cycle_mode"] = os.environ.get("GAIASEG_BENCH_CYCLE", "scan")
    if ctx["cycle_mode"] == "scan":
        scan_cands, scan_ids = scan_dispatch(metas, bucketer)
        ctx["scan_cands"], ctx["scan_ids"] = scan_cands, scan_ids
        ctx["cycle_bseq"], ctx["cycle_bids"] = None, None
        ctx["arch_bounds"] = [scan_cands[i] for i in scan_ids] \
            if scan_cands else [bucketer(m) for m in metas]
    else:
        ctx["scan_cands"], ctx["scan_ids"] = None, None
        cycle_bseq, cycle_bids = cycle_dispatch(metas, bucketer)
        ctx["cycle_bseq"], ctx["cycle_bids"] = cycle_bseq, cycle_bids
        # effective per-position executed bounds (for the MFU arithmetic)
        ctx["arch_bounds"] = [
            b if not isinstance(b, BoundsSwitch) else b.candidates[i]
            for b, i in zip(cycle_bseq, cycle_bids)] \
            if cycle_bseq else [bucketer(m) for m in metas]

    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    schedule = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 1000)
    ctx["schedule"] = schedule
    ctx["tx"] = build_optimizer(
        dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=5e-4),
        dict(grad_clip=dict(max_norm=20)), schedule)
    ctx["crop"] = 64 if _SMOKE else 512
    ctx["full_hw"] = (128, 256) if _SMOKE else (1024, 2048)
    ctx["win"] = (64, 128) if _SMOKE else (512, 1024)
    ctx["stride"] = (43, 86) if _SMOKE else (341, 683)
    ctx["rng"] = jax.random.PRNGKey(0)
    R["n_chips"] = ctx["n_chips"]
    R["device"] = str(jax.devices()[0].device_kind)


def _sec_train_k8(R, ctx):
    """K=8 bounded-cycle dispatch: ONE unrolled program runs the whole
    sandwich cycle with per-position depth bounds — no per-step RPC, no
    executable-switch cost, depth-proportional compute. This is the
    engine/train.py production path at steps_per_dispatch=8.

    (A per-step bucket MIX is deliberately NOT timed: alternating
    compiled programs makes the relay re-upload executables — measured
    74-91 ms/step with multi-minute stalls — while each program alone
    averages 48 ms. NOTE train steps DONATE the state arg — always
    thread the returned state forward.)"""
    import jax
    import jax.numpy as jnp

    from gaiaseg_tpu.engine import create_train_state, make_multi_train_step

    model, tx = ctx["model"], ctx["tx"]
    k, archs = ctx["k"], ctx["archs"]
    rng, crop = ctx["rng"], ctx["crop"]
    n_chips = ctx["n_chips"]
    batch = 8 * n_chips
    while batch >= n_chips:
        try:
            img = jax.random.normal(rng, (batch, crop, crop, 3),
                                    jnp.bfloat16)
            gt = jax.random.randint(rng, (batch, crop, crop), 0, 19)
            log(f"init train state (batch {batch})...")
            state = create_train_state(model, rng, img, archs[0], tx)

            multi_step = make_multi_train_step(model, tx, k)
            arch_stack = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *archs)
            imgs_k = jnp.broadcast_to(img, (k,) + img.shape)
            gts_k = jnp.broadcast_to(gt, (k,) + gt.shape)
            rngs_k = jax.random.split(rng, k)
            scands = ctx["scan_cands"]
            if scands is not None:
                bseq = None
                bids_k = jnp.asarray(ctx["scan_ids"], jnp.int32)
            else:
                bseq = ctx["cycle_bseq"] or tuple(ctx["arch_bounds"])
                bids_k = jnp.asarray(ctx["cycle_bids"] or [0] * k,
                                     jnp.int32)
            cur = [state]
            # lrs as data, mirroring the production dispatch (values are
            # irrelevant to timing; PASSING them keeps the compiled
            # program identical to engine/train.py's)
            lrs_k = jnp.asarray([ctx["schedule"](i) for i in range(k)],
                                jnp.float32)

            # actives all-ones: REQUIRED data in scan mode so this times
            # the exact production program (the tail-padding cond is in
            # the compile key — engine/train.py make_multi_train_step)
            acts_k = None if scands is None \
                else jnp.ones((k,), jnp.int32)

            def step_k8(i, _state=cur):
                _state[0], _ = multi_step(_state[0], imgs_k, gts_k,
                                          arch_stack, rngs_k,
                                          bucket_ids=bids_k,
                                          bounds_seq=bseq,
                                          scan_candidates=scands,
                                          lrs=lrs_k, actives=acts_k)
                return _state[0].step

            log("timing train steps (K=8 bounded-cycle dispatch)...")
            dt_k8 = _time_steps(step_k8, 1, 3) / k
            ips = batch / dt_k8 / n_chips
            R["train_batch"] = batch
            R["train_ips_k8"] = ips
            log(f"train k8: {dt_k8 * 1e3:.1f} ms/step -> {ips:.2f} img/s")
            # free the training HBM before the big whole-mode sections
            del cur, state, img, gt, imgs_k, gts_k
            return
        except Exception as e:  # OOM -> halve the batch
            if _is_oom(e):
                log(f"batch {batch} OOM; halving")
                batch //= 2
                continue
            raise


def _ensure_eval_ctx(ctx):
    """Lazily build the shared eval objects (R50 meta/bounds, full-res
    images, forward_train-initialized variables) so the slide, population
    and extracted sections are independent — a hang in one never starves
    the others of context."""
    if "variables" in ctx:
        return
    import jax
    import jax.numpy as jnp

    from gaiaseg_tpu.models import encode_arch
    from gaiaseg_tpu.models.arch_util import exact_bounds

    model, max_arch, rng = ctx["model"], ctx["max_arch"], ctx["rng"]
    if _SMOKE:
        r50_meta = {"arch.backbone.stem.width": 8,
                    "arch.backbone.body.width": [4, 8, 16, 16],
                    "arch.backbone.body.depth": [1, 1, 2, 1]}
    else:
        r50_meta = {"arch.backbone.stem.width": 64,
                    "arch.backbone.body.width": [64, 128, 256, 512],
                    "arch.backbone.body.depth": [3, 4, 6, 3]}
    ctx["r50_meta"] = r50_meta
    ctx["r50"] = encode_arch(max_arch, r50_meta)
    ctx["r50_bounds"] = exact_bounds(max_arch, r50_meta)
    h, w = ctx["full_hw"]
    img1 = jax.random.normal(rng, (1, h, w, 3), jnp.bfloat16)
    ctx["img1"] = img1
    ctx["slide_batch"] = 4
    ctx["img4"] = jnp.concatenate([img1] * ctx["slide_batch"])
    # init through forward_train so aux-head params exist (extraction
    # needs the full tree); jit_init = one cached program, not eager ops
    from gaiaseg_tpu.models.arch_util import jit_init
    ctx["variables"] = jit_init(
        model, {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
        jnp.zeros((1, 64, 64), jnp.int32), ctx["r50"],
        method="forward_train")


def _sec_slide(R, ctx):
    """Slide inference at 1024x2048, R50 anchor, batch 4: the production
    eval path (masked supernet, exact R50 static bounds)."""
    import jax
    from functools import partial

    _ensure_eval_ctx(ctx)
    model = ctx["model"]

    @partial(jax.jit, static_argnames=("bounds",))
    def slide(v, im, arch, bounds=None):
        return model.apply(v, im, arch, ctx["win"], ctx["stride"], bounds,
                           method=model.slide_inference)

    slide_batch = ctx["slide_batch"]
    log(f"timing slide inference (masked supernet, exact R50 bounds, "
        f"batch {slide_batch})...")
    dt4 = _time_steps(
        lambda i: slide(ctx["variables"], ctx["img4"], ctx["r50"],
                        bounds=ctx["r50_bounds"]), 1, 2)
    R["slide_ips"] = 1.0 / (dt4 / slide_batch) / ctx["n_chips"]
    R["slide_batch"] = slide_batch
    log(f"slide (bounded, b{slide_batch}): {R['slide_ips']:.2f} img/s")


def _sec_population(R, ctx, runner):
    """Population eval: the 64-draw population is grouped by depth bucket
    (engine/evaluate.py group_population); each group is scored by a
    vmap-8 program at ITS OWN static bounds, so a subnet pays its
    bucket's depth-proportional cost instead of MAX. The per-(arch,img)
    cost, weighted by group size, extrapolates to the 500-image
    Cityscapes val sweep every real subnet ranking pays
    (reference test_supernet.py:268-292).

    Deadline-aware: buckets are measured cheapest-first with the global
    deadline checked between compiles; unmeasured buckets are
    extrapolated from the measured ms-per-GMAC (logged, so a partial
    run is visible — no silent truncation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaiaseg_tpu.engine.evaluate import (group_population,
                                             population_eval_steps)
    from gaiaseg_tpu.models import encode_arch
    from gaiaseg_tpu.models.arch_util import bounds_arch

    _ensure_eval_ctx(ctx)
    model, max_arch = ctx["model"], ctx["max_arch"]
    sampler, bucketer = ctx["train_sampler"], ctx["bucketer"]
    gflops, rng = ctx["gflops"], ctx["rng"]
    img1 = ctx["img1"]
    h, w = ctx["full_hw"]
    variables = ctx["variables"]

    pop_n = 16 if _SMOKE else 64
    pop_metas = [sampler.sample() for _ in range(pop_n)]
    n_img = 2  # val images per dispatch: batching amortizes ~20%
    img_p = jnp.concatenate([img1] * n_img)
    gt_p = jax.random.randint(rng, (n_img, h, w), 0, 19)
    chunk = 8
    while chunk >= 1:
        try:
            pop_step = population_eval_steps(model, model.num_classes)
            groups = group_population(pop_metas, bucketer)
            measured = []   # (n_subnets, per_arch_s, gf)
            deferred = []   # (n_subnets, gf)
            slowest = 0.0  # updated to the slowest measured bucket
            for g_bounds, idxs in groups:
                gf = gflops(bounds_arch(max_arch, g_bounds), (h, w))
                # adaptive margin: need room for ~2.5x the slowest bucket
                # so far (warm buckets are seconds; a cold compile sets
                # the bar) — a fixed 300s margin deferred everything when
                # train_k8 ate most of the 1500s deadline
                if measured and runner.remaining() < max(90.0,
                                                         2.5 * slowest):
                    deferred.append((len(idxs), gf))
                    continue
                t_b = time.perf_counter()
                # pad the stack to a fixed vmap width: one program per
                # bucket regardless of group size (padding cost charged
                # to the measurement -> conservative)
                sel = (idxs * chunk)[:chunk] if len(idxs) < chunk \
                    else idxs[:chunk]
                stack = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[encode_arch(max_arch, pop_metas[i]) for i in sel])
                dt_g = _time_steps(
                    lambda i: pop_step(variables, img_p, gt_p, stack,
                                       bounds=g_bounds), 1, 2)
                per_arch = dt_g / (chunk * n_img)
                measured.append((len(idxs), per_arch, gf))
                slowest = max(slowest, time.perf_counter() - t_b)
                log(f"population bucket {g_bounds.body_depth} x{len(idxs)}"
                    f": {per_arch * 1e3:.2f} ms/(arch*img)")
            if deferred:
                # extrapolate deferred buckets from measured ms/GMAC
                ms_per_gf = (sum(n * s for n, s, _ in measured)
                             / sum(n * g for n, _, g in measured))
                log(f"population: extrapolating {len(deferred)} "
                    f"bucket(s) covering "
                    f"{sum(n for n, _ in deferred)} subnets at "
                    f"{ms_per_gf * 1e6:.2f} us/GMAC (deadline)")
                measured += [(n, ms_per_gf * g, g) for n, g in deferred]
            weighted_s = sum(n * s for n, s, _ in measured) / pop_n
            weighted_gf = sum(n * g for n, _, g in measured) / pop_n
            R["pop_per_arch_img"] = weighted_s
            R["pop_gf_weighted"] = weighted_gf
            R["pop_chunk"] = chunk
            R["pop_buckets_measured"] = len(measured) - len(deferred)
            R["pop_buckets_extrapolated"] = len(deferred)
            n_val = 500
            R["subnets_per_hour"] = 3600.0 / (weighted_s * n_val) \
                * ctx["n_chips"]
            log(f"population weighted: {weighted_s * 1e3:.2f} ms/(arch*img)"
                f" -> {R['subnets_per_hour']:.1f} subnets/hr "
                f"({n_val}-img val)")
            return
        except Exception as e:
            if _is_oom(e):
                log(f"population chunk {chunk} OOM; halving")
                chunk //= 2
                continue
            raise


def _e2e_cfg(ctx, pack_path, cached: bool):
    k = ctx["k"]
    # 32 cycles: with log windows of 2k iters that is 16 windows, so the
    # interior-window median is taken over >=11 windows untouched by the
    # one-time relay executable loads (~1-10 min per ~100MB program,
    # warm or cold — docs/PERF.md "relay cache-load reality"). At the
    # old 8 cycles the loads polluted BOTH interior windows and the
    # "steady state" read ~24 img/s when the true figure is ~5x that;
    # the added compute is ~15-20s against the fixed load cost.
    iters = 32 * k if not _SMOKE else 2 * k
    train = {"type": "PackedDataset", "path": pack_path,
             "classes": [f"c{i}" for i in range(19)],
             # full production augment chain — crop-trial histograms and
             # the photometric chain cost ~5ms/batch on-chip (was 298ms
             # pre-r3), so the e2e figure can afford the honest pipeline
             "pipeline": [
                 dict(type="RandomCrop",
                      crop_size=(ctx["crop"], ctx["crop"]),
                      cat_max_ratio=0.75),
                 dict(type="RandomFlip", prob=0.5),
                 dict(type="PhotoMetricDistortion"),
                 dict(type="Normalize",
                      mean=[123.675, 116.28, 103.53],
                      std=[58.395, 57.12, 57.375]),
             ]}
    if cached:
        train["device_cache"] = True
    return {
        "model": ctx["model_cfg"],
        "data": {"samples_per_gpu": ctx["R_train_batch"] // ctx["n_chips"],
                 "train": train},
        "train_sampler": ctx["sampler_cfg"]["train_sampler"],
        "optimizer": dict(type="SGD", lr=0.01, momentum=0.9,
                          weight_decay=5e-4),
        "optimizer_config": dict(grad_clip=dict(max_norm=20)),
        "lr_config": dict(policy="poly", power=0.9),
        "runner": dict(max_iters=iters),
        "steps_per_dispatch": k,
        "log_config": dict(interval=2 * k),
        # BN running stats are consumed only by eval/ckpt — both disabled
        # here — so the loop never needs the full-variant refresh step:
        # the hot loop stays inside ONE compiled program (loss logging
        # reads the scan cycle's own stacked outputs). On the relay the
        # 56MB boundary-step executable alternating with the scan program
        # cost the cached e2e ~25% of its throughput.
        "bn_refresh_interval": 10 ** 9,
        # calibrate_bn=0: the stale-BN auto-calibration (engine/train.py)
        # would otherwise compile + run an extra program at the final
        # checkpoint; this loop never consumes running stats
        "checkpoint_config": dict(interval=10 ** 9, calibrate_bn=0),
        "evaluation": dict(interval=10 ** 9, calibrate_bn=0),
    }


def _sec_e2e(R, ctx, cached: bool):
    """Steady-state e2e train throughput: drives the REAL train loop
    (engine/train.py: packed-dataset reads, device augment, shard_batch,
    bounded-cycle dispatch) and reads the steady-state img/s the loop
    itself logs — the number a production user sees (reference §3.1 hot
    loop with DataLoader workers overlapped). ``cached=True`` stages the
    dataset in HBM first (data/device_cache.py): steady state then has
    ZERO per-step host->device bytes."""
    import numpy as np

    from gaiaseg_tpu.data.datasets import SyntheticDataset
    from gaiaseg_tpu.data.packed import pack_dataset
    from gaiaseg_tpu.engine import train_segmentor
    from gaiaseg_tpu.models import build_segmentor
    import tempfile

    ctx["R_train_batch"] = R.get("train_batch", 8 * ctx["n_chips"])
    crop = ctx["crop"]
    pack_path = os.path.join(tempfile.gettempdir(),
                             f"gaiaseg_bench_e2e_{crop}.gsegpack")
    if not os.path.exists(pack_path):
        log(f"packing 64-image synthetic {crop}x{crop} dataset...")
        pack_dataset(SyntheticDataset(length=64, size=(crop, crop),
                                      num_classes=19, cells=8),
                     pack_path)
    cfg = _e2e_cfg(ctx, pack_path, cached)
    label = "device-cached" if cached else "packed loader"
    key = "train_ips_e2e_cached" if cached else "train_ips_e2e"
    wkey = key + "_windows"
    R[wkey] = []

    def _on_window(row):
        # stream each sync-to-sync window into R as it lands: the ticker
        # re-emits the partial JSON, so even a mid-section kill leaves
        # the windows measured so far in the driver's tail
        R[wkey].append(round(float(row["img_per_sec"]), 2))

    log(f"timing e2e train loop ({cfg['runner']['max_iters']} iters, "
        f"{label})...")
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as wd:
        _, hist = train_segmentor(
            build_segmentor(ctx["model_cfg"]), cfg, work_dir=wd,
            window_cb=_on_window)
    R[key + "_wall_s"] = round(time.perf_counter() - t0, 1)
    R[key + "_iters"] = int(cfg["runner"]["max_iters"])
    rows = hist.get("loss") or []
    if rows:
        # steady state: median of the INTERIOR windows. The first window
        # holds compile/warmup; the last absorbs the one-time final-state
        # fetch for the end-of-run checkpoint. Median, not mean: the
        # uploader thread and the device alternate as the bottleneck, so
        # windows are bimodal and a mean over 4 of them is noise.
        tail = rows[1:-1] if len(rows) > 2 else rows
        R[key] = float(np.median([r["img_per_sec"] for r in tail]))
        log(f"e2e train ({label}): {R[key]:.2f} img/s (windows: "
            f"{[round(r['img_per_sec'], 1) for r in rows]})")


def _sec_extracted(R, ctx):
    """Extracted (deployed) R50 subnet slide inference: true serving
    cost after engine/extract.py pytree slicing."""
    import jax

    from gaiaseg_tpu.engine.extract import extract_subnet
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)

    _ensure_eval_ctx(ctx)
    sub_cfg, sub_vars, _ = extract_subnet(
        ctx["model_cfg"], ctx["variables"], ctx["r50_meta"])
    sub_model = build_segmentor(sub_cfg)
    sub_arch = encode_arch(model_max_arch(sub_cfg))

    @jax.jit
    def slide_sub(v, im):
        return sub_model.apply(v, im, sub_arch, ctx["win"], ctx["stride"],
                               method=sub_model.slide_inference)

    log("timing extracted-R50 slide inference...")
    sb = ctx["slide_batch"]
    dt4 = _time_steps(lambda i: slide_sub(sub_vars, ctx["img4"]), 1, 2)
    R["ext_slide_ips"] = 1.0 / (dt4 / sb) / ctx["n_chips"]
    log(f"extracted slide: b{sb} {R['ext_slide_ips']:.2f} img/s")


def _sec_legacy(R, ctx):
    """Round-1 parity: MAX-masked single-program fast step."""
    import jax
    import jax.numpy as jnp

    from gaiaseg_tpu.engine import create_train_state, make_train_step

    model, tx, rng = ctx["model"], ctx["tx"], ctx["rng"]
    archs, crop = ctx["archs"], ctx["crop"]
    batch = R.get("train_batch", 8 * ctx["n_chips"])
    img = jax.random.normal(rng, (batch, crop, crop, 3), jnp.bfloat16)
    gt = jax.random.randint(rng, (batch, crop, crop), 0, 19)
    state = create_train_state(model, rng, img, archs[0], tx)
    fast = make_train_step(model, tx, update_stats=False, with_logs=False)
    cur = [state]

    def step(i, _state=cur):
        _state[0], _ = fast(_state[0], img, gt, archs[i % len(archs)], rng)
        return _state[0].step

    log("timing train steps (MAX-masked single program)...")
    dt = _time_steps(step, 2, 8)
    R["train_ips_max"] = batch / dt / ctx["n_chips"]
    log(f"train: {dt * 1e3:.1f} ms/step -> {R['train_ips_max']:.2f} img/s")


# --------------------------------------------------------------------- #
# final JSON
# --------------------------------------------------------------------- #

def _guarded_ips(R, key, ceiling, suspect):
    """Plausibility-guarded e2e throughput: the interior-window median
    must not exceed the dispatch-only ceiling (windows exclude host feed
    stalls only, never device time — anything above the ceiling is a
    broken clock, like the r4 774 img/s). On violation, report the
    conservative wall-time-derived figure (iters*batch/section-wall,
    compile included) and record the violation in ``suspect``."""
    import numpy as np

    win = R.get(key)
    wins = R.get(key + "_windows") or []
    if win is None and len(wins) >= 2:
        # mid-section partial: median of all but the compile window
        win = float(np.median(wins[1:]))
    if win is None:
        return None
    # the train loop logs GLOBAL img/s (log_interval * global batch / dt)
    # while the ceiling (train_ips_k8) and the headline are per-chip —
    # normalize before comparing, or a correct multi-chip number would be
    # flagged suspect (identity at n_chips=1, the driver's case)
    nc = R.get("n_chips") or 1
    win = win / nc
    wall = R.get(key + "_wall_s")
    iters = R.get(key + "_iters")
    batch = R.get("train_batch")
    wall_ips = (iters * batch / wall / nc) \
        if (wall and iters and batch) else None
    if ceiling and win > 1.05 * ceiling:
        suspect[key] = (f"window median {win:.1f} img/s exceeds the "
                        f"{ceiling:.1f} dispatch-only ceiling; reporting "
                        f"wall-derived value")
        return wall_ips  # None when the section never finished: no number
        # is better than a fabricated one
    return win


def _assemble(runner, R, ctx):
    import numpy as np

    def rnd(v, n=3):
        return None if v is None else round(float(v), n)

    peak = ctx.get("peak_tflops")

    def mfu(tf):
        return round(tf / peak, 4) if (tf is not None and peak) else None

    # ---- analytic-FLOPs MFU accounting (guards: any section may have
    # been skipped). EXECUTED = what the bounded masked program computes
    # (the bound's static shapes); NOMINAL = what the sampled subnet
    # needs (reference count_flops semantics). FLOPs convention: the
    # analytic counter reports MACs (the mmcv convention the reference's
    # count_flops numbers use); hardware peak counts mul+add separately,
    # so TF/s and MFU apply 2x. A train step is ~3x the forward (fwd +
    # both backward passes). All per-chip.
    exec_c = nom_c = train_tf = train_tf_nom = None
    slide_gf = slide_tf = ext_tf = pop_tf = None
    try:
        gflops = ctx.get("gflops")
        if gflops is not None and ctx.get("arch_bounds"):
            from gaiaseg_tpu.models.arch_util import (bounds_arch,
                                                      canonical_arch)
            max_arch = ctx["max_arch"]
            crop = (ctx["crop"], ctx["crop"])
            exec_c = float(np.mean([gflops(bounds_arch(max_arch, b), crop)
                                    for b in ctx["arch_bounds"]]))
            nom_c = float(np.mean([gflops(canonical_arch(max_arch, m), crop)
                                   for m in ctx["metas"]]))
            ips = R.get("train_ips_k8")
            if ips:
                train_tf = 3 * 2 * exec_c * ips / 1e3
                train_tf_nom = 3 * 2 * nom_c * ips / 1e3
            if ctx.get("r50_bounds") is not None:
                # slide grid at (1024,2048)/(512,1024)win/(341,683)stride
                # is NINE windows (3x3) — see CLAUDE.md
                n_win = 9
                slide_gf = n_win * gflops(
                    bounds_arch(max_arch, ctx["r50_bounds"]), ctx["win"])
                slide_gf_nom = n_win * gflops(
                    canonical_arch(max_arch, ctx["r50_meta"]), ctx["win"])
                if R.get("slide_ips"):
                    slide_tf = 2 * slide_gf * R["slide_ips"] / 1e3
                if R.get("ext_slide_ips"):
                    ext_tf = 2 * slide_gf_nom * R["ext_slide_ips"] / 1e3
        if R.get("pop_per_arch_img") and R.get("pop_gf_weighted"):
            pop_tf = 2 * R["pop_gf_weighted"] \
                / (R["pop_per_arch_img"] * 1e3)
    except Exception as e:  # never lose the JSON to MFU arithmetic
        log(f"MFU accounting failed: {e!r}")

    sph = R.get("subnets_per_hour")
    suspect = {}
    ceiling = R.get("train_ips_k8")
    e2e_ips = _guarded_ips(R, "train_ips_e2e", ceiling, suspect)
    e2e_cached_ips = _guarded_ips(R, "train_ips_e2e_cached", ceiling,
                                  suspect)
    return {
        "metric": "supernet_train_512x512_images_per_sec_per_chip",
        "value": rnd(R.get("train_ips_k8") or R.get("train_ips_max")),
        "unit": "img/s/chip",
        # the reference publishes NO benchmark numbers (BASELINE.md:
        # README has none, BASELINE.json published={}), so the only
        # quantified target is the >=500 subnets/hr north star —
        # vs_baseline is the measured subnets/hr against that target.
        "vs_baseline": rnd(sph / 500.0) if sph else None,
        "baseline_note": "ratio vs the >=500 subnets/hr target "
            "(BASELINE.md north star); reference publishes no throughput",
        "extras": {
            "train_batch": R.get("train_batch"),
            "train_img_per_sec_bounded_cycle": rnd(R.get("train_ips_k8")),
            "train_img_per_sec_max_masked": rnd(R.get("train_ips_max")),
            "train_img_per_sec_e2e": rnd(e2e_ips),
            "train_img_per_sec_e2e_device_cache": rnd(e2e_cached_ips),
            "e2e_windows": R.get("train_ips_e2e_windows") or None,
            "e2e_cached_windows":
                R.get("train_ips_e2e_cached_windows") or None,
            "e2e_wall_s": R.get("train_ips_e2e_wall_s"),
            "e2e_cached_wall_s": R.get("train_ips_e2e_cached_wall_s"),
            "suspect": suspect or None,
            "slide_batch": R.get("slide_batch"),
            "slide_1024x2048_img_per_sec_per_chip":
                rnd(R.get("slide_ips"), 4),
            "extracted_r50_slide_img_per_sec_per_chip":
                rnd(R.get("ext_slide_ips"), 4),
            "subnets_per_hour_fullval_500img": rnd(sph, 1),
            "population_vmap_chunk": R.get("pop_chunk"),
            "population_ms_per_arch_img":
                rnd(R.get("pop_per_arch_img", 0) * 1e3
                    if R.get("pop_per_arch_img") else None),
            "population_buckets_measured": R.get("pop_buckets_measured"),
            "population_buckets_extrapolated":
                R.get("pop_buckets_extrapolated"),
            "n_chips": R.get("n_chips"),
            "device": R.get("device"),
            "peak_bf16_tflops": peak,
            "flops_convention": "counter reports MACs (mmcv/reference "
                "convention); TF/s and MFU use 2*MACs, train 3x forward",
            "train_gmacs_per_img_executed": rnd(exec_c, 1),
            "train_gmacs_per_img_nominal": rnd(nom_c, 1),
            "train_tflops_per_sec": rnd(train_tf, 1),
            "train_mfu_executed": mfu(train_tf),
            "train_mfu_nominal": mfu(train_tf_nom),
            "slide_gmacs_per_img_executed": rnd(slide_gf, 1),
            "slide_tflops_per_sec": rnd(slide_tf, 1),
            "slide_mfu_executed": mfu(slide_tf),
            "extracted_slide_tflops_per_sec": rnd(ext_tf, 1),
            "extracted_slide_mfu": mfu(ext_tf),
            "population_tflops_per_sec": rnd(pop_tf, 1),
            "population_mfu": mfu(pop_tf),
            "deadline_s": _DEADLINE_S,
            "elapsed_s": round(time.perf_counter() - _T0, 1),
            "smoke": _SMOKE or None,
            "skipped_sections": dict(runner.skipped) or None,
        },
    }


if __name__ == "__main__":
    main()
