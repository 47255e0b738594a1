"""bench.py harness: the driver contract is ONE JSON line, always.

Round 3 shipped rc=124 (a section hung, nothing was printed). These
tests pin the SectionRunner semantics that make that impossible: hangs
convert to logged skips, errors are recorded not raised, the deadline
short-circuits, and _assemble produces a valid result dict from ANY
subset of measurements (including none)."""
import time

import bench


class _FastClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_section_ok_and_error_and_order():
    r = bench.SectionRunner(deadline_s=100)
    ran = []
    assert r.run("a", 5, lambda: ran.append("a")) is True
    assert r.run("b", 5, lambda: 1 / 0) is False
    assert "ZeroDivisionError" in r.skipped["b"]
    assert not r.hang_seen
    assert ran == ["a"]


def test_hang_blocks_everything_after():
    # after a hang the abandoned thread may still be mid-RPC on the
    # device: NO further section (core included) may run beside it —
    # the coordinator emits the final JSON and exits instead
    r = bench.SectionRunner(deadline_s=100)
    assert r.run("sleepy", 0.2, lambda: time.sleep(60)) is False
    assert r.hang_seen
    assert "hang" in r.skipped["sleepy"]
    assert r.run("extra", 5, lambda: None, core=False) is False
    assert r.skipped["extra"] == "prior section hang"
    assert r.run("core", 5, lambda: None, core=True) is False
    assert r.skipped["core"] == "prior section hang"


def test_cap_extends_while_worker_is_compiling():
    # a cap overrun with the worker inside a compile/lowering frame is a
    # slow relay compile, not a wedge (the r3 lesson): the runner keeps
    # waiting within the global deadline instead of abandoning the
    # section — abandoning caches nothing and nulls the headline
    def backend_compile_and_load():  # frame name carries 'compile'
        time.sleep(1.0)

    r = bench.SectionRunner(deadline_s=100)
    assert r.run("k8", 0.2, backend_compile_and_load) is True
    assert not r.hang_seen
    assert "k8" not in r.skipped


def test_cap_extension_stops_at_global_deadline():
    # a never-returning compile must still be bounded by the deadline
    def backend_compile_and_load():
        time.sleep(60)

    r = bench.SectionRunner(deadline_s=0.5, grace_s=0.2)
    t0 = time.monotonic()
    assert r.run("k8", 0.2, backend_compile_and_load,
                 min_required_s=0) is False
    assert time.monotonic() - t0 < 10
    assert r.hang_seen


def test_plain_sleep_at_cap_is_still_a_hang():
    # no compile frame in the stack -> the original wedge protocol
    r = bench.SectionRunner(deadline_s=100)
    assert r.run("sleepy", 0.2, lambda: time.sleep(60)) is False
    assert r.hang_seen


def test_deadline_refuses_sections_below_cold_minimum():
    clock = _FastClock()
    r = bench.SectionRunner(deadline_s=1000, now=clock)
    clock.t = 500.0  # 500s left
    ran = []
    # a section whose known cold minimum exceeds the remaining budget is
    # refused outright (r4 burned its margin starting e2e_cached with
    # 364s left against a ~572s executable load)
    assert r.run("futile", 900, ran.append, min_required_s=572) is False
    assert "cold minimum" in r.skipped["futile"]
    assert ran == []
    # one that fits still runs
    assert r.run("fits", 900, lambda: ran.append(1),
                 min_required_s=400) is True
    assert ran == [1]


def test_section_cap_clamped_to_deadline_plus_grace():
    clock = _FastClock()
    r = bench.SectionRunner(deadline_s=100, now=clock)
    clock.t = 99.5
    assert r.remaining() == 0.5
    # a hanging section with a huge cap is abandoned at deadline+grace,
    # not at the cap. Real clock drives the join.
    t0 = time.perf_counter()
    r2 = bench.SectionRunner(deadline_s=0.4, grace_s=0.3)
    assert r2.run("hog", 9999, lambda: time.sleep(60),
                  min_required_s=0.0) is False
    assert time.perf_counter() - t0 < 5.0


def test_assemble_with_no_measurements_is_valid_json():
    import json
    r = bench.SectionRunner(deadline_s=1)
    r.skipped["setup"] = "error: boom"
    out = bench._assemble(r, {}, {})
    s = json.dumps(out)  # must serialize
    assert out["metric"] == "supernet_train_512x512_images_per_sec_per_chip"
    assert out["value"] is None
    assert out["vs_baseline"] is None
    assert out["extras"]["skipped_sections"] == {"setup": "error: boom"}
    assert "train_img_per_sec_e2e" in out["extras"]
    assert s


def test_guard_rejects_impossible_e2e_and_reports_wall_derived():
    # the exact r4 driver failure: window median 774 img/s against a
    # 204 img/s dispatch-only ceiling. The guard must ship the
    # conservative wall-derived number and flag the violation.
    r = bench.SectionRunner(deadline_s=1)
    R = {"train_ips_k8": 204.1, "train_batch": 8,
         "train_ips_e2e": 774.06,
         "train_ips_e2e_wall_s": 512.1, "train_ips_e2e_iters": 256}
    out = bench._assemble(r, R, {})
    ex = out["extras"]
    wall_derived = 256 * 8 / 512.1
    assert abs(ex["train_img_per_sec_e2e"] - wall_derived) < 0.01
    assert "train_ips_e2e" in ex["suspect"]
    assert "ceiling" in ex["suspect"]["train_ips_e2e"]


def test_guard_passes_plausible_e2e_untouched():
    r = bench.SectionRunner(deadline_s=1)
    R = {"train_ips_k8": 204.1, "train_batch": 8,
         "train_ips_e2e_cached": 146.3,
         "train_ips_e2e_cached_wall_s": 300.0,
         "train_ips_e2e_cached_iters": 256}
    out = bench._assemble(r, R, {})
    ex = out["extras"]
    assert ex["train_img_per_sec_e2e_device_cache"] == 146.3
    assert ex["suspect"] is None


def test_mid_section_windows_give_partial_e2e_number():
    # a kill mid-e2e: only streamed windows exist (no final median, no
    # wall time). The assemble must still derive a number from the
    # interior windows so the driver's tail carries evidence.
    r = bench.SectionRunner(deadline_s=1)
    R = {"train_ips_k8": 204.1, "train_batch": 8,
         "train_ips_e2e_cached_windows": [0.5, 140.0, 150.0, 145.0]}
    out = bench._assemble(r, R, {})
    ex = out["extras"]
    assert ex["train_img_per_sec_e2e_device_cache"] == 145.0
    assert ex["e2e_cached_windows"] == [0.5, 140.0, 150.0, 145.0]


def test_assemble_partial_core_results():
    r = bench.SectionRunner(deadline_s=1)
    R = {"train_ips_k8": 203.9, "train_batch": 8,
         "subnets_per_hour": 743.0, "pop_per_arch_img": 0.0097,
         "pop_gf_weighted": 500.0}
    out = bench._assemble(r, R, {})
    assert out["value"] == 203.9
    assert out["vs_baseline"] == round(743.0 / 500.0, 3)
    ex = out["extras"]
    assert ex["train_img_per_sec_bounded_cycle"] == 203.9
    assert ex["subnets_per_hour_fullval_500img"] == 743.0
    assert ex["slide_1024x2048_img_per_sec_per_chip"] is None
    # population TF/s works from R alone (no ctx): 2*500/(0.0097*1e3)
    assert abs(ex["population_tflops_per_sec"] - 103.1) < 0.2
