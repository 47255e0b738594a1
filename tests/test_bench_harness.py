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


def test_hang_converts_to_skip_and_extras_are_protected():
    r = bench.SectionRunner(deadline_s=100)
    assert r.run("sleepy", 0.2, lambda: time.sleep(60)) is False
    assert r.hang_seen
    assert "hang" in r.skipped["sleepy"]
    # extras are skipped once a hang was seen (device may be wedged)...
    assert r.run("extra", 5, lambda: None, core=False) is False
    assert r.skipped["extra"] == "prior section hang"
    # ...but core sections still get their chance
    assert r.run("core", 5, lambda: None, core=True) is True


def test_deadline_skips_sections():
    clock = _FastClock()
    r = bench.SectionRunner(deadline_s=100, now=clock)
    clock.t = 95.0  # 5s left < min_required_s
    assert r.run("late", 50, lambda: None) is False
    assert "deadline" in r.skipped["late"]


def test_section_cap_clamped_to_deadline():
    clock = _FastClock()
    r = bench.SectionRunner(deadline_s=100, now=clock)
    # a hanging section with a huge cap must still be abandoned at the
    # global deadline, not at the cap. Real clock drives the join; the
    # fake clock only reports remaining()
    clock.t = 99.5
    t0 = time.perf_counter()
    r2 = bench.SectionRunner(deadline_s=0.7)
    assert r2.run("hog", 9999, lambda: time.sleep(60),
                  min_required_s=0.0) is False
    assert time.perf_counter() - t0 < 5.0
    assert r.remaining() == 0.5


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
