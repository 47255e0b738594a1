"""Restartable-sweep log (SURVEY §5: a killed sweep must lose nothing —
reference finetune_supernet.py:358 barriers per subnet; count_flops.py
keeps per-shard partials)."""
import json

from gaiaseg_tpu.utils.sweep import SweepLog, sweep_key


M1 = {"name": "R50", "arch.backbone.body.depth": [3, 4, 6, 3]}
M2 = {"name": "R77", "arch.backbone.body.depth": [3, 5, 13, 3]}
M3 = {"arch.backbone.body.depth": [1, 1, 2, 1]}


def test_record_and_restart_skip(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = SweepLog(path)
    assert not log.done(M1)
    log.record(M1, {"mIoU": 0.5})
    log.record(M2, {"mIoU": 0.6})

    # simulate a crash + restart: a fresh SweepLog over the same file
    log2 = SweepLog(path)
    assert log2.done(M1) and log2.done(M2) and not log2.done(M3)
    assert log2.get(M1) == {"mIoU": 0.5}
    log2.record(M3, {"mIoU": 0.7})
    assert len(SweepLog(path)) == 3


def test_key_ignores_metric_annotations():
    annotated = dict(M1, metric={"flops": {"flops": 1.0}})
    assert sweep_key(annotated) == sweep_key(M1)


def test_torn_tail_line_tolerated(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = SweepLog(path)
    log.record(M1, {"mIoU": 0.5})
    with open(path, "a") as f:
        f.write('{"key": "deadbeef", "val')  # crash mid-write
    log2 = SweepLog(path)
    assert log2.done(M1) and len(log2) == 1
    # appending after the torn line still yields parseable records
    log2.record(M2, {"mIoU": 0.6})
    lines = [ln for ln in open(path).read().splitlines() if ln]
    assert json.loads(lines[-1])["value"] == {"mIoU": 0.6}


def test_annotated_rows(tmp_path):
    log = SweepLog(str(tmp_path / "m.jsonl"))
    log.record(M1, {"mIoU": 0.5})
    rows = log.annotated([dict(M1), dict(M2)], "metric")
    assert len(rows) == 1 and rows[0]["metric"]["metric"] == {"mIoU": 0.5}
