#!/usr/bin/env bash
# Production soak test (VERDICT r3 ask #3): run the REAL train CLI on-chip
# for 1536 iters at production shapes (512x512, batch 8, K=8 dispatch,
# device-cached feed, checkpoint every 512, cross-arch eval every 768),
# SIGKILL it mid-run, resume from the latest checkpoint, and reach
# max_iters. Proves the production loop neither wedges nor loses state —
# the property the reference's IterBasedRunner + resume_from provides.
#
# Usage: scripts/soak_test.sh [WORK_DIR] [KILL_AFTER_SECONDS]
set -u
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/gaiaseg_soak}
KILL_AFTER=${2:-480}
PACK=/tmp/gaiaseg_soak_512.gsegpack
CFG=configs/local_examples/train_supernet/soak_synthetic_512.py

if [ ! -f "$PACK" ]; then
  echo "== packing 64-image synthetic 512x512 dataset -> $PACK"
  python - <<'EOF'
from gaiaseg_tpu.data.datasets import SyntheticDataset
from gaiaseg_tpu.data.packed import pack_dataset
pack_dataset(SyntheticDataset(length=64, size=(512, 512), num_classes=19,
                              cells=8), "/tmp/gaiaseg_soak_512.gsegpack")
EOF
fi

mkdir -p "$WORK"
echo "== phase 1: train, SIGKILL shortly after the first checkpoint lands"
python tools/train_supernet.py "$CFG" --work-dir "$WORK" \
  > "$WORK/phase1.log" 2>&1 &
PID=$!
(
  # kill right after the FIRST periodic checkpoint appears (mid-run by
  # construction; checkpoints land on cycle boundaries, e.g. iter_520,
  # never exactly iter_512). The KILL_AFTER fallback only ARMS once the
  # run is actually stepping (first "iter " log line): the relay charges
  # ~8-10 min of program (re)loading at the head of any fresh process
  # (docs/PERF.md), and counting that against the fallback killed the
  # run before its first checkpoint could exist.
  for _ in $(seq 1800); do
    grep -q "iter " "$WORK/phase1.log" 2>/dev/null && break
    ls "$WORK"/iter_*.ckpt >/dev/null 2>&1 && break
    kill -0 "$PID" 2>/dev/null || exit 0
    sleep 1
  done
  for _ in $(seq "$KILL_AFTER"); do
    ls "$WORK"/iter_*.ckpt >/dev/null 2>&1 && break
    kill -0 "$PID" 2>/dev/null || exit 0
    sleep 1
  done
  sleep 5
  if kill -0 "$PID" 2>/dev/null; then
    echo "== killing trainer (pid $PID) mid-run"
    kill -9 "$PID"
  fi
) &
KILLER=$!
wait "$PID"
RC1=$?
kill "$KILLER" 2>/dev/null
echo "== phase 1 exited rc=$RC1 (137 = killed mid-run, 0 = finished early)"
tail -n 5 "$WORK/phase1.log"
ls -la "$WORK"/*.ckpt 2>/dev/null || { echo "NO CHECKPOINT — FAIL"; exit 1; }

echo "== phase 2: resume (auto_resume) to max_iters"
timeout 3000 python tools/train_supernet.py "$CFG" --work-dir "$WORK" \
  > "$WORK/phase2.log" 2>&1
RC2=$?
echo "== phase 2 exited rc=$RC2"
tail -n 8 "$WORK/phase2.log"

python - "$WORK" <<'EOF'
import json, sys
w = sys.argv[1]
h = json.load(open(f"{w}/history.json"))
rows = h["loss"]
assert rows, "no loss history"
last = rows[-1]["iter"]
ips = [round(r["img_per_sec"], 1) for r in rows]
print(f"final iter: {last}; img/s per window: {ips}")
assert last >= 1536, f"did not reach max_iters (stopped at {last})"
evals = h.get("eval") or []
print(f"eval entries: {[e.get('iter') for e in evals]}")
print("SOAK PASS")
EOF
