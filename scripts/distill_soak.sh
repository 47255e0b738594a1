#!/usr/bin/env bash
# Distillation soak (VERDICT r4 task 6): run the DynamicDistiller hot
# loop on-chip for >=512 iters at flagship scale (BEiT-base-shaped
# teacher + UPer teacher head, 512x512 batch 8, K=8 scan cycle,
# device-cached feed) and a student-only control of the same length,
# then check:
#   1. distill_loss_seg + pairwise_loss_seg fall across the run;
#   2. the student's cross-arch anchor mIoU does not collapse vs the
#      student-only control (reported side by side, honestly — with a
#      fresh-init teacher the distill terms are regularization noise,
#      so a small gap is expected and printed, not hidden).
# Pass a real converted teacher with TEACHER=/path/to/beit.pth to turn
# this into the reference's true distillation run
# (dynamic_distiller.py:195-200,341-356).
#
# Usage: [TEACHER=/path.pth] scripts/distill_soak.sh [WORK_DIR]
set -u
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/gaiaseg_distill_soak}
PACK=/tmp/gaiaseg_soak_512.gsegpack
CFG=configs/local_examples/train_supernet/soak_distill_512.py
CTRL_CFG=configs/local_examples/train_supernet/soak_synthetic_512.py
TEACHER=${TEACHER:-}

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
EXTRA=()
if [ -n "$TEACHER" ]; then
  echo "== real teacher: $TEACHER"
  EXTRA=(--cfg-options "teacher_checkpoint=$TEACHER")
fi

echo "== distill soak (512 iters) -> $WORK/distill"
python tools/train_supernet.py "$CFG" --work-dir "$WORK/distill" \
  "${EXTRA[@]}" 2>&1 | tee "$WORK/distill.log" | tail -5

echo "== student-only control (512 iters) -> $WORK/control"
python tools/train_supernet.py "$CTRL_CFG" --work-dir "$WORK/control" \
  --cfg-options "runner.max_iters=512" "checkpoint_config.interval=512" \
  "evaluation.interval=256" "log_config.interval=32" \
  2>&1 | tee "$WORK/control.log" | tail -5

echo "== summary"
python - "$WORK" <<'EOF'
import json, sys
work = sys.argv[1]
d = json.load(open(f"{work}/distill/history.json"))
c = json.load(open(f"{work}/control/history.json"))
rows = d["loss"]
def first_last(key):
    vals = [r[key] for r in rows if key in r]
    return (vals[0], vals[-1]) if vals else (None, None)
ok = True
for key in ("distill_loss_seg", "pairwise_loss_seg"):
    a, b = first_last(key)
    falls = a is not None and b is not None and b < a
    ok &= falls
    print(f"{key}: first={a} last={b} falling={falls}")
a, b = first_last("loss")
print(f"total loss: first={a} last={b} falling={b < a}")
ok &= b < a
print("anchor mIoU (distill vs student-only):")
de = {k: v["mIoU"] for k, v in (d["eval"][-1]["metrics"] if d["eval"]
                                else {}).items()}
ce = {k: v["mIoU"] for k, v in (c["eval"][-1]["metrics"] if c["eval"]
                                else {}).items()}
for k in sorted(set(de) | set(ce)):
    print(f"  {k}: distill={de.get(k)} student-only={ce.get(k)}")
print("DISTILL SOAK", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
EOF
