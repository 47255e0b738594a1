#!/usr/bin/env bash
# End-to-end subnet pipeline: flops sweep -> rule-filtered eval ->
# fast-finetune -> extract the winner (the pipeline the reference's missing
# benchmarks/ script was meant to drive; SURVEY.md §2.8).
set -euo pipefail
CONFIG=${1:?usage: get_subnet_cityscapes_finetune.sh CONFIG CKPT OUT_DIR}
CKPT=${2:?supernet checkpoint required}
OUT=${3:-work_dirs/pipeline}
python tools/count_flops.py "$CONFIG" --work-dir "$OUT/flops"
python tools/test_supernet.py "$CONFIG" "$CKPT" \
    --model-space "$OUT/flops/flops.json" --work-dir "$OUT/eval"
python tools/finetune_supernet.py "$CONFIG" "$CKPT" \
    --model-space "$OUT/eval/test_supernet/metrics.json" \
    --work-dir "$OUT/fastft"
python tools/extract_subnet.py "$CONFIG" "$CKPT" --work-dir "$OUT/subnets"
