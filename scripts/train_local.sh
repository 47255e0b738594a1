#!/usr/bin/env bash
# Supernet training launch (parity with reference scripts/train_local.sh,
# which wrapped torch.distributed.launch). On TPU one process drives all
# local chips; multi-host runs pass --num-processes/--process-id.
set -euo pipefail
CONFIG=${1:?usage: train_local.sh CONFIG [WORK_DIR] [extra args...]}
WORK_DIR=${2:-work_dirs/$(basename "${CONFIG%.*}")}
shift $(( $# > 1 ? 2 : 1 ))
python tools/train_supernet.py "$CONFIG" --work-dir "$WORK_DIR" "$@"
