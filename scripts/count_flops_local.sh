#!/usr/bin/env bash
# FLOPs sweep (parity with reference scripts/count_flops_local.sh).
set -euo pipefail
CONFIG=${1:?usage: count_flops_local.sh CONFIG WORK_DIR [extra args...]}
WORK_DIR=${2:-work_dirs/flops}
shift $(( $# > 1 ? 2 : 1 ))
python tools/count_flops.py "$CONFIG" --work-dir "$WORK_DIR" "$@"
