#!/usr/bin/env bash
# Multi-subnet evaluation (parity with reference scripts/test_local.sh).
set -euo pipefail
CONFIG=${1:?usage: test_local.sh CONFIG CKPT WORK_DIR [extra args...]}
CKPT=${2:?checkpoint required}
WORK_DIR=${3:-work_dirs/test}
shift 3
python tools/test_supernet.py "$CONFIG" "$CKPT" --work-dir "$WORK_DIR" "$@"
