#!/usr/bin/env bash
# Subnet extraction (parity with reference scripts/extract_subnet.sh).
set -euo pipefail
CONFIG=${1:?usage: extract_subnet.sh CONFIG CKPT WORK_DIR [extra args...]}
CKPT=${2:?checkpoint required}
WORK_DIR=${3:-work_dirs/subnets}
shift 3
python tools/extract_subnet.py "$CONFIG" "$CKPT" --work-dir "$WORK_DIR" "$@"
