#!/usr/bin/env bash
# Fast-finetune selected subnets (parity with reference
# scripts/finetune_local.sh).
set -euo pipefail
CONFIG=${1:?usage: finetune_local.sh CONFIG CKPT WORK_DIR [extra args...]}
CKPT=${2:?supernet checkpoint required}
WORK_DIR=${3:-work_dirs/fastft}
shift 3
python tools/finetune_supernet.py "$CONFIG" "$CKPT" --work-dir "$WORK_DIR" "$@"
