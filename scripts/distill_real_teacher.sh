#!/usr/bin/env bash
# Turnkey real-teacher distillation (VERDICT r4 task 6): point this at a
# torch BEiT(-UPerNet) checkpoint and it runs the full distillation
# pipeline — conversion happens on load (engine/train.py
# load_teacher_checkpoint: backbone.* -> t_backbone with rel-pos/pos-embed
# resolution surgery, decode_head.* -> t_decode_head), matching the
# reference's teacher build (dynamic_distiller.py:27-148,195-200).
#
# Usage:
#   scripts/distill_real_teacher.sh /path/to/beit_teacher.pth \
#       [CONFIG] [WORK_DIR] [extra --cfg-options ...]
#
# CONFIG defaults to the Cityscapes distill supernet config
# (configs/_dynamic_/models/pspnet_distill_beit.py). On a box without
# Cityscapes, use the synthetic soak config instead:
#   scripts/distill_real_teacher.sh t.pth \
#       configs/local_examples/train_supernet/soak_distill_512.py
set -eu
cd "$(dirname "$0")/.."
TEACHER=${1:?usage: distill_real_teacher.sh /path/to/teacher.pth [config] [work_dir]}
CFG=${2:-configs/_dynamic_/models/pspnet_distill_beit.py}
WORK=${3:-/tmp/gaiaseg_distill_real}
shift $(( $# > 3 ? 3 : $# ))

[ -f "$TEACHER" ] || { echo "teacher checkpoint not found: $TEACHER"; exit 1; }

echo "== sanity: teacher checkpoint converts against the distiller tree"
python - "$TEACHER" "$CFG" <<'EOF'
import sys
import jax, jax.numpy as jnp
from gaiaseg_tpu.engine import create_train_state
from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
from gaiaseg_tpu.engine.train import load_teacher_checkpoint
from gaiaseg_tpu.models import build_segmentor, encode_arch, model_max_arch
from gaiaseg_tpu.utils import Config
jax.config.update("jax_platforms", "cpu")
path, cfg_path = sys.argv[1], sys.argv[2]
cfg = Config.fromfile(cfg_path)
model = build_segmentor(cfg["model"])
tx = build_optimizer(dict(type="SGD", lr=0.01), None,
                     build_lr_schedule(None, 0.01, 10))
state = create_train_state(model, jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                           encode_arch(model_max_arch(cfg["model"])), tx)
p, s = load_teacher_checkpoint(path, state.params, state.batch_stats,
                               cfg["model"])
print("teacher conversion OK:",
      sorted(k for k in p if k.startswith("t_")))
EOF

echo "== distillation training -> $WORK"
exec python tools/train_supernet.py "$CFG" --work-dir "$WORK" \
  --cfg-options "teacher_checkpoint=$TEACHER" "$@"
