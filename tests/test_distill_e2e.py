"""Distillation dress rehearsal: the FULL teacher->student pipeline in one
command — build a (random-init) torch BEiT+FCN teacher segmentor ``.pth``,
convert it through ``teacher_checkpoint`` loading, and drive
``tools/train_supernet.py`` on the distill config over synthetic data,
asserting the distillation losses actually fall (the reference's workflow:
dynamic_distiller.py:195-200 teacher ckpt load + :370-413 train loop)."""
import json
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

# long-running module: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.slow
def test_distill_pipeline_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, osp.dirname(__file__))
    from test_vit_convert import TBeit, _rand

    # ---- teacher .pth: BEiT backbone + reference-layout FCN head ------ #
    tmodel = TBeit(dim=32, heads=2, depth=2, patch=8, grid=8).eval()
    _rand(tmodel)
    sd = {"backbone." + k: v for k, v in tmodel.state_dict().items()}
    rs = np.random.RandomState(7)
    # teacher head: convs.0 (8ch 3x3 conv over the 32-dim feat) + conv_seg
    sd.update({
        "decode_head.convs.0.conv.weight":
            torch.tensor(rs.randn(8, 32, 3, 3).astype(np.float32)),
        "decode_head.convs.0.bn.weight":
            torch.tensor(rs.randn(8).astype(np.float32)),
        "decode_head.convs.0.bn.bias":
            torch.tensor(rs.randn(8).astype(np.float32)),
        "decode_head.convs.0.bn.running_mean":
            torch.tensor(rs.randn(8).astype(np.float32)),
        "decode_head.convs.0.bn.running_var":
            torch.tensor(np.abs(rs.randn(8)).astype(np.float32)),
        "decode_head.conv_seg.weight":
            torch.tensor(rs.randn(5, 8, 1, 1).astype(np.float32)),
        "decode_head.conv_seg.bias":
            torch.tensor(rs.randn(5).astype(np.float32)),
    })
    pth = str(tmp_path / "teacher.pth")
    torch.save({"state_dict": sd}, pth)

    # ---- one command: the distill config through the train CLI -------- #
    work = str(tmp_path / "distill_run")
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "train_supernet.py"),
         osp.join(REPO, "configs", "tests", "tiny_distill.py"),
         "--work-dir", work, "--device", "cpu",
         "--cfg-options", f"teacher_checkpoint={pth}"],
        capture_output=True, text=True, timeout=1800, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-4000:]

    hist = json.load(open(osp.join(work, "history.json")))
    rows = hist["loss"]
    assert len(rows) >= 2
    # both distillation signals present and decreasing over training
    # (fixed-arch schedule; compare the last log line against the first)
    for key in ("distill_loss_seg", "pairwise_loss_seg"):
        vals = [r[key] for r in rows if key in r]
        assert len(vals) >= 2, f"{key} missing from history: {rows}"
        assert min(vals[1:]) < vals[0], (key, vals)
    # and the checkpoint exists (full pipeline artifact)
    assert osp.exists(osp.join(work, "iter_48.ckpt"))
