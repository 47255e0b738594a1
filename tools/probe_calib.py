#!/usr/bin/env python
"""Attribute anchor-eval mIoU to the BN-calibration protocol.

Loads a trained soak checkpoint and evaluates the val-sampler anchors
(R50/R77/R101) + MAX under: (0) raw running stats, (a) debiased
MAX-anchor calibration (current default), (b) biased no-debias
MAX-anchor calibration (pre-fix behavior), (c) debiased with more
batches, (d) per-subnet calibration (the reference's protocol,
tools/test_supernet.py:190-198).

Usage: python tools/probe_calib.py [ckpt] [config]
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/gaiaseg_teacher/latest.ckpt"
    cfg_path = sys.argv[2] if len(sys.argv) > 2 else \
        "configs/local_examples/train_supernet/soak_synthetic_512.py"
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    from gaiaseg_tpu.archspace import build_model_sampler
    from gaiaseg_tpu.data.datasets import build_dataset
    from gaiaseg_tpu.data.pipeline_cfg import parse_test_pipeline
    from gaiaseg_tpu.engine import calibrate_bn, evaluate
    from gaiaseg_tpu.engine.inference import init_segmentor
    from gaiaseg_tpu.models import encode_arch
    from gaiaseg_tpu.utils import Config

    cfg = Config.fromfile(cfg_path)
    seg = init_segmentor(cfg, ckpt)
    model, variables, max_arch = seg.model, seg.variables, seg.max_arch
    train_ds = build_dataset(cfg["data"]["train"])
    val_ds = build_dataset(cfg["data"]["val"])
    test_pipe = parse_test_pipeline(cfg["data"]["val"].get("pipeline"))

    sampler = build_model_sampler(cfg["val_sampler"])
    metas = list(sampler.traverse())
    names = [m.get("name", str(i)) for i, m in enumerate(metas)]

    def report(tag, vs_by_name):
        out = []
        for name, meta in list(zip(names, metas)) + [("MAX", None)]:
            arch = encode_arch(max_arch, meta) if meta else \
                encode_arch(max_arch)
            vs = vs_by_name[name] if isinstance(vs_by_name, dict) and \
                name in vs_by_name else vs_by_name
            res = evaluate(model, vs, val_ds, arch, batch_size=2,
                           test_params=test_pipe)
            out.append(f"{name}={res['mIoU']:.4f}")
        print(f"[{tag}] " + "  ".join(out), flush=True)

    report("raw-running-stats", variables)
    vs_a = calibrate_bn(model, variables, train_ds, encode_arch(max_arch),
                        num_batches=8, batch_size=8, test_params=test_pipe)
    report("debias-8-MAX", vs_a)
    vs_b = calibrate_bn(model, variables, train_ds, encode_arch(max_arch),
                        num_batches=8, batch_size=8, test_params=test_pipe,
                        momentum_override=0.0)
    report("biased-8-MAX", vs_b)
    vs_c = calibrate_bn(model, variables, train_ds, encode_arch(max_arch),
                        num_batches=32, batch_size=8, test_params=test_pipe)
    report("debias-32-MAX", vs_c)
    vs_d = {"MAX": vs_a}
    for name, meta in zip(names, metas):
        vs_d[name] = calibrate_bn(model, variables, train_ds,
                                  encode_arch(max_arch, meta),
                                  num_batches=8, batch_size=8,
                                  test_params=test_pipe)
    report("debias-8-PERSUBNET", vs_d)


if __name__ == "__main__":
    main()
