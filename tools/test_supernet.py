#!/usr/bin/env python
"""Multi-subnet evaluation over a model space (capability parity with
reference tools/test_supernet.py dist path: load model space JSON, apply
sampling rules, per subnet manipulate-arch + full val sweep + mIoU, tag
``metric.<tag>`` into the space, dump annotated metrics.json).

TPU redesign: one compiled eval graph serves every subnet (traced arch
masks), and the confusion matrix stays on device — the >=500 subnets/hr,
zero-recompile target (BASELINE.md)."""
import argparse
import json
import logging
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--model-space", default=None,
                   help="model space json (default cfg.model_space_path)")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--metric-tag", default="metric")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--flip", action="store_true")
    p.add_argument("--max-subnets", type=int, default=None)
    p.add_argument("--bn-calibrate", type=int, default=0, metavar="N",
                   help="re-estimate BN stats per subnet over N train "
                        "batches before eval (reference BN minibatch-stats "
                        "mode, test_supernet.py:190-198)")
    p.add_argument("--vmap", type=int, default=0, metavar="N",
                   help="score N subnets per compiled step via vmap over "
                        "the stacked arch pytree (population eval)")
    from gaiaseg_tpu.utils.cli import add_device_arg
    add_device_arg(p)
    return p.parse_args()


def main():
    args = parse_args()
    from gaiaseg_tpu.utils.cli import apply_device
    apply_device(args)
    logging.basicConfig(level=logging.INFO)
    from gaiaseg_tpu.archspace import (ModelSpace, build_sample_rule)
    from gaiaseg_tpu.data.datasets import build_dataset
    from gaiaseg_tpu.data.pipeline_cfg import parse_test_pipeline
    from gaiaseg_tpu.engine import load_checkpoint, evaluate, make_eval_step
    from gaiaseg_tpu.engine.inference import init_segmentor
    from gaiaseg_tpu.models.arch_util import encode_arch
    from gaiaseg_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    seg = init_segmentor(cfg, args.checkpoint)
    space_path = args.model_space or cfg.get("model_space_path")
    space = ModelSpace.load(space_path)
    if cfg.get("model_sampling_rules"):
        space = space.apply_rule(build_sample_rule(cfg["model_sampling_rules"]))
    metas = space.pack()
    if args.max_subnets:
        metas = metas[: args.max_subnets]
    logging.info("evaluating %d subnets from %s", len(metas), space_path)

    dataset = build_dataset(cfg["data"]["val"])
    test_pipe = parse_test_pipeline(cfg["data"]["val"].get("pipeline"))
    # multi-scale TTA when the config's MultiScaleFlipAug declares
    # img_ratios / a scale list (reference pspnet config :76-93)
    eval_step = make_eval_step(seg.model, seg.model.num_classes, args.flip,
                               ratios=test_pipe.img_ratios)

    os.makedirs(osp.join(args.work_dir, "test_supernet"), exist_ok=True)
    # restartable sweep: one flushed JSON line per scored subnet; a rerun
    # after a crash skips finished subnets (SURVEY §5, reference
    # finetune_supernet.py:358 barrier-per-subnet semantics)
    from gaiaseg_tpu.utils.sweep import SweepLog
    sweep = SweepLog(osp.join(args.work_dir, "test_supernet",
                              "metrics.jsonl"))
    all_metas = list(metas)
    metas = [m for m in metas if not sweep.done(m)]
    if len(all_metas) != len(metas):
        logging.info("restart: %d/%d subnets already scored, skipping",
                     len(all_metas) - len(metas), len(all_metas))
    if args.vmap and args.vmap > 1:
        from gaiaseg_tpu.engine.evaluate import evaluate_population
        # depth-bucketed sweep when a sampler is available: each subnet
        # pays its bucket's depth-proportional cost instead of MAX
        bucketer = None
        if cfg.get("train_sampler"):
            from gaiaseg_tpu.archspace import build_model_sampler
            from gaiaseg_tpu.models.arch_util import make_depth_bucketer
            bucketer = make_depth_bucketer(
                build_model_sampler(cfg["train_sampler"]), seg.max_arch)
        for lo in range(0, len(metas), args.vmap):
            chunk = metas[lo:lo + args.vmap]
            archs = [encode_arch(seg.max_arch, m) for m in chunk]
            t0 = time.time()
            results = evaluate_population(
                seg.model, seg.variables, dataset, archs,
                test_params=test_pipe, batch_size=args.batch_size,
                metas=chunk if bucketer else None, bucketer=bucketer)
            dt = time.time() - t0
            for m, r in zip(chunk, results):
                sweep.record(m, r)
            logging.info("[%d/%d] vmap population chunk of %d: "
                         "%.1fs (%.0f subnets/hr)", len(sweep),
                         len(all_metas), len(chunk), dt,
                         3600.0 * len(chunk) / dt)
        metas = []
    calib_ds = None
    if args.bn_calibrate:
        from gaiaseg_tpu.engine.calibrate import calibrate_bn
        from gaiaseg_tpu.data.datasets import build_dataset as _bd
        calib_ds = _bd(cfg["data"]["train"])
    for i, meta in enumerate(metas):
        arch = encode_arch(seg.max_arch, meta)
        t0 = time.time()
        variables = seg.variables
        if calib_ds is not None:
            variables = calibrate_bn(seg.model, variables, calib_ds, arch,
                                     num_batches=args.bn_calibrate,
                                     test_params=test_pipe)
        metrics = evaluate(seg.model, variables, dataset, arch,
                           test_params=test_pipe, batch_size=args.batch_size,
                           flip=args.flip, eval_step=eval_step)
        dt = time.time() - t0
        sweep.record(meta, metrics)
        logging.info("[%d/%d] mIoU=%.4f (%.1fs/subnet, %.0f subnets/hr)",
                     i + 1, len(metas), metrics["mIoU"], dt, 3600.0 / dt)

    out = osp.join(args.work_dir, "test_supernet", "metrics.json")
    with open(out, "w") as f:
        json.dump(sweep.annotated(all_metas, args.metric_tag), f,
                  indent=1, default=float)
    logging.info("dumped annotated model space -> %s", out)


if __name__ == "__main__":
    main()
