#!/usr/bin/env python
"""Fast-finetune selected subnets (capability parity with reference
tools/finetune_supernet.py: load model space with metric-presence check,
apply rules, per subnet wrap the meta as a single-anchor sampler, run the
full train loop for a short schedule, evaluate, tag metrics under
--metric-tag, dump the annotated model space)."""
import argparse
import json
import logging
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", help="supernet checkpoint to finetune from")
    p.add_argument("--model-space", default=None)
    p.add_argument("--work-dir", required=True)
    p.add_argument("--metric-tag", default="fastft_metric")
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    from gaiaseg_tpu.utils.cli import add_device_arg
    add_device_arg(p)
    return p.parse_args()


def main():
    args = parse_args()
    from gaiaseg_tpu.utils.cli import apply_device
    apply_device(args)
    logging.basicConfig(level=logging.INFO)
    from gaiaseg_tpu.archspace import (ModelSpace, build_model_sampler,
                                       build_sample_rule, fold_dict)
    from gaiaseg_tpu.data.datasets import build_dataset
    from gaiaseg_tpu.data.pipeline_cfg import parse_test_pipeline
    from gaiaseg_tpu.engine import evaluate, train_segmentor
    from gaiaseg_tpu.models import build_segmentor, encode_arch, model_max_arch
    from gaiaseg_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    space_path = args.model_space or cfg.get("model_space_path")
    space = ModelSpace.load(space_path)
    if cfg.get("model_sampling_rules"):
        space = space.apply_rule(
            build_sample_rule(cfg["model_sampling_rules"]))
    metas = space.pack()
    logging.info("fast-finetuning %d subnets", len(metas))

    model = build_segmentor(cfg["model"],
                            test_cfg=cfg["model"].get("test_cfg"))
    max_arch = model_max_arch(cfg["model"])
    val_dataset = build_dataset(cfg["data"]["val"])
    test_pipe = parse_test_pipeline(cfg["data"]["val"].get("pipeline"))

    # restartable sweep: fast-finetune is the most expensive sweep in the
    # system — a crash at subnet 40/50 must not lose the first 39
    # (SURVEY §5; reference finetune_supernet.py:358 barriers per subnet)
    from gaiaseg_tpu.utils.sweep import SweepLog
    sweep = SweepLog(osp.join(args.work_dir, "fastft_metrics.jsonl"))
    for i, meta in enumerate(metas):
        if sweep.done(meta):
            logging.info("[%d/%d] already finetuned in a prior run, skip",
                         i + 1, len(metas))
            continue
        flat = fold_dict(meta)
        flat.setdefault("name", f"subnet_{i}")
        anchor = build_model_sampler(dict(type="anchor", anchors=[flat]))
        sub_dir = osp.join(args.work_dir, f"subnet_{i}")
        state, _ = train_segmentor(
            model, cfg, work_dir=sub_dir, train_sampler=anchor,
            val_sampler=None, max_iters=args.max_iters,
            load_from=args.checkpoint)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        metrics = evaluate(model, variables, val_dataset,
                           encode_arch(max_arch, meta),
                           test_params=test_pipe,
                           batch_size=args.batch_size)
        sweep.record(meta, metrics)
        logging.info("[%d/%d] %s mIoU=%.4f", i + 1, len(metas),
                     flat.get("name"), metrics["mIoU"])

    out = osp.join(args.work_dir, "fastft_metrics.json")
    os.makedirs(args.work_dir, exist_ok=True)
    with open(out, "w") as f:
        json.dump(sweep.annotated(metas, args.metric_tag), f,
                  indent=1, default=float)
    logging.info("dumped annotated model space -> %s", out)


if __name__ == "__main__":
    main()
