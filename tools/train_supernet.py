#!/usr/bin/env python
"""Supernet training CLI (capability parity with reference
tools/train_supernet.py: config/work_dir/seed/resume/load/cfg-options, dumps
config + env log, builds segmentor + samplers + datasets, runs training).

Single entry point for every host: multi-host runs set --num-processes /
--process-id / --coordinator (replaces torch.distributed.launch,
reference scripts/train_local.sh)."""
import argparse
import json
import logging
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train a segmentation supernet")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--load-from", default=None)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="key=value deep-merge overrides (dot keys)")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=None,
                   help="tensor-parallel size over the model mesh axis "
                        "(overrides cfg.model_parallel; default pure DP)")
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--device", default=None,
                   help="force a jax platform, e.g. cpu / tpu")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax profiler trace of N train iters "
                        "into WORK_DIR/trace (new capability vs the "
                        "reference, SURVEY.md §5)")
    return p.parse_args()


def cfg_options_to_dict(pairs):
    out = {}
    for kv in pairs:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        out[k] = v
    return out


def main():
    args = parse_args()
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    from gaiaseg_tpu.engine import train_segmentor
    from gaiaseg_tpu.models import build_segmentor
    from gaiaseg_tpu.parallel import initialize_distributed, is_main_process
    from gaiaseg_tpu.utils import Config

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(cfg_options_to_dict(args.cfg_options))
    if args.model_parallel:
        cfg["model_parallel"] = int(args.model_parallel)
    work_dir = args.work_dir or osp.join(
        "work_dirs", osp.splitext(osp.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)

    timestamp = time.strftime("%Y%m%d_%H%M%S")
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(osp.join(work_dir,
                                               f"{timestamp}.log"))])
    logger = logging.getLogger("gaiaseg_tpu")
    if is_main_process():
        cfg.dump(osp.join(work_dir, osp.basename(args.config)))
        import jax
        logger.info("devices: %s", jax.devices())

    model = build_segmentor(cfg["model"],
                            test_cfg=cfg["model"].get("test_cfg"))

    profiler_ctx = None
    if args.profile:
        import jax
        trace_dir = osp.join(work_dir, "trace")
        stop_at = [args.profile]

        def progress_cb(it, logs):
            if it == 0:
                jax.profiler.start_trace(trace_dir)
            if it + 1 == stop_at[0]:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", trace_dir)
    else:
        progress_cb = None

    state, history = train_segmentor(
        model, cfg, work_dir=work_dir, seed=args.seed,
        max_iters=args.max_iters, resume_from=args.resume_from,
        load_from=args.load_from, progress_cb=progress_cb)
    logger.info("training done at step %d", int(state.step))


if __name__ == "__main__":
    main()
