#!/usr/bin/env python
"""FLOPs sweep over a sampler's model space (capability parity with
reference tools/count_flops.py: traverse the sampler, per-meta active-shape
FLOPs/params via analytic conv arithmetic, ``only_backbone_flops`` switch,
default input (3,512,2048), append-only per-shard JSON then merged
work_dir/flops.json).

TPU redesign: complexity is computed analytically from the arch meta
(SURVEY.md §7 step 1) — no model build, no dummy forwards; a 28k-arch sweep
is seconds of pure python. ``--shard-id/--num-shards`` keeps the reference's
restartable subnet-sharding pattern (count_flops.py:119-122)."""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--input-shape", type=int, nargs=3, default=None,
                   help="C H W (default 3 512 2048 or data_cfg.input_shape)")
    p.add_argument("--only-backbone", action="store_true")
    p.add_argument("--shard-id", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--sampler-key", default="train_sampler")
    return p.parse_args()


def main():
    args = parse_args()
    from gaiaseg_tpu.archspace import build_model_sampler, unfold_dict
    from gaiaseg_tpu.archspace.complexity import get_model_complexity_info
    from gaiaseg_tpu.models.arch_util import canonical_arch, model_max_arch
    from gaiaseg_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    default_shape = tuple(args.input_shape) if args.input_shape else tuple(
        (cfg.get("data_cfg") or {}).get("input_shape", (3, 512, 2048)))

    sampler = build_model_sampler(cfg[args.sampler_key])
    sampler.set_mode("traverse")
    max_arch = model_max_arch(cfg["model"])

    os.makedirs(args.work_dir, exist_ok=True)
    shard_path = osp.join(args.work_dir, f"flops.json.{args.shard_id}")
    n = 0
    with open(shard_path, "w") as f:
        for i, meta in enumerate(sampler.traverse()):
            if i % args.num_shards != args.shard_id:
                continue
            nested = unfold_dict(meta)
            arch = canonical_arch(max_arch, meta)
            shape = nested.get("data", {}).get("input_shape", default_shape)
            if isinstance(shape, int):
                shape = (3, shape, shape * 2)
            info = get_model_complexity_info(
                cfg["model"], arch, tuple(shape),
                only_backbone_flops=args.only_backbone)
            row = dict(nested)
            row.setdefault("data", {})["input_shape"] = list(shape)
            row["overhead"] = {"flops": info["flops"],
                               "params": info["params"]}
            f.write(json.dumps(row, default=float) + "\n")
            n += 1
    print(f"shard {args.shard_id}: {n} subnets -> {shard_path}")

    if args.shard_id == 0:
        rows = []
        for s in range(args.num_shards):
            p = osp.join(args.work_dir, f"flops.json.{s}")
            if osp.exists(p):
                with open(p) as f:
                    rows += [json.loads(line) for line in f if line.strip()]
        merged = osp.join(args.work_dir, "flops.json")
        with open(merged, "w") as f:
            json.dump(rows, f, indent=1, default=float)
        print(f"merged {len(rows)} subnets -> {merged}")


if __name__ == "__main__":
    main()
