#!/usr/bin/env python
"""Subnet materialization CLI (capability parity with reference
tools/extract_subnet.py: traverse the sampler, per meta slice the supernet
into a standalone subnet, save as md5(json(meta))[:8]-named checkpoint with
a smoke forward; subnets round-robin across shards)."""
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
    p.add_argument("checkpoint")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--sampler-key", default="train_sampler")
    p.add_argument("--shard-id", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--smoke-size", type=int, nargs=2, default=(64, 64))
    from gaiaseg_tpu.utils.cli import add_device_arg
    add_device_arg(p)
    return p.parse_args()


def main():
    args = parse_args()
    from gaiaseg_tpu.utils.cli import apply_device
    apply_device(args)
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gaiaseg_tpu.archspace import build_model_sampler, unfold_dict
    from gaiaseg_tpu.engine import save_checkpoint
    from gaiaseg_tpu.engine.extract import extract_subnet, subnet_name
    from gaiaseg_tpu.engine.inference import init_segmentor
    from gaiaseg_tpu.models import build_segmentor, encode_arch, model_max_arch
    from gaiaseg_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    seg = init_segmentor(cfg, args.checkpoint)
    sampler = build_model_sampler(cfg[args.sampler_key])
    sampler.set_mode("traverse")
    os.makedirs(args.work_dir, exist_ok=True)

    metas = list(sampler.traverse())[args.shard_id::args.num_shards]
    logging.info("extracting %d subnets", len(metas))
    for meta in metas:
        nested = unfold_dict(meta)
        sub_cfg, sub_vars, arch = extract_subnet(
            cfg["model"], seg.variables, meta,
            img_size=tuple(args.smoke_size))
        # smoke forward at deploy shapes (reference extract_subnet.py:125-130)
        sub_model = build_segmentor(sub_cfg)
        h, w = args.smoke_size
        logit = sub_model.apply(sub_vars,
                                jnp.zeros((1, h, w, 3), jnp.bfloat16),
                                encode_arch(model_max_arch(sub_cfg)))
        assert np.all(np.isfinite(np.asarray(logit, np.float32)))
        name = subnet_name(nested)
        path = osp.join(args.work_dir, f"{name}.ckpt")
        save_checkpoint(path, sub_vars, meta={
            "meta": nested, "model_cfg": json.loads(
                json.dumps(sub_cfg, default=repr))})
        logging.info("saved subnet %s (%s)", name,
                     nested.get("name", "unnamed"))


if __name__ == "__main__":
    main()
