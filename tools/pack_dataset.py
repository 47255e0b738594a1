#!/usr/bin/env python
"""Convert a config-declared dataset into the packed native format
(.gsegpack) read by PackedDataset — the production host-IO path."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("out", help="output .gsegpack path")
    p.add_argument("--split", default="train", choices=["train", "val",
                                                        "test"])
    p.add_argument("--size", type=int, nargs=2, default=None,
                   help="H W (default: first record's shape)")
    args = p.parse_args()

    from gaiaseg_tpu.data.datasets import build_dataset
    from gaiaseg_tpu.data.packed import pack_dataset
    from gaiaseg_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    ds = build_dataset(cfg["data"][args.split])
    out = pack_dataset(ds, args.out,
                       size=tuple(args.size) if args.size else None)
    print(f"packed {len(ds)} records -> {out}")


if __name__ == "__main__":
    main()
