#!/usr/bin/env python
"""Dataset pixel mean/std statistics (parity with reference
tools/mean_std.py, minus its hardcoded personal paths)."""
import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train")
    p.add_argument("--max-images", type=int, default=500)
    args = p.parse_args()

    from gaiaseg_tpu.data.datasets import build_dataset
    from gaiaseg_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    ds = build_dataset(cfg["data"][args.split])
    n = min(len(ds), args.max_images)
    s = np.zeros(3, np.float64)
    s2 = np.zeros(3, np.float64)
    count = 0
    for i in range(n):
        img = ds[i]["img"].astype(np.float64)
        s += img.sum((0, 1))
        s2 += (img ** 2).sum((0, 1))
        count += img.shape[0] * img.shape[1]
    mean = s / count
    std = np.sqrt(s2 / count - mean ** 2)
    print(f"mean={mean.tolist()} std={std.tolist()} ({n} images)")


if __name__ == "__main__":
    main()
