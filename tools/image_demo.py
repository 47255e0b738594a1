#!/usr/bin/env python
"""Single-image segmentation demo: config + checkpoint + image ->
palette-blended overlay PNG (the reference exposes this via
apis/inference.py show_result_pyplot; headless here)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("image")
    p.add_argument("--out", default="demo_out.png")
    p.add_argument("--opacity", type=float, default=0.5)
    p.add_argument("--arch", default=None,
                   help="JSON flat arch meta, e.g. "
                        '\'{"arch.backbone.body.depth": [3,4,6,3]}\'')
    args = p.parse_args()

    import json

    import numpy as np
    from PIL import Image

    from gaiaseg_tpu.engine import (inference_segmentor, init_segmentor,
                                    show_result)

    seg = init_segmentor(args.config, args.checkpoint)
    meta = json.loads(args.arch) if args.arch else None
    with Image.open(args.image) as im:
        img = np.asarray(im.convert("RGB"), np.uint8)
    pred = inference_segmentor(seg, img, meta)
    show_result(img, pred, seg.PALETTE, args.opacity, args.out)
    print(f"saved overlay -> {args.out}")


if __name__ == "__main__":
    main()
