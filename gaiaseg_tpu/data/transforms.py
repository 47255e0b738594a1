"""On-device, jittable data augmentations with mmseg-pipeline semantics.

Reference train pipeline (reference configs/_dynamic_/models/
pspnet_ar50to101v2_gsync.py:60-75): Resize(img_scale, ratio_range=(0.5,2.0),
keep_ratio) -> RandomCrop(crop_size, cat_max_ratio=0.75) -> RandomFlip(0.5)
-> PhotoMetricDistortion -> Normalize -> Pad(size=crop_size, seg_pad_val=255).

TPU-first redesign: Resize+RandomCrop+Pad fuse into ONE dynamic-window
resample with a *static* output shape — sample a random scale r and a crop
origin in scaled space, then gather exactly the crop's sampling grid from the
original image (bilinear for image, nearest for label). Variable intermediate
image sizes — the reason the reference pipeline must run on CPU workers —
never materialize, so the whole augmentation chain jits and runs per-batch on
device (vmapped), feeding fixed-shape bf16 batches straight to the model.

All functions take an explicit PRNG key and fixed-shape arrays:
``img`` float32 [H,W,3] in 0..255, ``label`` int32 [H,W] (255 = ignore).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


# --------------------------------------------------------------------- #
# fused Resize + RandomCrop + Pad
# --------------------------------------------------------------------- #
def _window_indices(out_size: int, in_size: int, offset: Array, scale: Array):
    """Sampling positions in original-image space for an output row/col:
    scaled-space pixel (i + offset) maps back to (i + offset + .5)/scale - .5.
    Returns (floor idx, ceil idx, frac, valid)."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    scaled_pos = i + offset.astype(jnp.float32)
    src = (scaled_pos + 0.5) / scale - 0.5
    valid = scaled_pos < jnp.maximum(in_size * scale, 1.0)
    lo = jnp.clip(jnp.floor(src), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = jnp.clip(src - lo.astype(jnp.float32), 0.0, 1.0)
    return lo, hi, frac, valid


def fused_resize_crop(img: Array, label: Array, scale: Array,
                      off_y: Array, off_x: Array,
                      crop_size: Tuple[int, int],
                      seg_pad_val: int = 255):
    """Resample the crop window directly from the original image.

    Equivalent to: bilinear-resize img by ``scale`` (no antialias, cv2
    semantics), crop ``crop_size`` at (off_y, off_x) in scaled space, pad
    with 0 / ``seg_pad_val`` where the scaled image is smaller than the crop.
    Returns (img_crop [ch,cw,3], label_crop [ch,cw], valid [ch,cw] bool).
    """
    h, w = img.shape[0], img.shape[1]
    ch, cw = crop_size
    ylo, yhi, fy, vy = _window_indices(ch, h, off_y, scale)
    xlo, xhi, fx, vx = _window_indices(cw, w, off_x, scale)

    top = img[ylo][:, xlo] * (1 - fx)[None, :, None] + \
        img[ylo][:, xhi] * fx[None, :, None]
    bot = img[yhi][:, xlo] * (1 - fx)[None, :, None] + \
        img[yhi][:, xhi] * fx[None, :, None]
    img_crop = top * (1 - fy)[:, None, None] + bot * fy[:, None, None]

    ynear = jnp.where(fy < 0.5, ylo, yhi)
    xnear = jnp.where(fx < 0.5, xlo, xhi)
    label_crop = label[ynear][:, xnear]

    valid = vy[:, None] & vx[None, :]
    img_crop = jnp.where(valid[..., None], img_crop, 0.0)
    label_crop = jnp.where(valid, label_crop, seg_pad_val)
    return img_crop, label_crop, valid


def random_scale_crop(rng: Array, img: Array, label: Array,
                      crop_size: Tuple[int, int],
                      ratio_range: Tuple[float, float] = (0.5, 2.0),
                      base_scale: float = 1.0,
                      cat_max_ratio: float = 1.0,
                      num_classes: int = 19,
                      max_trials: int = 10,
                      seg_pad_val: int = 255):
    """mmseg Resize(ratio_range)+RandomCrop(cat_max_ratio)+Pad, fused.

    ``cat_max_ratio`` re-tries up to ``max_trials`` crop origins until no
    class occupies more than that fraction of labeled crop pixels
    (mmseg RandomCrop semantics) — realized as a fixed-trip ``fori_loop``
    over candidate origins, keeping the first acceptable one
    (SURVEY.md §7 hard-part (c)).
    """
    h, w = img.shape[0], img.shape[1]
    ch, cw = crop_size
    k_scale, k_off = jax.random.split(rng)
    ratio = jax.random.uniform(k_scale, (), minval=ratio_range[0],
                               maxval=ratio_range[1])
    scale = ratio * base_scale
    sh = jnp.floor(h * scale + 0.5)
    sw = jnp.floor(w * scale + 0.5)
    margin_y = jnp.maximum(sh - ch, 0.0)
    margin_x = jnp.maximum(sw - cw, 0.0)

    us = jax.random.uniform(k_off, (max_trials, 2))
    cand_y = jnp.floor(us[:, 0] * (margin_y + 1.0)).astype(jnp.int32)
    cand_x = jnp.floor(us[:, 1] * (margin_x + 1.0)).astype(jnp.int32)

    if cat_max_ratio < 1.0:
        def trial_ok(t):
            lab = _label_window(label, scale, cand_y[t], cand_x[t],
                                crop_size, seg_pad_val)
            counts = jnp.bincount(
                jnp.where(lab == seg_pad_val, num_classes, lab).reshape(-1),
                length=num_classes + 1)[:num_classes]
            total = jnp.maximum(jnp.sum(counts), 1)
            return (jnp.max(counts) / total) < cat_max_ratio

        def body(t, chosen):
            # keep the first passing trial; fall back to the last candidate
            ok = trial_ok(t)
            already = chosen >= 0
            return jnp.where(jnp.logical_and(ok, jnp.logical_not(already)),
                             t, chosen)

        chosen = jax.lax.fori_loop(0, max_trials, body, jnp.int32(-1))
        chosen = jnp.where(chosen < 0, max_trials - 1, chosen)
    else:
        chosen = jnp.int32(0)

    oy = cand_y[chosen]
    ox = cand_x[chosen]
    return fused_resize_crop(img, label, scale, oy, ox, crop_size,
                             seg_pad_val)


def _label_window(label: Array, scale: Array, off_y: Array, off_x: Array,
                  crop_size: Tuple[int, int], seg_pad_val: int) -> Array:
    h, w = label.shape[0], label.shape[1]
    ch, cw = crop_size
    ylo, yhi, fy, vy = _window_indices(ch, h, off_y, scale)
    xlo, xhi, fx, vx = _window_indices(cw, w, off_x, scale)
    ynear = jnp.where(fy < 0.5, ylo, yhi)
    xnear = jnp.where(fx < 0.5, xlo, xhi)
    lab = label[ynear][:, xnear]
    return jnp.where(vy[:, None] & vx[None, :], lab, seg_pad_val)


# --------------------------------------------------------------------- #
# flip / photometric / normalize
# --------------------------------------------------------------------- #
def random_flip(rng: Array, img: Array, label: Array, prob: float = 0.5):
    coin = jax.random.uniform(rng, ()) < prob
    img = jnp.where(coin, img[:, ::-1, :], img)
    label = jnp.where(coin, label[:, ::-1], label)
    return img, label


def _rgb_to_hsv(rgb: Array) -> Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: Array) -> Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def photometric_distortion(rng: Array, img: Array,
                           brightness_delta: float = 32.0,
                           contrast_range: Tuple[float, float] = (0.5, 1.5),
                           saturation_range: Tuple[float, float] = (0.5, 1.5),
                           hue_delta: float = 18.0) -> Array:
    """mmseg PhotoMetricDistortion: random brightness, contrast (random
    order: before or after saturation/hue), saturation, hue — each applied
    with prob 0.5. Input/output 0..255 float."""
    ks = jax.random.split(rng, 10)

    def maybe(k, x, fn):
        return jnp.where(jax.random.uniform(k, ()) < 0.5, fn(x), x)

    img = maybe(ks[0], img, lambda x: jnp.clip(
        x + jax.random.uniform(ks[1], (), minval=-brightness_delta,
                               maxval=brightness_delta), 0, 255))

    def contrast(x):
        alpha = jax.random.uniform(ks[2], (), minval=contrast_range[0],
                                   maxval=contrast_range[1])
        return jnp.clip(x * alpha, 0, 255)

    def sat_hue(x):
        hsv = _rgb_to_hsv(x / 255.0)
        s_mult = jnp.where(
            jax.random.uniform(ks[3], ()) < 0.5,
            jax.random.uniform(ks[4], (), minval=saturation_range[0],
                               maxval=saturation_range[1]), 1.0)
        h_shift = jnp.where(
            jax.random.uniform(ks[5], ()) < 0.5,
            jax.random.uniform(ks[6], (), minval=-hue_delta,
                               maxval=hue_delta) / 360.0, 0.0)
        hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * s_mult, 0, 1))
        hsv = hsv.at[..., 0].set((hsv[..., 0] + h_shift) % 1.0)
        return jnp.clip(_hsv_to_rgb(hsv) * 255.0, 0, 255)

    contrast_first = jax.random.uniform(ks[7], ()) < 0.5
    img = jnp.where(contrast_first, maybe(ks[8], img, contrast), img)
    img = sat_hue(img)
    img = jnp.where(contrast_first, img, maybe(ks[9], img, contrast))
    return img


def normalize(img: Array, mean: Sequence[float], std: Sequence[float],
              to_rgb: bool = True) -> Array:
    """mmcv Normalize; ``to_rgb`` swaps BGR->RGB first (cv2 loads BGR — our
    loaders produce RGB already, so to_rgb=True with RGB-ordered mean/std is
    an identity swap handled by the caller's mean/std convention)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img - mean) / std


# --------------------------------------------------------------------- #
# the full train-time augmentation, batched
# --------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=(
    "crop_size", "ratio_range", "cat_max_ratio", "num_classes",
    "photometric", "flip_prob"))
def augment_batch(rng: Array, imgs: Array, labels: Array,
                  mean: Array, std: Array,
                  crop_size: Tuple[int, int] = (512, 1024),
                  ratio_range: Tuple[float, float] = (0.5, 2.0),
                  cat_max_ratio: float = 0.75,
                  num_classes: int = 19,
                  photometric: bool = True,
                  flip_prob: float = 0.5) -> Dict[str, Array]:
    """Full fused train pipeline over a batch: [B,H,W,3] u8/f32 + [B,H,W] i32
    -> bf16 [B,ch,cw,3] + i32 [B,ch,cw]."""

    def one(key, img, label):
        img = img.astype(jnp.float32)
        k1, k2, k3 = jax.random.split(key, 3)
        img, label, valid = random_scale_crop(
            k1, img, label, crop_size, ratio_range,
            cat_max_ratio=cat_max_ratio, num_classes=num_classes)
        coin = jax.random.uniform(k2, ()) < flip_prob
        img = jnp.where(coin, img[:, ::-1, :], img)
        label = jnp.where(coin, label[:, ::-1], label)
        valid = jnp.where(coin, valid[:, ::-1], valid)
        if photometric:
            img = photometric_distortion(k3, img)
        img = normalize(img, mean, std)
        # padded region is 0 *after* normalize (mmseg pads post-normalize)
        img = jnp.where(valid[..., None], img, 0.0)
        return img.astype(jnp.bfloat16), label.astype(jnp.int32)

    keys = jax.random.split(rng, imgs.shape[0])
    out_img, out_lab = jax.vmap(one)(keys, imgs, labels)
    return {"img": out_img, "gt": out_lab}


@functools.partial(jax.jit, static_argnames=("size",))
def prepare_eval_batch(imgs: Array, mean: Array, std: Array,
                       size: Optional[Tuple[int, int]] = None) -> Array:
    """Eval-time: normalize (+ optional resize), bf16 NHWC."""
    x = imgs.astype(jnp.float32)
    x = normalize(x, mean, std)
    if size is not None and tuple(x.shape[1:3]) != tuple(size):
        x = jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[-1]),
                             method="bilinear")
    return x.astype(jnp.bfloat16)
