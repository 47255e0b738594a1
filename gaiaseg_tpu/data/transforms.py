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
        # All trials' class histograms at once, without materializing any
        # window: nearest resampling is separable, so a window's histogram
        # is My @ OneHot(label) @ Mx^T with My/Mx the per-source-row/col
        # output multiplicities. Integer-exact (0/1 and small-int operands,
        # f32 accumulation), so the chosen trial is bit-identical to the
        # former per-trial gather+bincount loop — which cost ~185ms of a
        # 299ms augment batch on v5e (bincount lowers to scatter; see
        # CLAUDE.md "Scatter is poison").
        counts = _trial_histograms(label, scale, cand_y, cand_x, crop_size,
                                   num_classes, seg_pad_val)
        total = jnp.maximum(counts.sum(-1), 1.0)
        ok = (counts.max(-1) / total) < cat_max_ratio
        # first passing trial; fall back to the last candidate
        chosen = jnp.where(jnp.any(ok), jnp.argmax(ok),
                           max_trials - 1).astype(jnp.int32)
    else:
        chosen = jnp.int32(0)

    oy = cand_y[chosen]
    ox = cand_x[chosen]
    return fused_resize_crop(img, label, scale, oy, ox, crop_size,
                             seg_pad_val)


def _trial_histograms(label: Array, scale: Array, cand_y: Array,
                      cand_x: Array, crop_size: Tuple[int, int],
                      num_classes: int, seg_pad_val: int) -> Array:
    """[T, num_classes] exact class histograms of the nearest-resampled
    crop window for every candidate origin, via separable multiplicity
    matmuls (no window gather, no bincount scatter).

    Per trial: counts[c] = sum_{i,j valid} 1[label[ynear(i), xnear(j)] == c]
             = sum_{h,w} My[h] * OneHot(label)[c,h,w] * Mx[w]
    where My[h] = #{i : ynear(i) == h, valid_y(i)} (likewise Mx). Ignore
    pixels (``seg_pad_val`` in the source) land in class ``num_classes``
    and are dropped, exactly like the bincount formulation it replaces
    (mmseg RandomCrop counts classes on the resampled crop)."""
    h, w = label.shape[0], label.shape[1]
    ch, cw = crop_size

    def mults(out_size, in_size, offs):
        def one(off):
            lo, hi, f, v = _window_indices(out_size, in_size, off, scale)
            near = jnp.where(f < 0.5, lo, hi)
            oh = jax.nn.one_hot(near, in_size, dtype=jnp.float32)
            return (oh * v[:, None].astype(jnp.float32)).sum(0)
        return jax.vmap(one)(offs)                     # [T, in_size]

    my = mults(ch, h, cand_y)                          # [T, H]
    mx = mults(cw, w, cand_x)                          # [T, W]
    lab_c = jnp.where(label == seg_pad_val, num_classes, label)
    oh = jax.nn.one_hot(lab_c, num_classes + 1, axis=0,
                        dtype=jnp.float32)             # [C+1, H, W]
    a = jnp.einsum("chw,tw->cth", oh, mx)
    counts = jnp.einsum("cth,th->tc", a, my)           # [T, C+1]
    return counts[:, :num_classes]


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


def _rgb_to_hsv(r: Array, g: Array, b: Array):
    """Planar channels in/out: every intermediate is [H,W] — a stacked
    [H,W,3] chain pads its 3 lanes to 128 on TPU and cost ~107ms of a
    299ms augment batch before the split."""
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
    return h, s, v


def _hsv_to_rgb(h: Array, s: Array, v: Array):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    # select chain, NOT jnp.choose: choose stacks the 6 sextant images and
    # gathers per pixel — measured ~107ms of a 112ms augment batch on v5e
    # (elementwise gather; see CLAUDE.md "Scatter is poison"). Six selects
    # on [H,W] planes cost ~nothing.
    def sextant(c0, c1, c2, c3, c4, c5):
        return jnp.where(i <= 0, c0,
               jnp.where(i == 1, c1,
               jnp.where(i == 2, c2,
               jnp.where(i == 3, c3,
               jnp.where(i == 4, c4, c5)))))
    r = sextant(v, q, p, p, t, v)
    g = sextant(t, v, v, q, p, p)
    b = sextant(p, p, t, v, v, q)
    return r, g, b


def photometric_distortion(rng: Array, img: Array,
                           brightness_delta: float = 32.0,
                           contrast_range: Tuple[float, float] = (0.5, 1.5),
                           saturation_range: Tuple[float, float] = (0.5, 1.5),
                           hue_delta: float = 18.0) -> Array:
    """mmseg PhotoMetricDistortion: random brightness, contrast (random
    order: before or after saturation/hue), saturation, hue — each applied
    with prob 0.5. Input/output 0..255 float [H,W,3]; internals are
    channel-planar (see _rgb_to_hsv) with one stack at the end."""
    ks = jax.random.split(rng, 10)
    rgb = (img[..., 0], img[..., 1], img[..., 2])

    def maybe(k, chans, fn):
        coin = jax.random.uniform(k, ()) < 0.5
        new = fn(chans)
        return tuple(jnp.where(coin, n, o) for n, o in zip(new, chans))

    def brightness(chans):
        d = jax.random.uniform(ks[1], (), minval=-brightness_delta,
                               maxval=brightness_delta)
        return tuple(jnp.clip(c + d, 0, 255) for c in chans)

    rgb = maybe(ks[0], rgb, brightness)

    def contrast(chans):
        alpha = jax.random.uniform(ks[2], (), minval=contrast_range[0],
                                   maxval=contrast_range[1])
        return tuple(jnp.clip(c * alpha, 0, 255) for c in chans)

    def sat_hue(chans):
        h, s, v = _rgb_to_hsv(*(c / 255.0 for c in chans))
        s_mult = jnp.where(
            jax.random.uniform(ks[3], ()) < 0.5,
            jax.random.uniform(ks[4], (), minval=saturation_range[0],
                               maxval=saturation_range[1]), 1.0)
        h_shift = jnp.where(
            jax.random.uniform(ks[5], ()) < 0.5,
            jax.random.uniform(ks[6], (), minval=-hue_delta,
                               maxval=hue_delta) / 360.0, 0.0)
        s = jnp.clip(s * s_mult, 0, 1)
        h = (h + h_shift) % 1.0
        return tuple(jnp.clip(c * 255.0, 0, 255)
                     for c in _hsv_to_rgb(h, s, v))

    contrast_first = jax.random.uniform(ks[7], ()) < 0.5
    pre = maybe(ks[8], rgb, contrast)
    rgb = tuple(jnp.where(contrast_first, p, o) for p, o in zip(pre, rgb))
    rgb = sat_hue(rgb)
    post = maybe(ks[9], rgb, contrast)
    rgb = tuple(jnp.where(contrast_first, o, p) for p, o in zip(post, rgb))
    return jnp.stack(rgb, axis=-1)


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


@functools.partial(jax.jit, static_argnames=(
    "crop_size", "ratio_range", "cat_max_ratio", "num_classes",
    "photometric", "flip_prob"))
def gather_augment_batch(rng: Array, cache_imgs: Array, cache_gts: Array,
                         idx: Array, mean: Array, std: Array,
                         **kw) -> Dict[str, Array]:
    """Fused row-gather + augment for a device-resident dataset cache
    (data/device_cache.py): ONE program per step instead of a gather
    dispatch (~1.9ms on the relay) followed by an augment dispatch
    (~6.6ms) — the fused program costs ~2.7ms (measured, 8x512x512).
    ``cache_imgs``/``cache_gts`` are the full resident tensors, passed as
    arguments (not closure constants) so multi-GB caches are never baked
    into the executable."""
    return augment_batch(rng, cache_imgs[idx], cache_gts[idx],
                         mean, std, **kw)


@functools.partial(jax.jit, static_argnames=(
    "crop_size", "ratio_range", "cat_max_ratio", "num_classes",
    "photometric", "flip_prob"))
def gather_augment_step(carry_key: Array, pos: Array, idx_buf: Array,
                        cache_imgs: Array, cache_gts: Array,
                        mean: Array, std: Array, **kw):
    """Self-advancing device-side feed for a device-resident cache: ONE
    program per step with ZERO per-step host->device traffic.

    The relay charges ~2.5ms latency for ANY host upload (even a 32-byte
    index batch) and ~1ms for a host-dispatched `jax.random.split`
    (measured — see docs/PERF.md). So the feed state lives on device and
    chains through the program: ``carry_key`` advances by the exact
    ``new, k_aug = jax.random.split(key)`` chain the host loop used
    (bit-identical augment streams), ``pos`` indexes a [W,B] index buffer
    uploaded once per W steps. Returns ``(new_key, pos+1, batch)``."""
    ks = jax.random.split(carry_key)
    idx = jax.lax.dynamic_index_in_dim(idx_buf, pos, axis=0,
                                       keepdims=False)
    out = augment_batch(ks[1], cache_imgs[idx], cache_gts[idx],
                        mean, std, **kw)
    return ks[0], pos + 1, out


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


@functools.partial(jax.jit, static_argnames=("size",))
def gather_prepare_eval_batch(cache_imgs: Array, cache_gts: Array,
                              idx: Array, mean: Array, std: Array,
                              pad: Array = None,
                              size: Optional[Tuple[int, int]] = None):
    """Fused row-gather + eval prep for a device-resident cache: one
    program replaces the gather dispatch + prepare_eval_batch dispatch
    (same device-time saving as gather_augment_batch — the relay charges
    ~0.65ms dispatch floor plus an extra HBM round-trip per split program).
    ``pad`` (traced int32) neutralizes the labels of that many wrapped
    tail records to ignore=255 without a per-tail recompile."""
    img = prepare_eval_batch(cache_imgs[idx], mean, std, size=size)
    gt = cache_gts[idx].astype(jnp.int32)
    if pad is not None:
        b = gt.shape[0]
        keep = jnp.arange(b, dtype=jnp.int32) < (b - pad)
        gt = jnp.where(keep[:, None, None], gt, 255)
    return img, gt
