"""Data pipeline tests: fused resize+crop semantics, augmentation batch,
loader sharding, mIoU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaiaseg_tpu.data import (BatchLoader, SegEvaluator, SyntheticDataset,
                              augment_batch, confusion_matrix,
                              fused_resize_crop, iou_from_confusion,
                              random_scale_crop)


def test_fused_resize_crop_identity():
    """scale=1, offset=0 -> plain crop."""
    rng = np.random.RandomState(0)
    img = rng.rand(16, 20, 3).astype(np.float32) * 255
    label = rng.randint(0, 5, (16, 20)).astype(np.int32)
    out_img, out_lab, valid = fused_resize_crop(
        jnp.asarray(img), jnp.asarray(label), jnp.float32(1.0),
        jnp.int32(2), jnp.int32(3), (8, 8))
    np.testing.assert_allclose(np.asarray(out_img), img[2:10, 3:11],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_lab), label[2:10, 3:11])
    assert np.all(np.asarray(valid))


def test_fused_resize_crop_pads_when_small():
    """scale shrinks image below crop -> padded region: img 0, label 255."""
    img = jnp.ones((16, 16, 3), jnp.float32) * 100
    label = jnp.zeros((16, 16), jnp.int32)
    out_img, out_lab, valid = fused_resize_crop(
        img, label, jnp.float32(0.5), jnp.int32(0), jnp.int32(0), (16, 16))
    v = np.asarray(valid)
    assert v[:8, :8].all() and not v[8:, 8:].any()
    assert np.all(np.asarray(out_lab)[8:, :] == 255)
    assert np.all(np.asarray(out_img)[8:, :, :] == 0)


def test_random_scale_crop_cat_max_ratio():
    """A label that is 99% class 0 except one corner: cat_max_ratio should
    prefer crops containing the minority class when one exists."""
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((32, 32, 3), jnp.float32)
    label = jnp.zeros((32, 32), jnp.int32).at[:16, :16].set(1)
    found_mixed = 0
    for i in range(5):
        _, lab, _ = random_scale_crop(
            jax.random.PRNGKey(i), img, label, (16, 16),
            ratio_range=(1.0, 1.0), cat_max_ratio=0.75, num_classes=2)
        lab = np.asarray(lab)
        counts = np.bincount(lab[lab != 255], minlength=2)
        if counts.sum():
            found_mixed += int(counts.max() / counts.sum() < 0.9)
    assert found_mixed >= 3


def test_augment_batch_shapes_dtypes():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    labels = rng.randint(0, 5, (2, 32, 32)).astype(np.int32)
    out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs),
                        jnp.asarray(labels),
                        jnp.asarray([123.675, 116.28, 103.53]),
                        jnp.asarray([58.395, 57.12, 57.375]),
                        crop_size=(16, 16), num_classes=5)
    assert out["img"].shape == (2, 16, 16, 3)
    assert out["img"].dtype == jnp.bfloat16
    assert out["gt"].shape == (2, 16, 16)
    assert out["gt"].dtype == jnp.int32
    lab = np.asarray(out["gt"])
    assert np.all((lab == 255) | ((lab >= 0) & (lab < 5)))


def test_synthetic_dataset_and_loader():
    ds = SyntheticDataset(length=10, size=(16, 16), num_classes=4)
    rec = ds[0]
    assert rec["img"].shape == (16, 16, 3) and rec["gt"].shape == (16, 16)
    rec2 = ds[0]
    np.testing.assert_array_equal(rec["img"], rec2["img"])  # deterministic

    loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["img"].shape == (4, 16, 16, 3)

    # sharding partitions the index set
    l0 = BatchLoader(ds, 2, shard_id=0, num_shards=2, prefetch=0,
                     drop_last=False)
    l1 = BatchLoader(ds, 2, shard_id=1, num_shards=2, prefetch=0,
                     drop_last=False)
    seen = set()
    for b in list(l0) + list(l1):
        seen.update(b["idx"].tolist())
    assert seen == set(range(10))

    # non-drop_last pads the tail
    l2 = BatchLoader(ds, 4, drop_last=False, prefetch=0)
    bs = list(l2)
    assert len(bs) == 3 and bs[-1].get("pad_count") == 2


def test_infinite_loader_smaller_dataset_than_batch():
    """Regression: a dataset (or shard) smaller than the global batch must
    still yield batches in infinite mode — the index stream straddles epoch
    boundaries (reference InfiniteSampler semantics). Previously the
    prefetch worker livelocked: drop_last discarded every epoch's tail, so
    a 4-image set at global batch 8 produced nothing, forever."""
    ds = SyntheticDataset(length=4, size=(8, 8), num_classes=4)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                         infinite=True, prefetch=0)
    it = iter(loader)
    seen = set()
    for _ in range(3):
        b = next(it)
        assert b["img"].shape == (8, 8, 8, 3)
        seen.update(b["idx"].tolist())
    assert seen == set(range(4))  # every record participates

    # empty shard fails loudly instead of spinning
    empty = BatchLoader(ds, 2, shard_id=5, num_shards=6, infinite=True,
                        prefetch=0)
    with np.testing.assert_raises(ValueError):
        next(iter(empty))


def test_confusion_and_miou():
    pred = jnp.asarray([[0, 1], [2, 2]])
    label = jnp.asarray([[0, 1], [255, 1]])
    cm = np.asarray(confusion_matrix(pred, label, 3))
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[1, 2] == 1
    assert cm.sum() == 3  # ignored pixel dropped
    res = iou_from_confusion(cm)
    assert res["aAcc"] == 2 / 3
    np.testing.assert_allclose(res["IoU"][0], 1.0)
    np.testing.assert_allclose(res["IoU"][1], 0.5)

    ev = SegEvaluator(3, ["a", "b", "c"])
    ev.update(pred, label)
    ev.update(pred, label)
    out = ev.evaluate()
    assert abs(out["IoU.a"] - 1.0) < 1e-6
    assert out["aAcc"] == 2 / 3


def test_fused_resize_crop_matches_resize_then_crop():
    """For a fixed scale/offset, the fused window resample equals
    full-image bilinear resize followed by a plain crop."""
    rng = np.random.RandomState(3)
    img = rng.rand(16, 20, 3).astype(np.float32) * 255
    label = rng.randint(0, 5, (16, 20)).astype(np.int32)
    scale = 2.0
    oy, ox = 5, 7
    ch, cw = 12, 16
    out_img, out_lab, valid = fused_resize_crop(
        jnp.asarray(img), jnp.asarray(label), jnp.float32(scale),
        jnp.int32(oy), jnp.int32(ox), (ch, cw))
    full = jax.image.resize(jnp.asarray(img), (32, 40, 3), "bilinear",
                            antialias=False)
    np.testing.assert_allclose(np.asarray(out_img),
                               np.asarray(full[oy:oy + ch, ox:ox + cw]),
                               rtol=1e-4, atol=1e-3)
    assert np.all(np.asarray(valid))
    # label: nearest sampling stays within the original label set
    assert set(np.unique(np.asarray(out_lab))) <= set(range(5))


def test_confusion_matrix_matches_numpy_bincount():
    """MXU one-hot-matmul CM == numpy bincount on random batched data with
    ignore pixels (exactness proof for the scatter-free formulation)."""
    rng = np.random.RandomState(0)
    pred = rng.randint(0, 5, size=(3, 17, 23))
    label = rng.randint(0, 6, size=(3, 17, 23))
    label[label == 5] = 255
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(label),
                                     5))
    v = label != 255
    ref = np.bincount((label[v] * 5 + pred[v]).ravel(),
                      minlength=25).reshape(5, 5)
    np.testing.assert_array_equal(cm, ref)


def test_trial_histograms_match_gather_bincount():
    """The separable-multiplicity histogram (no gather, no scatter) must be
    integer-exact against the direct formulation: nearest-resample the
    label window per candidate origin, then bincount — including source
    ignore pixels and out-of-image padding."""
    from gaiaseg_tpu.data.transforms import (_label_window,
                                             _trial_histograms)
    rng = np.random.RandomState(3)
    label = rng.randint(0, 5, (24, 20)).astype(np.int32)
    label[3:6, 4:9] = 255  # source ignore pixels
    label = jnp.asarray(label)
    for scale in (0.4, 0.75, 1.0, 1.6):
        cand_y = jnp.asarray(rng.randint(0, 8, (6,)), jnp.int32)
        cand_x = jnp.asarray(rng.randint(0, 8, (6,)), jnp.int32)
        fast = np.asarray(_trial_histograms(
            label, jnp.float32(scale), cand_y, cand_x, (12, 10), 5, 255))
        for t in range(6):
            lab = np.asarray(_label_window(
                label, jnp.float32(scale), cand_y[t], cand_x[t],
                (12, 10), 255))
            ref = np.bincount(np.where(lab == 255, 5, lab).reshape(-1),
                              minlength=6)[:5]
            np.testing.assert_array_equal(fast[t].astype(np.int64), ref)


def test_hsv_select_chain_matches_choose_and_roundtrips():
    """_hsv_to_rgb's sextant select chain must match the np.choose gather
    formulation it replaced, and rgb->hsv->rgb must round-trip."""
    from gaiaseg_tpu.data.transforms import _hsv_to_rgb, _rgb_to_hsv
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    s = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    v = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    r, g, b = (np.asarray(c) for c in _hsv_to_rgb(h, s, v))

    i = np.floor(np.asarray(h) * 6.0)
    f = np.asarray(h) * 6.0 - i
    p = np.asarray(v) * (1 - np.asarray(s))
    q = np.asarray(v) * (1 - np.asarray(s) * f)
    t = np.asarray(v) * (1 - np.asarray(s) * (1 - f))
    vv = np.asarray(v)
    idx = np.clip(i.astype(np.int64), 0, 5)
    np.testing.assert_array_equal(r, np.choose(idx, [vv, q, p, p, t, vv]))
    np.testing.assert_array_equal(g, np.choose(idx, [t, vv, vv, q, p, p]))
    np.testing.assert_array_equal(b, np.choose(idx, [p, p, t, vv, vv, q]))

    h2, s2, v2 = _rgb_to_hsv(*_hsv_to_rgb(h, s, v))
    r2, g2, b2 = _hsv_to_rgb(h2, s2, v2)
    np.testing.assert_allclose(np.asarray(r2), r, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), g, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), b, atol=1e-5)


def test_device_prefetch_orders_and_propagates():
    """device_prefetch preserves source order, runs prep exactly once per
    item (deterministic closures stay deterministic), and re-raises prep
    exceptions at the consumer."""
    from gaiaseg_tpu.data.loader import device_prefetch

    calls = []

    def prep(x):
        calls.append(x)
        return x * 10

    out = list(device_prefetch(iter(range(7)), prep, depth=2))
    assert out == [0, 10, 20, 30, 40, 50, 60]
    assert calls == list(range(7))

    def bad(x):
        if x == 3:
            raise ValueError("boom")
        return x

    got = []
    with pytest.raises(ValueError, match="boom"):
        for v in device_prefetch(iter(range(10)), bad, depth=2):
            got.append(v)
    assert got == [0, 1, 2]
