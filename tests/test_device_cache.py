"""Device-resident dataset cache (data/device_cache.py): batches served
from HBM row gathers must match the streaming host path bit-for-bit, and
the train/eval engines must run unchanged on a cached dataset — the
TPU-native replacement for the reference's DataLoader worker overlap
(SURVEY.md §3.1: workers exist only to hide host->device transfer)."""
import os.path as osp

import numpy as np
import pytest

from gaiaseg_tpu.data.datasets import SyntheticDataset, build_dataset
from gaiaseg_tpu.data.device_cache import (DeviceCachedDataset,
                                           maybe_device_cache)
from gaiaseg_tpu.data.loader import BatchLoader

CFG = osp.join(osp.dirname(__file__), "..", "configs", "tests",
               "tiny_synthetic.py")


def _base(n=10, size=(32, 32)):
    return SyntheticDataset(length=n, size=size, num_classes=19, cells=4)


def test_cached_batches_match_streaming():
    ds = _base()
    c = DeviceCachedDataset(ds)
    idx = np.array([3, 7, 0, 9])
    b = c.read_batch(idx)
    assert np.array_equal(np.asarray(b["img"]),
                          np.stack([ds[i]["img"] for i in idx]))
    # labels ride uint8 (trainIds + ignore fit); values identical
    assert np.asarray(b["gt"]).dtype == np.uint8
    assert np.array_equal(np.asarray(b["gt"]),
                          np.stack([ds[i]["gt"] for i in idx]))
    # dataset protocol delegates to the base
    assert len(c) == len(ds) and c.num_classes == ds.num_classes
    assert np.array_equal(c[2]["img"], ds[2]["img"])


def test_padded_tail_uses_gather_path():
    c = DeviceCachedDataset(_base(n=10))
    batches = list(BatchLoader(c, 4, shuffle=False, drop_last=False,
                               prefetch=0))
    assert len(batches) == 3
    tail = batches[-1]
    assert tail.get("pad_count") == 2
    # wrapped records: indices 8,9 then wrap to 0,1
    assert np.array_equal(np.asarray(tail["img"][2]), _base()[0]["img"])


def test_budget_fallback_streams():
    ds = _base()
    assert maybe_device_cache(ds, 1e-9) is ds          # numeric GB budget
    assert maybe_device_cache(ds, False) is ds
    assert isinstance(maybe_device_cache(ds, True), DeviceCachedDataset)


def test_build_dataset_device_cache_key():
    ds = build_dataset(dict(type="SyntheticDataset", length=6,
                            size=(16, 16), device_cache=True))
    assert isinstance(ds, DeviceCachedDataset)


def test_index_only_loader_yields_indices():
    c = DeviceCachedDataset(_base(n=10))
    batches = list(BatchLoader(c, 4, shuffle=True, seed=3, drop_last=True,
                               prefetch=0, index_only=True))
    assert len(batches) == 2
    for b in batches:
        assert set(b) == {"idx"} and b["idx"].dtype == np.int32
    ref = list(BatchLoader(c, 4, shuffle=True, seed=3, drop_last=True,
                           prefetch=0))
    for b, r in zip(batches, ref):
        assert np.array_equal(b["idx"], r["idx"])


def test_fused_gather_augment_matches_split():
    """gather_augment_batch(key, cache, idx) must equal gather -> augment
    as two dispatches with the same key (the fused path replaces the split
    one on the device-cache train loop)."""
    import jax
    import jax.numpy as jnp

    from gaiaseg_tpu.data.transforms import (augment_batch,
                                             gather_augment_batch)
    c = DeviceCachedDataset(_base(n=8, size=(32, 32)))
    idx = jnp.asarray([5, 1, 6, 2], jnp.int32)
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])
    kw = dict(crop_size=(24, 24), ratio_range=(0.75, 1.5),
              cat_max_ratio=0.75, num_classes=19, photometric=True,
              flip_prob=0.5)
    key = jax.random.PRNGKey(42)
    split = augment_batch(key, c._imgs[idx], c._gts[idx], mean, std, **kw)
    fused = gather_augment_batch(key, c._imgs, c._gts, idx, mean, std, **kw)
    assert np.array_equal(np.asarray(split["img"], np.float32),
                          np.asarray(fused["img"], np.float32))
    assert np.array_equal(np.asarray(split["gt"]), np.asarray(fused["gt"]))


def test_device_feed_chain_matches_host_split_chain():
    """gather_augment_step's in-program key chain must reproduce the host
    loop's `box, k = split(box)` sequence exactly — the device-resident
    feed is only legal because the augment stream stays bit-identical to
    the streaming path's."""
    import jax
    import jax.numpy as jnp

    from gaiaseg_tpu.data.transforms import (augment_batch,
                                             gather_augment_step)
    c = DeviceCachedDataset(_base(n=12, size=(32, 32)))
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])
    kw = dict(crop_size=(24, 24), ratio_range=(0.75, 1.5),
              cat_max_ratio=0.75, num_classes=19, photometric=True,
              flip_prob=0.5)
    idx_buf = jnp.asarray([[0, 5], [7, 2], [11, 3]], jnp.int32)

    key = jax.random.PRNGKey(7)
    pos = jnp.zeros((), jnp.int32)
    dev_out = []
    for _ in range(3):
        key, pos, out = gather_augment_step(key, pos, idx_buf,
                                            c._imgs, c._gts,
                                            mean, std, **kw)
        dev_out.append(out)
    assert int(pos) == 3

    box = jax.random.PRNGKey(7)
    for j in range(3):
        box, k_aug = jax.random.split(box)
        ref = augment_batch(k_aug, c._imgs[idx_buf[j]], c._gts[idx_buf[j]],
                            mean, std, **kw)
        assert np.array_equal(np.asarray(ref["img"], np.float32),
                              np.asarray(dev_out[j]["img"], np.float32))
        assert np.array_equal(np.asarray(ref["gt"]),
                              np.asarray(dev_out[j]["gt"]))
    assert np.array_equal(np.asarray(box), np.asarray(key))


@pytest.mark.slow
def test_train_runs_on_cached_dataset(tmp_path):
    from gaiaseg_tpu.engine import train_segmentor
    from gaiaseg_tpu.models import build_segmentor
    from gaiaseg_tpu.utils import Config
    cfg = Config.fromfile(CFG)
    cfg["data"]["train"]["device_cache"] = True
    cfg["runner"] = dict(max_iters=4)
    cfg["evaluation"] = dict(interval=1000)
    cfg["checkpoint_config"] = dict(interval=1000)
    model = build_segmentor(cfg["model"],
                            test_cfg=cfg["model"].get("test_cfg"))
    state, history = train_segmentor(model, cfg, work_dir=str(tmp_path),
                                     seed=0)
    assert int(state.step) == 4
    assert all(np.isfinite(h["loss"]) for h in history["loss"])


@pytest.mark.slow  # >15s on the 1-core box
def test_eval_cm_identical_cached_vs_streaming():
    import jax.numpy as jnp
    from gaiaseg_tpu.engine.evaluate import evaluate
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.utils import Config
    cfg = Config.fromfile(CFG)
    model = build_segmentor(cfg["model"],
                            test_cfg=cfg["model"].get("test_cfg"))
    import jax
    ds = _base(n=5, size=(32, 32))
    arch = encode_arch(model_max_arch(cfg["model"]))
    k = jax.random.PRNGKey(0)
    v = model.init({"params": k, "dropout": k},
                   jnp.zeros((1, 32, 32, 3), jnp.bfloat16),
                   jnp.zeros((1, 32, 32), jnp.int32), arch,
                   method="forward_train")
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    m_stream = evaluate(model, v, ds, arch, batch_size=2)
    m_cached = evaluate(model, v, DeviceCachedDataset(ds), arch,
                        batch_size=2)
    assert m_stream == m_cached
