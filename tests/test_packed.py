"""Native packed-dataset round trip: pack -> mmap read -> batch loader."""
import numpy as np
import pytest

from gaiaseg_tpu.data import BatchLoader, SyntheticDataset


def _native_available():
    try:
        from gaiaseg_tpu.native import load_packio
        load_packio()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _native_available(),
                                reason="no C++ toolchain")


def test_pack_roundtrip(tmp_path):
    from gaiaseg_tpu.data.packed import PackedDataset, pack_dataset
    ds = SyntheticDataset(length=7, size=(24, 16), num_classes=5)
    path = str(tmp_path / "ds.gsegpack")
    pack_dataset(ds, path)

    pd = PackedDataset(path, classes=ds.CLASSES)
    assert len(pd) == 7
    assert (pd.h, pd.w) == (24, 16)
    for i in (0, 3, 6):
        rec = pd[i]
        np.testing.assert_array_equal(rec["img"], ds[i]["img"])
        np.testing.assert_array_equal(rec["gt"], ds[i]["gt"])

    # native batch gather in arbitrary order, multithreaded
    b = pd.read_batch(np.asarray([6, 0, 2]))
    np.testing.assert_array_equal(b["img"][0], ds[6]["img"])
    np.testing.assert_array_equal(b["gt"][2], ds[2]["gt"])
    # u8 = the on-disk dtype; consumers cast on device (4x fewer wire bytes)
    assert b["gt"].dtype == np.uint8

    # BatchLoader takes the native fast path
    loader = BatchLoader(pd, batch_size=3, shuffle=True, prefetch=0)
    batch = next(iter(loader))
    assert batch["img"].shape == (3, 24, 16, 3)
    assert batch["gt"].shape == (3, 24, 16)


def test_pack_resize(tmp_path):
    from gaiaseg_tpu.data.packed import PackedDataset, pack_dataset
    ds = SyntheticDataset(length=3, size=(16, 16), num_classes=4)
    path = str(tmp_path / "rs.gsegpack")
    pack_dataset(ds, path, size=(8, 8))
    pd = PackedDataset(path)
    assert (pd.h, pd.w) == (8, 8)
    rec = pd[0]
    assert rec["img"].shape == (8, 8, 3)
    assert set(np.unique(rec["gt"])) <= set(range(4)) | {255}


def test_augment_u8_labels_match_i32():
    """augment_batch over uint8 labels (the packed wire dtype) is
    bit-identical to the int32 path — crop trials, ignore handling,
    flip, and the final int32 cast included."""
    import jax
    import jax.numpy as jnp

    from gaiaseg_tpu.data.transforms import augment_batch

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randint(0, 255, (2, 24, 20, 3), np.uint8))
    gt8 = rng.randint(0, 5, (2, 24, 20)).astype(np.uint8)
    gt8[:, 2:5, 3:8] = 255
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])
    kw = dict(crop_size=(12, 10), ratio_range=(0.5, 2.0),
              cat_max_ratio=0.75, num_classes=5, photometric=True)
    a = augment_batch(jax.random.PRNGKey(0), img, jnp.asarray(gt8),
                      mean, std, **kw)
    b = augment_batch(jax.random.PRNGKey(0), img,
                      jnp.asarray(gt8.astype(np.int32)), mean, std, **kw)
    np.testing.assert_array_equal(np.asarray(a["gt"]), np.asarray(b["gt"]))
    np.testing.assert_array_equal(np.asarray(a["img"], np.float32),
                                  np.asarray(b["img"], np.float32))


def test_packed_dataset_registered_from_package_import(tmp_path):
    """PackedDataset must be buildable through the dataset registry after a
    plain ``import gaiaseg_tpu.data`` — the CLI path (tools/train_supernet.py
    with a PackedDataset config, e.g. scripts/soak_test.sh) never imports
    data.packed explicitly. Run in a fresh interpreter so registration can't
    be satisfied by this test module's own imports."""
    import subprocess
    import sys

    from gaiaseg_tpu.data.datasets import SyntheticDataset
    from gaiaseg_tpu.data.packed import pack_dataset

    path = str(tmp_path / "tiny.gsegpack")
    pack_dataset(SyntheticDataset(length=2, size=(16, 16), num_classes=4,
                                  cells=2), path)
    code = (
        "from gaiaseg_tpu.data import build_dataset\n"
        f"ds = build_dataset(dict(type='PackedDataset', path={path!r},\n"
        "                        classes=['a', 'b', 'c', 'd']))\n"
        "assert len(ds) == 2\n"
        "print('registry ok')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "registry ok" in out.stdout
