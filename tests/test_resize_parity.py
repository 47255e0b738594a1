"""Numerical parity of resize/pool primitives vs torch (CPU reference)."""
import numpy as np
import pytest

from gaiaseg_tpu.ops.resize import adaptive_avg_pool2d, resize_bilinear

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(*shape):
    rng = np.random.RandomState(0)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("size", [(13, 17), (32, 48), (5, 5)])
def test_bilinear_matches_torch(align, size):
    x = _rand(2, 9, 11, 4)
    out = np.asarray(resize_bilinear(x, size, align_corners=align))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
                        mode="bilinear", align_corners=align)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scale", [1, 2, 3, 6, 7])
def test_adaptive_pool_matches_torch(scale):
    x = _rand(2, 19, 23, 3)
    out = np.asarray(adaptive_avg_pool2d(x, scale))
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                                scale).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
