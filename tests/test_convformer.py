"""ElasticConvformer: dual-branch forward shapes, masking, depth gating."""
import jax
import jax.numpy as jnp
import numpy as np

from gaiaseg_tpu.models import build_backbone
from gaiaseg_tpu.models.arch_util import backbone_max_arch
from gaiaseg_tpu.ops.masking import tree_to_ints
import pytest

F32 = jnp.float32

CFG = dict(type="ElasticConvformer", stem_width=8,
           body_width=(16, 32, 64), body_depth=(2, 2, 2),
           embed_dim=64, num_heads=1, mlp_ratio=20, patch_size=16,
           out_indices=(0, 1, 2, 3), dtype=F32)


@pytest.mark.slow  # >15s on the 1-core box
def test_convformer_shapes():
    bb = build_backbone(CFG)
    max_arch = backbone_max_arch(CFG)
    arch = tree_to_ints(max_arch)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), F32)
    v = bb.init(jax.random.PRNGKey(1), x, arch)
    outs = bb.apply(v, x, arch)
    assert [o.shape for o in outs] == [
        (2, 16, 16, 16), (2, 8, 8, 32), (2, 4, 4, 64), (2, 2, 2, 64)]
    assert all(np.all(np.isfinite(np.asarray(o, np.float32)))
               for o in outs)


@pytest.mark.slow  # >15s-ish on the 1-core box
def test_convformer_masking_and_depth():
    bb = build_backbone(CFG)
    max_arch = backbone_max_arch(CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), F32)
    v = bb.init(jax.random.PRNGKey(1), x, tree_to_ints(max_arch))

    sub = {
        "stem": {"width": 8},
        "body": {
            "depth": [1, 1, 1],
            "block": {
                "convblock": {"width": [8, 16, 32]},
                "embed_dim": {"width": 32},
                "transblock": {
                    "MHA": {"num_heads": [1, 1, 1]},
                    "FFN": {"feedforward_channels": [10, 10, 10]},
                },
            },
        },
    }
    outs = bb.apply(v, x, tree_to_ints(sub))
    o1 = np.asarray(outs[1])
    assert np.all(o1[..., 16:] == 0) and np.any(o1[..., :16] != 0)
    # different depth -> different activations (depth gating is live)
    sub2 = {**sub, "body": {**sub["body"], "depth": [2, 1, 1]}}
    outs2 = bb.apply(v, x, tree_to_ints(sub2))
    assert not np.allclose(np.asarray(outs2[0]), np.asarray(outs[0]))
