"""Loss-family unit tests (CE/dice/focal/mixed/EQL/distill)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaiaseg_tpu.models.losses import (CrossEntropyLoss, DiceLoss,
                                       EQLCrossEntropyLoss, FocalLoss,
                                       MixedLoss, decode_packed_labels,
                                       distill_softened_ce,
                                       pairwise_gram_loss, pixel_accuracy,
                                       softmax_cross_entropy)

KEY = jax.random.PRNGKey(0)


def _data(c=5, n=2, hw=8):
    logits = jax.random.normal(KEY, (n, hw, hw, c))
    label = jax.random.randint(jax.random.PRNGKey(1), (n, hw, hw), 0, c)
    return logits, label


def test_ce_ignore_and_class_weight():
    logits, label = _data()
    label = label.at[:, 0].set(255)
    loss = softmax_cross_entropy(logits, label)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # all-ignored -> zero-safe
    all_ignored = jnp.full_like(label, 255)
    assert float(softmax_cross_entropy(logits, all_ignored)) == 0.0
    # class weights change the value
    w = np.ones(5); w[0] = 2.0
    loss_w = softmax_cross_entropy(logits, label, class_weight=w)
    assert abs(float(loss_w) - float(loss)) > 1e-6


def test_ce_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    logits, label = _data()
    label = label.at[:, 0].set(255)
    ours = float(softmax_cross_entropy(logits, label))
    t = F.cross_entropy(
        torch.tensor(np.asarray(logits)).permute(0, 3, 1, 2),
        torch.tensor(np.asarray(label)).long(), ignore_index=255)
    assert abs(ours - float(t)) < 1e-5


def test_wrappers_and_losses_finite():
    logits, label = _data()
    for loss_fn in (CrossEntropyLoss(), CrossEntropyLoss(use_sigmoid=True),
                    DiceLoss(), FocalLoss(), FocalLoss(use_sigmoid=False),
                    MixedLoss(losses=[dict(type="CrossEntropyLoss"),
                                      dict(type="DiceLoss")],
                              weights=[1.0, 0.5]),
                    EQLCrossEntropyLoss(tail_classes=[3, 4])):
        v = float(loss_fn(logits, label))
        assert np.isfinite(v) and v >= 0, type(loss_fn).__name__


def test_distill_losses():
    logits, _ = _data()
    teacher = logits + 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                               logits.shape)
    v = float(distill_softened_ce(logits, teacher, temperature=2.0))
    assert np.isfinite(v) and v > 0
    same = float(distill_softened_ce(logits, logits))
    diff = float(distill_softened_ce(logits, -logits))
    assert same < diff  # matching teacher -> lower softened CE

    f = jax.random.normal(KEY, (1, 8, 8, 4))
    assert float(pairwise_gram_loss(f, f)) <= float(
        pairwise_gram_loss(f, -f)) + 1e-6


def test_packed_label_decode():
    # class 0 positive (code 1), class 1 negative (code 0),
    # class 2 positive (code 1 << 6)
    label = jnp.asarray([[1 | (1 << 6)]])
    onehot = decode_packed_labels(label, 3)
    np.testing.assert_array_equal(np.asarray(onehot[0, 0]), [1, 0, 1])


def test_accuracy_topk():
    logits, label = _data()
    a1 = float(pixel_accuracy(logits, label))
    a5 = float(pixel_accuracy(logits, label, topk=5))
    assert 0 <= a1 <= a5 <= 1.0 + 1e-6


def test_self_cross_entropy():
    from gaiaseg_tpu.models.losses import self_cross_entropy
    logits = jax.random.normal(KEY, (1, 4, 4, 3))
    # pixel 0: class0 positive; pixel 1: class1 "self"; rest empty
    label = jnp.zeros((1, 4, 4), jnp.int32)
    label = label.at[0, 0, 0].set(1)           # class0 code 1
    label = label.at[0, 0, 1].set(2 << 3)      # class1 code 2
    v = float(self_cross_entropy(logits, label, num_classes=3))
    assert np.isfinite(v) and v > 0
    g = jax.grad(lambda l: self_cross_entropy(l, label, 3))(logits)
    assert np.all(np.isfinite(np.asarray(g)))
