"""Torch parity for the registered-but-unused reference losses.

The reference registers SoftmaxFocalLoss, BinaryKLDivLoss and
FocalKLLoss (`detr_od/models/losses/`) but no live Semi-DETR config
selects them; they are ported for API completeness and tested here
against torch re-implementations of the reference formulas.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from semi_detr_tpu.models.losses import (binary_kl_div_loss,  # noqa: E402
                                         focal_kl_loss, softmax_focal_loss)


def test_softmax_focal_loss_matches_reference():
    """softmax_focal_loss.py:70-76: CE = cross_entropy, loss =
    (1 - exp(-CE))**gamma * CE, sum reduction."""
    rs = np.random.RandomState(0)
    logits = rs.randn(12, 7).astype(np.float32)
    labels = rs.randint(0, 7, 12)
    gamma = 1.5

    ce = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                         reduction="none")
    want = (((1 - torch.exp(-ce)) ** gamma) * ce).sum().item()
    got = float(softmax_focal_loss(jnp.asarray(logits),
                                   jnp.asarray(labels), gamma=gamma))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    want_none = ((1 - torch.exp(-ce)) ** gamma * ce).numpy()
    got_none = np.asarray(softmax_focal_loss(
        jnp.asarray(logits), jnp.asarray(labels), gamma=gamma,
        reduction="none"))
    np.testing.assert_allclose(got_none, want_none, rtol=1e-5)


@pytest.mark.parametrize("binary", [False, True])
def test_binary_kl_div_matches_reference(binary):
    """binary_kl_div_loss.py:52-74: KL (or symmetric JS over the
    per-class Bernoulli) between sigmoid scores and a soft target."""
    rs = np.random.RandomState(1)
    logits = rs.randn(9, 5).astype(np.float32)
    target = rs.rand(9, 5).astype(np.float32)

    pred = torch.tensor(logits)
    tgt = torch.tensor(target)
    if binary:
        p1 = pred.sigmoid()
        pp = torch.stack((p1, 1 - p1), -1)
        tp = torch.stack((tgt, 1 - tgt), -1)
        m = 0.5 * (pp + tp)
        l1 = F.kl_div((pp + 1e-12).log(), m, reduction="none")
        l2 = F.kl_div((tp + 1e-12).log(), m, reduction="none")
        want = ((l1.sum(-1).sum(-1) + l2.sum(-1).sum(-1)) * 0.5).numpy()
    else:
        want = F.kl_div((pred.sigmoid() + 1e-12).log(), tgt,
                        reduction="none").sum(-1).numpy()
    got = np.asarray(binary_kl_div_loss(jnp.asarray(logits),
                                        jnp.asarray(target),
                                        binary=binary))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_focal_kl_matches_reference():
    """soft_label_focal_loss.py:80-105 (use_sigmoid=True): symmetric
    binary KL scaled by ((t - p)^2 + 1e-6)**(gamma/2), mean-reduced."""
    rs = np.random.RandomState(2)
    logits = rs.randn(8, 6).astype(np.float32)
    target = rs.rand(8, 6).astype(np.float32)
    gamma = 0.5

    pred = torch.tensor(logits)
    tgt = torch.tensor(target)
    logp = F.logsigmoid(pred)
    loss_p = F.kl_div(logp, tgt, reduction="none")
    logn = -pred + logp
    loss_n = F.kl_div(logn, 1 - tgt, reduction="none")
    sig = pred.sigmoid()
    focal = ((tgt - sig) ** 2 + 1e-6) ** (0.5 * gamma)
    want = (focal * (loss_p + loss_n)).mean().item()

    got = float(focal_kl_loss(jnp.asarray(logits), jnp.asarray(target),
                              gamma=gamma))
    np.testing.assert_allclose(got, want, rtol=1e-4)
