"""Loss parity tests against torch functional implementations."""

import numpy as np
import torch
import torch.nn.functional as TF

from tris_tpu import losses


def test_multilabel_soft_margin_matches_torch(rng):
    x = rng.standard_normal((6, 6)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)
    want = TF.multilabel_soft_margin_loss(torch.from_numpy(x), torch.from_numpy(y)).item()
    got = float(losses.multilabel_soft_margin_loss(x, y))
    assert np.isclose(got, want, rtol=1e-5)


def test_bce_with_logits_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 1)).astype(np.float32) * 3
    y = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    want = TF.binary_cross_entropy_with_logits(torch.from_numpy(x), torch.from_numpy(y)).item()
    got = float(losses.bce_with_logits(x, y))
    assert np.isclose(got, want, rtol=1e-5)


def test_max_loss_clamps():
    sims = np.array([[0.5], [1.5], [-2.0]], np.float32)
    got = float(losses.max_loss(sims))
    want = -np.mean(np.log([0.5, 0.9999, 0.0001]))
    assert np.isclose(got, want, rtol=1e-5)


def test_cbs_loss_matches_reference_loop(rng):
    """Batched CBS == the reference's per-sample python loop
    (train_stage1.py:342-353)."""
    B, S, C = 4, 3, 16
    img = rng.standard_normal((B, C)).astype(np.float32)
    neg = rng.standard_normal((B, S, C)).astype(np.float32)
    got = float(losses.cbs_loss(img, neg))

    total = 0.0
    for i in range(B):
        f = torch.from_numpy(img[i : i + 1])
        t = torch.from_numpy(neg[i])
        f = f / f.norm(dim=-1, keepdim=True)
        t = t / t.norm(dim=-1, keepdim=True)
        score = f @ t.T
        total += float((-(torch.log(1 - score))).mean())
    want = total / B
    assert np.isclose(got, want, rtol=1e-4)


def test_clip_similarity(rng):
    a = rng.standard_normal((5, 8)).astype(np.float32)
    b = rng.standard_normal((5, 8)).astype(np.float32)
    got = np.asarray(losses.clip_similarity(a, b))
    want = np.sum(
        a / np.linalg.norm(a, axis=1, keepdims=True) * (b / np.linalg.norm(b, axis=1, keepdims=True)),
        axis=1,
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_consistency_losses(rng):
    s = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    t = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    mse = float(losses.sigmoid_mse_consistency(s, t))
    want = TF.mse_loss(torch.sigmoid(torch.from_numpy(s)), torch.sigmoid(torch.from_numpy(t))).item()
    assert np.isclose(mse, want, rtol=1e-5)
    kl = float(losses.sigmoid_kl_consistency(s, t))
    assert kl >= 0
    assert np.isclose(float(losses.sigmoid_kl_consistency(s, s)), 0.0, atol=1e-6)
