"""Losses vs torch oracles (torch-cpu is the ground truth for reduction
semantics the reference relies on)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cswin_unet_tpu import losses


def _data(rng, B=2, H=6, W=6, C=5):
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C, (B, H, W)).astype(np.int32)
    return logits, labels


def test_cross_entropy_matches_torch(rng):
    logits, labels = _data(rng)
    got = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels.astype(np.int64)),
    ).item()
    assert abs(got - want) < 1e-5


def test_weighted_cross_entropy_matches_torch(rng):
    logits, labels = _data(rng)
    w = rng.uniform(0.1, 2.0, 5).astype(np.float32)
    got = float(
        losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
    )
    want = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels.astype(np.int64)),
        weight=torch.from_numpy(w),
    ).item()
    assert abs(got - want) < 1e-5


def test_dice_loss_matches_reference_formula(rng):
    """Reference DiceLoss (utils.py:9-45): per-class soft dice over the whole
    batch slab, averaged over all classes incl. background."""
    logits, labels = _data(rng)
    C = 5
    probs = torch.softmax(torch.from_numpy(logits.transpose(0, 3, 1, 2)), dim=1).numpy()
    total = 0.0
    for i in range(C):
        p = probs[:, i]
        t = (labels == i).astype(np.float32)
        smooth = 1e-5
        dice = (2 * (p * t).sum() + smooth) / ((p * p).sum() + (t * t).sum() + smooth)
        total += 1 - dice
    want = total / C
    got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels), C))
    assert abs(got - want) < 1e-5


def test_focal_loss_matches_reference_formula(rng):
    """FocalLoss (universal_train.py:141-190): weighted per-pixel CE
    (reduction='none'), pt=exp(-ce), mean of alpha*(1-pt)^gamma*ce."""
    logits, labels = _data(rng)
    w = rng.uniform(0.0, 2.0, 5).astype(np.float32)
    alpha, gamma = 1.0, 4.0
    ce = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels.astype(np.int64)),
        weight=torch.from_numpy(w),
        reduction="none",
    )
    pt = torch.exp(-ce)
    want = (alpha * (1 - pt) ** gamma * ce).mean().item()
    got = float(
        losses.focal_loss(
            jnp.asarray(logits), jnp.asarray(labels),
            alpha=alpha, gamma=gamma, class_weights=jnp.asarray(w),
        )
    )
    assert abs(got - want) < 1e-5


def test_kd_loss_matches_torch(rng):
    logits, _ = _data(rng)
    old = rng.standard_normal(logits.shape).astype(np.float32)
    T = 3.0
    # Reference knowledge_distillation_loss (universal_train.py:618-623),
    # channel dim=1 in torch NCHW == last dim here.
    lt = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    ot = torch.from_numpy(old.transpose(0, 3, 1, 2))
    want = (
        F.kl_div(
            F.log_softmax(lt / T, dim=1), F.softmax(ot / T, dim=1),
            reduction="batchmean",
        )
        * T * T
    ).item()
    got = float(losses.kd_loss(jnp.asarray(logits), jnp.asarray(old), T))
    assert abs(got - want) / max(abs(want), 1) < 1e-5


def test_segmentation_loss_composition(rng):
    logits, labels = _data(rng)
    total, aux = losses.segmentation_loss(jnp.asarray(logits), jnp.asarray(labels), 5)
    assert abs(float(total) - (0.4 * float(aux["loss_ce"]) + 0.6 * float(aux["loss_dice"]))) < 1e-6
