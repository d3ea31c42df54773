"""Segmentation losses — pure JAX functions over logits/labels.

Formula-level parity with the reference:
  * soft Dice over ALL classes including background, per-class
    (2·Σpq + ε)/(Σp² + Σq² + ε) with ε=1e-5 averaged over classes
    (reference ``utils.py:9-45``);
  * pixel-mean cross entropy (torch ``CrossEntropyLoss`` default);
  * focal loss with class weights, α·(1-pt)^γ·CE, mean over pixels; the
    weighted CE uses torch's weighted-mean reduction semantics per-element
    (reference ``universal_train.py:141-190`` uses reduction='none' then
    .mean(), i.e. an UNWEIGHTED mean of weighted per-pixel CE — reproduced);
  * KD loss KL(log_softmax(new/T) ‖ softmax(old/T))·T² with batchmean
    reduction (reference ``universal_train.py:618-623``).

All take NHWC logits (B, H, W, C) and integer labels (B, H, W); every loss
reduces to a scalar f32. Computation is f32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    class_weights: jnp.ndarray | None = None,
    *,
    apply_softmax: bool = True,
) -> jnp.ndarray:
    """Soft Dice averaged over all classes (background included)."""
    probs = logits.astype(jnp.float32)
    if apply_softmax:
        probs = jax.nn.softmax(probs, axis=-1)
    target = one_hot(labels, num_classes)
    smooth = 1e-5
    # Sums over batch and spatial dims jointly — the reference's _dice_loss
    # sums over the whole (B, H, W) slab per class (utils.py:22-30).
    intersect = jnp.sum(probs * target, axis=(0, 1, 2))
    z = jnp.sum(probs * probs, axis=(0, 1, 2))
    y = jnp.sum(target, axis=(0, 1, 2))  # target² == target for one-hot
    per_class = 1.0 - (2.0 * intersect + smooth) / (z + y + smooth)
    if class_weights is not None:
        per_class = per_class * class_weights
    return jnp.sum(per_class) / num_classes


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pixel cross entropy. With class_weights, uses torch's weighted-mean
    reduction: Σ w_y·CE / Σ w_y."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = class_weights[labels]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    alpha: float = 1.0,
    gamma: float = 4.0,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Focal loss as the reference computes it: per-pixel weighted CE
    (reduction='none'), pt = exp(-ce), mean over pixels."""
    num_classes = logits.shape[-1]
    labels = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        ce = ce * class_weights[labels]
    # Defensive numerics (reference universal_train.py:167-179): NaN/Inf in
    # the per-pixel CE fall back to small/large constants, and a non-finite
    # final value falls back to 1e-3, so one bad batch can't kill a run.
    ce = jnp.nan_to_num(ce, nan=1e-6, posinf=10.0, neginf=1e-6)
    pt = jnp.exp(-ce)
    focal = alpha * (1.0 - pt) ** gamma * ce
    result = jnp.mean(focal)
    return jnp.where(jnp.isfinite(result), result, 1e-3)


def kd_loss(
    logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature: float = 3.0,
) -> jnp.ndarray:
    """KL(log_softmax(new/T) ‖ softmax(old/T)) · T², batchmean over the
    leading axis (torch kl_div(reduction='batchmean') divides the total KL
    by batch size only — spatial dims are summed, not averaged)."""
    t = temperature
    logp = jax.nn.log_softmax(logits.astype(jnp.float32) / t, axis=-1)
    q = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    logq = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl = jnp.sum(q * (logq - logp))
    return kl / logits.shape[0] * (t * t)


def segmentation_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    *,
    ce_weight: float = 0.4,
    dice_weight: float = 0.6,
) -> tuple[jnp.ndarray, dict]:
    """The base training loss 0.4·CE + 0.6·Dice (reference trainer.py:55-57)."""
    l_ce = cross_entropy_loss(logits, labels)
    l_dice = dice_loss(logits, labels, num_classes)
    total = ce_weight * l_ce + dice_weight * l_dice
    return total, {"loss": total, "loss_ce": l_ce, "loss_dice": l_dice}
