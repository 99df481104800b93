"""Alternative semantic losses: Lovasz-softmax, focal, weighted CE.

Reference: `examples/ScanNet/lovasz_losses.py` (Berman et al. Lovasz-softmax,
flat variant used by the repo) and `examples/ScanNet/utils.py:382-433`
(FocalLoss, WeightedCrossEntropyLoss). Selected via --loss
(`train_instance.py:354-365`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Per-class CE weight tables for --loss weighted_cross_entropy (reference
# `train_instance.py:358-361`, selected by config['dataset']).
SCANNET_CE_WEIGHTS = (
    0.3005, 0.2700, 0.0418, 0.0275, 0.0810, 0.0254, 0.0462, 0.0418,
    0.0297, 0.0277, 0.0061, 0.0065, 0.0194, 0.0150, 0.0060, 0.0036,
    0.0029, 0.0025, 0.0029, 0.0434)
STANFORD_CE_WEIGHTS = (
    0.1861, 0.1586, 0.2663, 0.0199, 0.0039, 0.0210, 0.0210, 0.0575,
    0.0332, 0.0458, 0.0052, 0.0495, 0.0123, 0.1164, 0.0032)


def lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors
    (reference `lovasz_losses.py:19-32`)."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax_flat(probas: jnp.ndarray, labels: jnp.ndarray,
                        valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multi-class Lovasz-softmax over flattened points (reference
    `lovasz_losses.py:141-172`, classes='present' approximated with a
    presence weight so the shape stays static)."""
    P, C = probas.shape
    if valid is None:
        valid = labels >= 0
    labels_safe = jnp.where(valid, labels, 0)
    losses = []
    present = []
    for c in range(C):
        fg = ((labels_safe == c) & valid).astype(jnp.float32)
        errors = jnp.abs(fg - probas[:, c])
        errors = jnp.where(valid, errors, -1.0)  # sink padding to the end
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        n_valid = jnp.sum(valid)
        mask_sorted = (jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
                       < n_valid)
        grad = lovasz_grad(fg_sorted)
        losses.append(jnp.sum(jnp.where(mask_sorted,
                                        jnp.maximum(errors_sorted, 0) * grad,
                                        0)))
        present.append((jnp.sum(fg) > 0).astype(jnp.float32))
    losses = jnp.stack(losses)
    present = jnp.stack(present)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1)


def lovasz_softmax(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return lovasz_softmax_flat(jax.nn.softmax(logits, axis=-1), labels)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               gamma: float = 2.0, alpha: float = 0.25) -> jnp.ndarray:
    """(reference `utils.py:382-407`)."""
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    pt = jnp.exp(-ce)
    loss = alpha * (1 - pt) ** gamma * ce
    loss = jnp.where(valid, loss, 0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1)


def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           weight: jnp.ndarray) -> jnp.ndarray:
    """Per-class weighted CE (reference `utils.py:409-433`)."""
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    w = weight[safe] * valid.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-12)
