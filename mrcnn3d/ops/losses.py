"""Weighted detection losses (pure jnp).

Semantics match reference mmdet/core/loss/losses.py:8-130, with one
jit-driven change: `avg_factor` is always passed explicitly (the reference
computes it host-side from `weight > 0` counts; here callers compute it
in-graph), so every loss is a pure traced function of arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, labels):
    """Numerically-stable elementwise binary CE with logits."""
    # max(x,0) - x*y + log(1 + exp(-|x|))
    return (
        jnp.clip(logits, 0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def weighted_cross_entropy(logits, labels, weight, avg_factor):
    """Softmax CE; logits (N, C), labels (N,) int, weight (N,)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    raw = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.sum(raw * weight) / avg_factor


def weighted_binary_cross_entropy(logits, labels, weight, avg_factor):
    """Sigmoid BCE; shapes broadcastable; labels float or int."""
    raw = _bce_with_logits(logits, labels.astype(logits.dtype))
    return jnp.sum(raw * weight) / avg_factor


def expand_binary_labels(labels, label_weights, label_channels):
    """1-based class labels -> one-hot binary targets (reference :118-126)."""
    bin_labels = (
        jax.nn.one_hot(labels - 1, label_channels, dtype=jnp.float32)
        * (labels >= 1)[:, None]
    )
    bin_weights = jnp.broadcast_to(
        label_weights[:, None], (labels.shape[0], label_channels)
    )
    return bin_labels, bin_weights


def smooth_l1(pred, target, beta):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def weighted_smoothl1(pred, target, weight, beta, avg_factor):
    return jnp.sum(smooth_l1(pred, target, beta) * weight) / avg_factor


def weighted_sigmoid_focal_loss(
    logits, target, weight, avg_factor, gamma=2.0, alpha=0.25
):
    """Focal loss (reference py_sigmoid_focal_loss :35-55); target one-hot."""
    p = jax.nn.sigmoid(logits)
    t = target.astype(logits.dtype)
    pt = (1 - p) * t + p * (1 - t)
    w = (alpha * t + (1 - alpha) * (1 - t)) * weight
    w = w * pt**gamma
    loss = _bce_with_logits(logits, t) * w
    return jnp.sum(loss) / avg_factor


def mask_cross_entropy(pred, target, label, valid=None):
    """Per-class voxel BCE (reference :73-79).

    pred: (N, num_classes, Dm, Hm, Wm) logits; target (N, Dm, Hm, Wm);
    label (N,) int class per roi; valid (N,) bool padding mask.
    Reference reduction is mean over all voxels of the selected slices.
    """
    n = pred.shape[0]
    pred_slice = jnp.take_along_axis(
        pred, label[:, None, None, None, None], axis=1
    )[:, 0]
    raw = _bce_with_logits(pred_slice, target.astype(pred.dtype))
    if valid is None:
        return jnp.mean(raw)
    vox = float(raw[0].size)
    w = valid.astype(pred.dtype)
    denom = jnp.maximum(jnp.sum(w) * vox, 1.0)
    return jnp.sum(raw * w[:, None, None, None]) / denom


def accuracy(logits, target, valid=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == target).astype(jnp.float32)
    if valid is None:
        return 100.0 * jnp.mean(correct)
    w = valid.astype(jnp.float32)
    return 100.0 * jnp.sum(correct * w) / jnp.maximum(jnp.sum(w), 1.0)
