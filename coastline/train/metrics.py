"""Fused on-device segmentation metrics.

The reference computes metrics per image on host numpy with a device->host
sync per sample (`/root/reference/Main_Final.py:519-547` — flagged in
SURVEY.md §3.1 as a major perf sink). Here the whole reduction — threshold,
confusion counts, per-image IoU/F1/precision/recall/accuracy — is one XLA
computation on device; only the final aggregate crosses to host.

Formulas match the reference exactly:
  iou  = |a&b| / (|a|b| + 1e-8)                    (Main_Final.py:528-530)
  prec = tp/(tp+fp+1e-8); rec = tp/(tp+fn+1e-8)
  f1   = 2pr/(p+r+1e-8)                            (Main_Final.py:533-539)
  acc  = mean(pred == target)                      (sklearn accuracy_score)
Aggregation is per-image mean/std (population std, like np.std) — NOT
dataset-level micro-averaging (Main_Final.py:604-606,661-663).
"""

from typing import Dict

import jax.numpy as jnp


def per_image_metrics(probs, targets, threshold: float = 0.5) -> Dict[str, jnp.ndarray]:
    """probs/targets: (N, H, W[, 1]) -> dict of per-image (N,) float32 arrays."""
    if probs.ndim == 4:
        probs = probs[..., 0]
    if targets.ndim == 4:
        targets = targets[..., 0]
    pred = (probs > threshold).astype(jnp.float32)
    targ = (targets > 0.5).astype(jnp.float32)
    axes = (1, 2)

    tp = jnp.sum(pred * targ, axis=axes)
    fp = jnp.sum(pred * (1 - targ), axis=axes)
    fn = jnp.sum((1 - pred) * targ, axis=axes)
    tn = jnp.sum((1 - pred) * (1 - targ), axis=axes)

    union = tp + fp + fn
    iou = tp / (union + 1e-8)
    precision = tp / (tp + fp + 1e-8)
    recall = tp / (tp + fn + 1e-8)
    f1 = 2 * precision * recall / (precision + recall + 1e-8)
    accuracy = (tp + tn) / (tp + tn + fp + fn)
    return {
        "accuracy": accuracy,
        "iou": iou,
        "precision": precision,
        "recall": recall,
        "f1_score": f1,
    }


def binary_iou(pred_bool, targ_bool):
    """Whole-tensor IoU with the production trainer's union==0 -> 1.0 rule
    (`/root/reference/train_water_segmentation.py:341-358`)."""
    inter = jnp.sum(jnp.logical_and(pred_bool, targ_bool).astype(jnp.float32))
    union = jnp.sum(jnp.logical_or(pred_bool, targ_bool).astype(jnp.float32))
    return jnp.where(union == 0, 1.0, inter / jnp.where(union == 0, 1.0, union))


def aggregate_metrics(per_image: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Per-image arrays -> {'mean_*': .., 'std_*': ..} (population std)."""
    out = {}
    for key, values in per_image.items():
        out[f"mean_{key}"] = values.mean()
        out[f"std_{key}"] = values.std()
    return out
