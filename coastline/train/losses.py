"""Segmentation losses, fused for TPU.

Parity targets:
  * `nn.BCELoss()` on sigmoid outputs (`/root/reference/Main_Final.py:551`)
    — implemented as sigmoid-BCE **from logits** (identical math, one fused
    XLA computation, no log-of-sigmoid catastrophic cancellation).
  * `nn.CrossEntropyLoss()` on 2-class logits
    (`/root/reference/train_water_segmentation.py:304`).

A loss registry mirrors the survey note (SURVEY.md §0) that an HSV-guided
robust term could slot in later without touching the loop.
"""

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def bce_loss(logits, targets):
    """Mean binary cross-entropy from logits.

    max(l,0) - l*t + log1p(exp(-|l|)) == -[t*log(sigmoid) + (1-t)*log(1-sigmoid)]
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return per.mean()


def bce_on_probs(probs, targets, eps: float = 1e-12):
    """BCE directly on probabilities (torch BCELoss clamps log at -100)."""
    probs = probs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    logp = jnp.maximum(jnp.log(probs + eps), -100.0)
    log1mp = jnp.maximum(jnp.log1p(-probs + eps), -100.0)
    return -(targets * logp + (1.0 - targets) * log1mp).mean()


def cross_entropy_loss(logits, targets):
    """Mean softmax cross-entropy; targets are integer class maps (N,H,W)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return (logz - picked).mean()


def _hsv_guided_bce(*args, **kwargs):
    from coastline.train.hsv import hsv_guided_bce

    return hsv_guided_bce(*args, **kwargs)


LOSS_REGISTRY: Dict[str, Callable] = {
    "bce": bce_loss,
    "bce_probs": bce_on_probs,
    "ce": cross_entropy_loss,
    "hsv_bce": _hsv_guided_bce,  # the HSV-guided term the reference cites
                                 # but never implemented (SURVEY.md §0)
}
