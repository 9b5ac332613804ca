"""SegFormer-Lite baseline (parity: `/root/reference/Extended_Baseline_Comparison.py:667-744`).

4 patch-embed stages (/4,/8,/16,/32; 32/64/128/256ch), efficient
spatial-reduction attention + Mix-FFN residual blocks on the first 3 stages,
all-MLP decoder fusing every stage at /4 resolution.

One documented deviation: the reference applies its head sigmoid *before*
the final bilinear upsample; here logits are upsampled and the sigmoid comes
last by default, so a single fused logits head serves both the stable BCE
training path and inference. The difference is a bilinear-vs-logit ordering
of a monotone map at the mask boundary only. `reference_ordering=True`
reproduces the reference's sigmoid-then-upsample probabilities exactly
(weight-level prob parity is pinned in tests/test_torch_import.py); it has
no logits form, so `return_logits=True` keeps the default ordering.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ConvBNAct, EfficientSelfAttention, MixFFN
from coastline.ops.primitives import Conv, bilinear_resize


class SegFormerLite(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32
    reference_ordering: bool = False  # sigmoid before the final upsample

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        h, w = x.shape[1], x.shape[2]
        x = x.astype(dt)

        c1 = ConvBNAct(32, 7, stride=4, padding=3, act="gelu", dtype=dt)(x, train)
        c1 = c1 + EfficientSelfAttention(1, 8, dt)(c1)
        c1 = c1 + MixFFN(128, dt)(c1)

        c2 = ConvBNAct(64, 3, stride=2, padding=1, act="gelu", dtype=dt)(c1, train)
        c2 = c2 + EfficientSelfAttention(2, 4, dt)(c2)
        c2 = c2 + MixFFN(256, dt)(c2)

        c3 = ConvBNAct(128, 3, stride=2, padding=1, act="gelu", dtype=dt)(c2, train)
        c3 = c3 + EfficientSelfAttention(4, 2, dt)(c3)
        c3 = c3 + MixFFN(512, dt)(c3)

        c4 = ConvBNAct(256, 3, stride=2, padding=1, act="gelu", dtype=dt)(c3, train)

        size = (c1.shape[1], c1.shape[2])
        f4 = bilinear_resize(Conv(256, 1, dtype=dt)(c4), size)
        f3 = bilinear_resize(Conv(256, 1, dtype=dt)(c3), size)
        f2 = bilinear_resize(Conv(256, 1, dtype=dt)(c2), size)
        f1 = Conv(256, 1, dtype=dt)(c1)

        fused = ConvBNAct(256, 1, dtype=dt)(
            jnp.concatenate([f4, f3, f2, f1], axis=-1), train)
        head = ConvBNAct(64, 3, padding=1, dtype=dt)(fused, train)
        head = Conv(self.n_classes, 1, dtype=dt)(head)

        if self.reference_ordering and not return_logits:
            # exact reference semantics (`Extended_Baseline_Comparison.py:741`)
            probs = jax.nn.sigmoid(head.astype(jnp.float32))
            return bilinear_resize(probs, (h, w))
        logits = bilinear_resize(head.astype(jnp.float32), (h, w))
        return logits if return_logits else jax.nn.sigmoid(logits)
