"""MSWNet baseline (parity: `/root/reference/Extended_Baseline_Comparison.py:497-548`).

4-level U-Net whose encoder stages are multi-scale (1/3/5/maxpool) blocks,
1024-channel bridge, single-conv decoders.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ConvBNAct, MultiScaleBlock
from coastline.ops.primitives import Conv, ConvTranspose, max_pool


class MSWNet(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        x = x.astype(dt)

        e1 = MultiScaleBlock(64, dt)(x, train)
        e2 = MultiScaleBlock(128, dt)(max_pool(e1), train)
        e3 = MultiScaleBlock(256, dt)(max_pool(e2), train)
        e4 = MultiScaleBlock(512, dt)(max_pool(e3), train)

        b = ConvBNAct(1024, 3, padding=1, dtype=dt)(max_pool(e4), train)
        b = ConvBNAct(1024, 3, padding=1, dtype=dt)(b, train)

        d4 = ConvTranspose(512, 2, 2, dtype=dt)(b)
        d4 = ConvBNAct(512, 3, padding=1, dtype=dt)(
            jnp.concatenate([d4, e4], axis=-1), train)
        d3 = ConvTranspose(256, 2, 2, dtype=dt)(d4)
        d3 = ConvBNAct(256, 3, padding=1, dtype=dt)(
            jnp.concatenate([d3, e3], axis=-1), train)
        d2 = ConvTranspose(128, 2, 2, dtype=dt)(d3)
        d2 = ConvBNAct(128, 3, padding=1, dtype=dt)(
            jnp.concatenate([d2, e2], axis=-1), train)
        d1 = ConvTranspose(64, 2, 2, dtype=dt)(d2)
        d1 = ConvBNAct(64, 3, padding=1, dtype=dt)(
            jnp.concatenate([d1, e1], axis=-1), train)

        logits = Conv(self.n_classes, 1, dtype=dt)(d1).astype(jnp.float32)
        return logits if return_logits else jax.nn.sigmoid(logits)
