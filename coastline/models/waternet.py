"""WaterNet baseline (parity: `/root/reference/Extended_Baseline_Comparison.py:396-473`).

Learnable NDWI-style spectral index head concatenated to RGB (7ch input),
3-level VGG-ish U-Net with channel attention on the bottleneck.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ChannelAttention, ConvBNAct, WaterIndexModule
from coastline.ops.primitives import Conv, ConvTranspose, max_pool


class WaterNet(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        x = x.astype(dt)

        def double(x, ch):
            x = ConvBNAct(ch, 3, padding=1, dtype=dt)(x, train)
            return ConvBNAct(ch, 3, padding=1, dtype=dt)(x, train)

        idx = WaterIndexModule(dtype=dt)(x, train)
        x = jnp.concatenate([x, idx], axis=-1)  # 7ch

        e1 = double(x, 64)
        e2 = double(max_pool(e1), 128)
        e3 = double(max_pool(e2), 256)

        b = double(max_pool(e3), 512)
        b = ChannelAttention(dtype=dt)(b, train)

        d3 = ConvTranspose(256, 2, 2, dtype=dt)(b)
        d3 = double(jnp.concatenate([d3, e3], axis=-1), 256)
        d2 = ConvTranspose(128, 2, 2, dtype=dt)(d3)
        d2 = double(jnp.concatenate([d2, e2], axis=-1), 128)
        d1 = ConvTranspose(64, 2, 2, dtype=dt)(d2)
        d1 = double(jnp.concatenate([d1, e1], axis=-1), 64)

        logits = Conv(self.n_classes, 1, dtype=dt)(d1).astype(jnp.float32)
        return logits if return_logits else jax.nn.sigmoid(logits)
