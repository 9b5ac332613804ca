"""DeepLabV3+ baseline (parity: `/root/reference/Main_Final.py:359-433`).

Simplified strided backbone (/16) -> ASPP at 32x32 -> 4x transposed-conv
decoder -> 3x3 head. NHWC / configurable dtype.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ASPP, ConvBNAct
from coastline.ops.primitives import Conv, ConvTranspose, Norm, max_pool


class DeepLabV3Plus(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        x = ConvBNAct(64, 7, stride=2, padding=3, dtype=dt)(x, train)       # /2
        x = max_pool(x, 3, 2, 1)                                            # /4
        x = ConvBNAct(128, 3, padding=1, dtype=dt)(x, train)
        x = ConvBNAct(256, 3, stride=2, padding=1, dtype=dt)(x, train)      # /8
        x = ConvBNAct(512, 3, stride=2, padding=1, dtype=dt)(x, train)      # /16

        x = ASPP(256, dtype=dt)(x, train)

        for ch in (128, 64, 32, 16):
            x = ConvTranspose(ch, 4, 2, padding=1, dtype=dt)(x)
            x = Norm(dt)(x, train)
            x = nn.relu(x)
        logits = Conv(self.n_classes, 3, padding=1, dtype=dt)(x).astype(jnp.float32)
        return logits if return_logits else jax.nn.sigmoid(logits)
