"""ENet baseline (parity: `/root/reference/comne.py:560-608`).

Initial block -> encoder1 (4 bottlenecks, 64ch) -> encoder2 (9 bottlenecks:
dilated 2/4/8/16 + asymmetric 5x1/1x5) -> 3x transposed-conv decoder.
NHWC / configurable dtype.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ENetBottleneck, ENetInitialBlock
from coastline.ops.primitives import ConvTranspose, Norm


class ENet(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        x = x.astype(dt)

        x = ENetInitialBlock(16, dt)(x, train)                              # /2

        x = ENetBottleneck(64, downsample=True, dropout_rate=0.01, dtype=dt)(x, train)
        for _ in range(3):
            x = ENetBottleneck(64, dropout_rate=0.01, dtype=dt)(x, train)   # /4

        x = ENetBottleneck(128, downsample=True, dtype=dt)(x, train)        # /8
        x = ENetBottleneck(128, dtype=dt)(x, train)
        x = ENetBottleneck(128, dilation=2, dtype=dt)(x, train)
        x = ENetBottleneck(128, asymmetric=True, dtype=dt)(x, train)
        x = ENetBottleneck(128, dilation=4, dtype=dt)(x, train)
        x = ENetBottleneck(128, dtype=dt)(x, train)
        x = ENetBottleneck(128, dilation=8, dtype=dt)(x, train)
        x = ENetBottleneck(128, asymmetric=True, dtype=dt)(x, train)
        x = ENetBottleneck(128, dilation=16, dtype=dt)(x, train)

        x = ConvTranspose(64, 3, 2, padding=1, output_padding=1, dtype=dt)(x)
        x = nn.relu(Norm(dt)(x, train))
        x = ConvTranspose(16, 3, 2, padding=1, output_padding=1, dtype=dt)(x)
        x = nn.relu(Norm(dt)(x, train))
        logits = ConvTranspose(self.n_classes, 2, 2, dtype=dt)(x).astype(jnp.float32)
        return logits if return_logits else jax.nn.sigmoid(logits)
