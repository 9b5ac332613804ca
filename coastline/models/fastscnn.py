"""Fast-SCNN baseline (parity: `/root/reference/comne.py:323-476`).

Learning-to-downsample (/8) -> global feature extractor (ds-conv bottlenecks
+ pyramid pooling, 256ch) -> feature fusion -> ds-conv classifier ->
upsample. ~191k params. NHWC / configurable dtype.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ConvBNAct, DepthwiseSeparableConv, PyramidPooling
from coastline.ops.primitives import Conv, Norm, bilinear_resize


class FastSCNN(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        h, w = x.shape[1], x.shape[2]
        x = x.astype(dt)

        # Learning to downsample (/8)
        x = ConvBNAct(32, 3, stride=2, padding=1, use_bias=False, dtype=dt)(x, train)
        x = DepthwiseSeparableConv(48, 2, dt)(x, train)
        low = DepthwiseSeparableConv(64, 2, dt)(x, train)

        # Global feature extractor (/16 internally) + pyramid pooling -> 256
        g = low
        for _ in range(3):
            g = DepthwiseSeparableConv(64, 1, dt)(g, train)
        g = DepthwiseSeparableConv(96, 2, dt)(g, train)
        for _ in range(2):
            g = DepthwiseSeparableConv(96, 1, dt)(g, train)
        for _ in range(3):
            g = DepthwiseSeparableConv(128, 1, dt)(g, train)
        g = PyramidPooling(dtype=dt)(g, train)  # 128 -> 256

        # Feature fusion: project both to 128, upsample high, add
        lowp = Conv(128, 1, use_bias=False, dtype=dt)(low)
        lowp = Norm(dt)(lowp, train)
        high = Conv(128, 1, use_bias=False, dtype=dt)(g)
        high = Norm(dt)(high, train)
        high = bilinear_resize(high, (low.shape[1], low.shape[2]))
        x = nn.relu(lowp + high)

        # Classifier
        x = DepthwiseSeparableConv(128, 1, dt)(x, train)
        x = DepthwiseSeparableConv(128, 1, dt)(x, train)
        x = Conv(self.n_classes, 1, dtype=dt)(x)

        logits = bilinear_resize(x.astype(jnp.float32), (h, w))
        return logits if return_logits else jax.nn.sigmoid(logits)
