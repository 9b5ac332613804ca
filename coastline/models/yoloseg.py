"""YOLO-style segmentation baseline (parity: `/root/reference/Main_Final.py:436-510`).

Darknet-ish backbone (1x1/3x3 alternation, LeakyReLU 0.1, 4 max-pools) with a
transposed-conv segmentation head. NHWC / configurable dtype.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ConvBNAct
from coastline.ops.primitives import Conv, ConvTranspose, Norm, max_pool


class YOLOSeg(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        x = x.astype(dt)

        x = ConvBNAct(32, 3, padding=1, act="leaky", dtype=dt)(x, train)
        x = max_pool(x)                                                      # /2
        x = ConvBNAct(64, 3, padding=1, act="leaky", dtype=dt)(x, train)
        x = max_pool(x)                                                      # /4
        x = ConvBNAct(128, 3, padding=1, act="leaky", dtype=dt)(x, train)
        x = ConvBNAct(64, 1, act="leaky", dtype=dt)(x, train)
        x = ConvBNAct(128, 3, padding=1, act="leaky", dtype=dt)(x, train)
        x = max_pool(x)                                                      # /8
        x = ConvBNAct(256, 3, padding=1, act="leaky", dtype=dt)(x, train)
        x = ConvBNAct(128, 1, act="leaky", dtype=dt)(x, train)
        x = ConvBNAct(256, 3, padding=1, act="leaky", dtype=dt)(x, train)
        x = max_pool(x)                                                      # /16

        for ch in (128, 64, 32, 16):
            x = ConvTranspose(ch, 4, 2, padding=1, dtype=dt)(x)
            x = Norm(dt)(x, train)
            x = nn.leaky_relu(x, 0.1)
        logits = Conv(self.n_classes, 3, padding=1, dtype=dt)(x).astype(jnp.float32)
        return logits if return_logits else jax.nn.sigmoid(logits)
