"""Plain 2-class U-Net — the production training/inference model.

Capability parity with `/root/reference/train_water_segmentation.py:209-288`
(duplicated at `predict_coastline.py:255-334`): classic double-conv U-Net
64->1024, k2/s2 transposed-conv upsampling, concat skips, 1x1 head. Outputs
raw logits (n_classes=2, CrossEntropy pairing) like the reference — no
sigmoid. NHWC / configurable compute dtype for TPU.
"""

import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ConvBNAct
from coastline.ops.primitives import Conv, ConvTranspose, max_pool


class DoubleConv(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.features, 3, padding=1, dtype=self.dtype)(x, train)
        x = ConvBNAct(self.features, 3, padding=1, dtype=self.dtype)(x, train)
        return x


class UNet(nn.Module):
    n_classes: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = True):
        dt = self.dtype
        x = x.astype(dt)

        e1 = DoubleConv(64, dt)(x, train)
        e2 = DoubleConv(128, dt)(max_pool(e1), train)
        e3 = DoubleConv(256, dt)(max_pool(e2), train)
        e4 = DoubleConv(512, dt)(max_pool(e3), train)

        bott = DoubleConv(1024, dt)(max_pool(e4), train)

        d4 = ConvTranspose(512, 2, 2, dtype=dt)(bott)
        d4 = DoubleConv(512, dt)(jnp.concatenate([d4, e4], axis=-1), train)
        d3 = ConvTranspose(256, 2, 2, dtype=dt)(d4)
        d3 = DoubleConv(256, dt)(jnp.concatenate([d3, e3], axis=-1), train)
        d2 = ConvTranspose(128, 2, 2, dtype=dt)(d3)
        d2 = DoubleConv(128, dt)(jnp.concatenate([d2, e2], axis=-1), train)
        d1 = ConvTranspose(64, 2, 2, dtype=dt)(d2)
        d1 = DoubleConv(64, dt)(jnp.concatenate([d1, e1], axis=-1), train)

        return Conv(self.n_classes, 1, dtype=dt)(d1).astype(jnp.float32)
