"""PSPNet baseline (parity: `/root/reference/comne.py:243-299`).

4 strided convs (/16) -> pyramid pooling {1,2,3,6} -> head -> bilinear
upsample to input. NHWC / configurable dtype.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ConvBNAct, Dropout2d, PyramidPooling
from coastline.ops.primitives import Conv, bilinear_resize


class PSPNet(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        h, w = x.shape[1], x.shape[2]
        x = x.astype(dt)

        for ch in (64, 128, 256, 512):
            x = ConvBNAct(ch, 3, stride=2, padding=1, dtype=dt)(x, train)

        x = PyramidPooling(dtype=dt)(x, train)            # 512 -> 1024
        x = ConvBNAct(512, 3, padding=1, dtype=dt)(x, train)
        x = Dropout2d(0.1)(x, train)
        x = Conv(self.n_classes, 1, dtype=dt)(x)

        logits = bilinear_resize(x.astype(jnp.float32), (h, w))
        return logits if return_logits else jax.nn.sigmoid(logits)
