"""SegNet baseline (parity: `/root/reference/comne.py:84-208`).

VGG-style encoder saving 2x2 max-pool argmax positions; decoder restores
spatial detail via index-preserving unpooling. Torch's MaxUnpool2d has no
JAX primitive — here the pool records a 2-bit window-local argmax and the
unpool is a branch-free one-hot expand (`coastline.ops.primitives`), which
vectorizes on the VPU instead of scattering through HBM.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ConvBNAct
from coastline.ops.primitives import Conv, max_pool_with_indices, max_unpool


class SegNet(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        x = x.astype(dt)

        def convs(x, chans):
            for c in chans:
                x = ConvBNAct(c, 3, padding=1, dtype=dt)(x, train)
            return x

        x = convs(x, (64, 64))
        x, i1 = max_pool_with_indices(x)
        x = convs(x, (128, 128))
        x, i2 = max_pool_with_indices(x)
        x = convs(x, (256, 256, 256))
        x, i3 = max_pool_with_indices(x)
        x = convs(x, (512, 512, 512))
        x, i4 = max_pool_with_indices(x)

        x = convs(max_unpool(x, i4), (512, 512, 256))
        x = convs(max_unpool(x, i3), (256, 256, 128))
        x = convs(max_unpool(x, i2), (128, 64))
        x = max_unpool(x, i1)
        x = ConvBNAct(64, 3, padding=1, dtype=dt)(x, train)
        logits = Conv(self.n_classes, 3, padding=1, dtype=dt)(x).astype(jnp.float32)
        return logits if return_logits else jax.nn.sigmoid(logits)
