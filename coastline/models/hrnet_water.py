"""HRNet-Water baseline (parity: `/root/reference/Extended_Baseline_Comparison.py:554-616`).

Stem (/2) -> parallel high(48)/medium(96)/low(192) resolution branches ->
upsample-fuse to high resolution -> head -> upsample x2.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ConvBNAct
from coastline.ops.primitives import Conv, Norm, bilinear_resize


class HRNetWater(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        dt = self.dtype
        x = x.astype(dt)

        stem = ConvBNAct(64, 3, stride=2, padding=1, dtype=dt)(x, train)
        stem = ConvBNAct(64, 3, padding=1, dtype=dt)(stem, train)

        hr = ConvBNAct(48, 3, padding=1, dtype=dt)(stem, train)
        hr = ConvBNAct(48, 3, padding=1, dtype=dt)(hr, train)

        mr = ConvBNAct(96, 3, stride=2, padding=1, dtype=dt)(stem, train)
        mr = ConvBNAct(96, 3, padding=1, dtype=dt)(mr, train)

        lr = ConvBNAct(192, 3, stride=2, padding=1, dtype=dt)(mr, train)
        lr = ConvBNAct(192, 3, padding=1, dtype=dt)(lr, train)

        mr_up = Norm(dt)(Conv(48, 1, dtype=dt)(mr), train)
        mr_up = bilinear_resize(mr_up, (hr.shape[1], hr.shape[2]))
        lr_up = Norm(dt)(Conv(48, 1, dtype=dt)(lr), train)
        lr_up = bilinear_resize(lr_up, (hr.shape[1], hr.shape[2]))

        fused = jnp.concatenate([hr, mr_up, lr_up], axis=-1)  # 144
        h = ConvBNAct(64, 3, padding=1, dtype=dt)(fused, train)
        h = bilinear_resize(h, (h.shape[1] * 2, h.shape[2] * 2))
        logits = Conv(self.n_classes, 1, dtype=dt)(h).astype(jnp.float32)
        return logits if return_logits else jax.nn.sigmoid(logits)
