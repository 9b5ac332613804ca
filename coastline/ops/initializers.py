"""Weight initializers matching the reference's PyTorch init semantics.

The reference relies on two init schemes:
  * PyTorch's layer default (`kaiming_uniform_(a=sqrt(5))` on conv weight,
    uniform bias) for every model except RobustUNet.
  * `kaiming_normal_(mode='fan_out', nonlinearity='relu')` for all convs in
    RobustUNet, with BatchNorm gamma=1/beta=0
    (`/root/reference/Main_Final.py:282-288`).

These are re-derived here for JAX/Flax NHWC `(kh, kw, in, out)` kernels; the
math (fan computation, gain) follows the published Kaiming-init formulas, not
any torch source.
"""

import numpy as np
from jax import random
import jax.numpy as jnp


def _conv_fans(shape):
    """(kh, kw, in, out) -> (fan_in, fan_out) with receptive-field scaling."""
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default: U(-b, b) with b = 1/sqrt(fan_in).

    (kaiming_uniform with a=sqrt(5) reduces to exactly this bound.)
    """
    fan_in, _ = _conv_fans(shape)
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_convt_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch ConvTranspose2d default kernel init.

    torch stores the ConvT weight as (in, out, kh, kw) and its
    _calculate_fan_in_and_fan_out takes fan_in from dim 1 — i.e. the
    *output*-channel count times the receptive field. For an NHWC
    (kh, kw, in, out) kernel that is shape[-1] * kh * kw, not shape[-2]
    (which `torch_conv_kernel_init` uses and which is correct only for
    forward convs).
    """
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-1] * receptive
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in):
    """PyTorch layer-default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fanout(key, shape, dtype=jnp.float32):
    """He-normal with fan_out mode and ReLU gain: N(0, sqrt(2/fan_out))."""
    _, fan_out = _conv_fans(shape)
    std = np.sqrt(2.0 / fan_out) if fan_out > 0 else 0.0
    return std * random.normal(key, shape, dtype)
