"""TPU-native primitive ops with PyTorch-parity shape/semantics.

Everything operates on NHWC tensors (TPU-preferred layout; the reference is
NCHW torch — see e.g. `/root/reference/Main_Final.py:290-321`). All ops are
shape-static and jit/pjit friendly: no data-dependent Python control flow.

Parity notes (each against the reference's torch usage):
  * `Conv`/`ConvTranspose` reproduce torch Conv2d / ConvTranspose2d output
    shapes for every (kernel, stride, padding, output_padding, dilation,
    groups) combination the reference uses.
  * `max_pool_with_indices` + `max_unpool` reproduce
    `nn.MaxPool2d(return_indices=True)` / `nn.MaxUnpool2d` (SegNet,
    `/root/reference/comne.py:174-208`) as a fully vectorized one-hot
    scatter — no torch-style flat index gather, which would be
    scatter-heavy on TPU.
  * `adaptive_avg_pool` reproduces `nn.AdaptiveAvgPool2d` window boundaries
    floor(i*H/k) .. ceil((i+1)*H/k) for arbitrary H, k.
  * `bilinear_resize` == `F.interpolate(mode='bilinear',
    align_corners=False)` (half-pixel centers), via jax.image.resize.
"""

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from jax.ad_checkpoint import checkpoint_name

from coastline.ops.initializers import (
    kaiming_normal_fanout,
    torch_bias_init_for,
    torch_conv_kernel_init,
    torch_convt_kernel_init,
)

Ints = Union[int, Tuple[int, int]]


def _pair(v: Ints) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


class Conv(nn.Module):
    """2D convolution with torch-style integer padding and init.

    init='torch'       -> PyTorch Conv2d default (uniform +-1/sqrt(fan_in))
    init='kaiming_out' -> kaiming_normal(fan_out) as RobustUNet uses
                          (`/root/reference/Main_Final.py:282-288`)
    """

    features: int
    kernel_size: Ints = 3
    stride: Ints = 1
    padding: Ints = 0
    dilation: Ints = 1
    groups: int = 1
    use_bias: bool = True
    init: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        kernel_init = (
            kaiming_normal_fanout if self.init == "kaiming_out" else torch_conv_kernel_init
        )
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * kh * kw
        y = nn.Conv(
            features=self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.stride),
            padding=((ph, ph), (pw, pw)),
            kernel_dilation=_pair(self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=torch_bias_init_for(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        # Identity outside jax.checkpoint; under remat(policy=save_only_these
        # _names("conv_out")) it marks MXU outputs as the only residuals worth
        # an HBM round-trip — elementwise chains (BN/ReLU/gates) recompute in
        # backward, where they fuse for free. See models/robust_unet.py.
        return checkpoint_name(y, "conv_out")


class ConvTranspose(nn.Module):
    """Transposed 2D convolution matching torch ConvTranspose2d shapes.

    out = (in - 1) * stride - 2 * padding + kernel + output_padding

    Implemented directly as `lax.conv_general_dilated` with input (lhs)
    dilation — the native XLA formulation a TPU compiles well — rather than
    any gradient-of-conv trick. The reference uses (k=2,s=2,p=0),
    (k=4,s=2,p=1) and (k=3,s=2,p=1,op=1) variants.
    """

    features: int
    kernel_size: Ints
    stride: Ints = 1
    padding: Ints = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        op = self.output_padding
        in_ch = x.shape[-1]
        fan_in = self.features * kh * kw  # torch convT fan_in uses out-channels
        kernel = self.param(
            "kernel",
            torch_convt_kernel_init,
            (kh, kw, in_ch, self.features),
            jnp.float32,
        )
        # NB: a 1x1-conv + depth-to-space rewrite of the k2/s2 case was
        # benchmarked ~7% SLOWER than XLA's lhs-dilated conv on v5e (the
        # depth-to-space transpose costs more than the matmul gains).
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + op), (kw - 1 - pw, kw - 1 - pw + op)),
            lhs_dilation=(sh, sw),
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_bias_init_for(fan_in), (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return checkpoint_name(y, "conv_out")


class _FastBatchNorm(nn.Module):
    """BatchNorm core with torch semantics (momentum 0.1, eps 1e-5).

    Statistics (batch mean/var, running stats, the per-channel affine) are
    float32; the whole-tensor normalize applies a precomputed per-channel
    scale/shift in the compute dtype. Compared to casting the tensor to f32
    around a stock BatchNorm this halves the elementwise HBM traffic — BN
    math was the largest non-conv cost in the profiled train step. Variable
    names/shapes match flax nn.BatchNorm exactly (params {scale, bias},
    batch_stats {mean, var}) so checkpoints and the torch importer are
    unaffected.
    """

    momentum: float = 0.9  # flax convention: new = m*old + (1-m)*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)  # cast fuses into the reductions
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.maximum(jnp.mean(xf * xf, axis=axes) - mean * mean, 0.0)
            if not self.is_initializing():
                # torch semantics: normalize with the biased variance but fold
                # the UNBIASED one (x N/(N-1)) into the running stats
                # (torch.nn.BatchNorm2d docs; verified step-for-step in
                # tests/test_train_parity.py).
                n = 1
                for a in axes:
                    n *= x.shape[a]
                correction = n / max(n - 1, 1)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var * correction
                )
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        shift = bias - mean * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


#: Measurement control (scripts/bench_train_bnstat.py): True freezes every
#: BN to running statistics even in train mode, isolating the cost of the
#: batch-stat reduction passes in the compiled step. Trace-time only —
#: flip it BEFORE jit/compile of the function under test.
_BN_FROZEN = False


def set_bn_frozen(value: bool):
    global _BN_FROZEN
    _BN_FROZEN = bool(value)


import contextlib as _contextlib


@_contextlib.contextmanager
def bn_frozen(value: bool = True):
    """Scoped BN-freeze for measurement code: restores the previous value
    even on error, so a leaked True can never silently freeze BN statistics
    for later training in the same process (ADVICE r4). Prefer this over
    raw set_bn_frozen."""
    global _BN_FROZEN
    prev = _BN_FROZEN
    _BN_FROZEN = bool(value)
    try:
        yield
    finally:
        _BN_FROZEN = prev


class Norm(nn.Module):
    """BatchNorm wrapper: torch semantics, f32 statistics, compute-dtype
    normalization (see _FastBatchNorm)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _FastBatchNorm(name="BatchNorm_0")(
            x.astype(self.dtype),
            use_running_average=(not train) or _BN_FROZEN,
        )
        return y.astype(self.dtype)


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------


def max_pool(x, window: Ints = 2, stride: Optional[Ints] = None, padding: Ints = 0):
    """torch MaxPool2d(window, stride, padding) on NHWC."""
    wh, ww = _pair(window)
    sh, sw = _pair(stride if stride is not None else window)
    ph, pw = _pair(padding)
    # NB: init must be a Python scalar, not a traced array — a traced init
    # breaks reduce_window's autodiff under lax.scan.
    neg_inf = -np.inf if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        (1, wh, ww, 1),
        (1, sh, sw, 1),
        ((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def avg_pool(x, window: Ints = 2, stride: Optional[Ints] = None, padding: Ints = 0):
    wh, ww = _pair(window)
    sh, sw = _pair(stride if stride is not None else window)
    ph, pw = _pair(padding)
    summed = lax.reduce_window(
        x,
        0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        lax.add,
        (1, wh, ww, 1),
        (1, sh, sw, 1),
        ((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
    return summed / (wh * ww)


def max_pool_global(x):
    """AdaptiveMaxPool2d(1): NHWC -> (N, 1, 1, C)."""
    return jnp.max(x, axis=(1, 2), keepdims=True)


def avg_pool_global(x):
    """AdaptiveAvgPool2d(1): NHWC -> (N, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def _adaptive_bounds(size: int, out: int):
    starts = [int(np.floor(i * size / out)) for i in range(out)]
    ends = [int(np.ceil((i + 1) * size / out)) for i in range(out)]
    return starts, ends


def adaptive_avg_pool(x, output_size: Ints):
    """torch AdaptiveAvgPool2d for arbitrary (static) sizes on NHWC.

    Output size is tiny in every use here (<=6, PSP/FastSCNN pyramid levels,
    `/root/reference/comne.py:214-240`), so an unrolled slice+mean per cell is
    cheap and fuses into one XLA computation.
    """
    oh, ow = _pair(output_size)
    n, h, w, c = x.shape
    if h % oh == 0 and w % ow == 0:
        # Fast path: equal windows -> single reshape-mean (XLA tiles this well)
        x4 = x.reshape(n, oh, h // oh, ow, w // ow, c)
        return x4.mean(axis=(2, 4))
    hs, he = _adaptive_bounds(h, oh)
    ws, we = _adaptive_bounds(w, ow)
    rows = []
    for i in range(oh):
        cols = [
            x[:, hs[i] : he[i], ws[j] : we[j], :].mean(axis=(1, 2)) for j in range(ow)
        ]
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (N, oh, ow, C)


def adaptive_max_pool(x, output_size: Ints):
    oh, ow = _pair(output_size)
    n, h, w, c = x.shape
    if h % oh == 0 and w % ow == 0:
        x4 = x.reshape(n, oh, h // oh, ow, w // ow, c)
        return x4.max(axis=(2, 4))
    hs, he = _adaptive_bounds(h, oh)
    ws, we = _adaptive_bounds(w, ow)
    rows = []
    for i in range(oh):
        cols = [x[:, hs[i] : he[i], ws[j] : we[j], :].max(axis=(1, 2)) for j in range(ow)]
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def max_pool_with_indices(x):
    """2x2/stride-2 max pool returning (values, window-argmax) on NHWC.

    The index is the row-major position (0..3) of the max inside each 2x2
    window — ties resolve to the first occurrence, identical to torch
    MaxPool2d(return_indices=True) as SegNet uses
    (`/root/reference/comne.py:174-193`). Keeping a 2-bit window-local index
    instead of torch's flat int64 index is deliberate: the unpool becomes a
    branch-free one-hot expand (VPU-friendly), not a scatter.
    """
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "max_pool_with_indices expects even H, W"
    xw = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(n, h // 2, w // 2, 4, c)
    vals = xw.max(axis=3)
    idx = jnp.argmax(xw, axis=3).astype(jnp.int32)  # (N, h/2, w/2, C)
    return vals, idx


def max_unpool(vals, idx, output_size: Optional[Tuple[int, int]] = None):
    """Inverse of `max_pool_with_indices`: place each value at its recorded
    window position, zeros elsewhere (torch MaxUnpool2d semantics,
    `/root/reference/comne.py:196-205`)."""
    n, h2, w2, c = vals.shape
    pos = jnp.arange(4, dtype=jnp.int32).reshape(1, 1, 1, 4, 1)
    onehot = (idx[:, :, :, None, :] == pos).astype(vals.dtype)
    xw = vals[:, :, :, None, :] * onehot  # (N, h2, w2, 4, C)
    xw = xw.reshape(n, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    y = xw.reshape(n, h2 * 2, w2 * 2, c)
    if output_size is not None and (y.shape[1], y.shape[2]) != tuple(output_size):
        oh, ow = output_size
        y = y[:, :oh, :ow, :]
        pad_h, pad_w = oh - y.shape[1], ow - y.shape[2]
        if pad_h > 0 or pad_w > 0:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return y


# ---------------------------------------------------------------------------
# Resizing
# ---------------------------------------------------------------------------


def bilinear_resize(x, size: Tuple[int, int]):
    """F.interpolate(mode='bilinear', align_corners=False) on NHWC.

    antialias=False matches torch's plain half-pixel sampling when
    downscaling (jax defaults to an antialiasing triangle filter).
    """
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="bilinear", antialias=False)


def upsample_nearest(x, scale: int):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * scale, w * scale, c), method="nearest")


def nearest_resize(x, size: Tuple[int, int]):
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="nearest")
