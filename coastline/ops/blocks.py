"""Shared neural building blocks for the model zoo (SURVEY.md §2.2).

One implementation per concept — the reference duplicates these verbatim
across `Main_Final.py`, `comne.py`, `Extended_Baseline_Comparison.py` and
`train_water_segmentation.py`; citations below point at the canonical copy.

All modules are NHWC, take `train` for BatchNorm/Dropout mode, accept a
compute `dtype` (bfloat16 for TPU MXU throughput; params stay float32), and
an optional `conv_init` so RobustUNet can request kaiming-fan-out init for
every conv it owns (`/root/reference/Main_Final.py:282-288`) while other
models keep the torch layer default.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.primitives import (
    Conv,
    Norm,
    adaptive_avg_pool,
    avg_pool_global,
    bilinear_resize,
    max_pool,
)


class Dropout2d(nn.Module):
    """Channel dropout (zeroes whole feature maps), torch Dropout2d parity."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0:
            return x
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2), deterministic=not train)(x)


class ConvBNAct(nn.Module):
    """conv -> BN -> activation, the zoo's most common motif."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    act: str = "relu"  # relu | leaky | gelu | none
    conv_init: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
            self.groups,
            self.use_bias,
            self.conv_init,
            self.dtype,
        )(x)
        x = Norm(self.dtype)(x, train)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "leaky":
            x = nn.leaky_relu(x, 0.1)
        elif self.act == "gelu":
            x = jax.nn.gelu(x, approximate=False)
        return x


class ChannelAttention(nn.Module):
    """CBAM channel gate (`/root/reference/Main_Final.py:82-101`).

    Global avg+max pooled vectors through a shared bottleneck MLP (ratio 16)
    -> sigmoid scale. The 1x1 convs of the reference collapse to matmuls on
    (N, C) vectors here — a better MXU mapping than 1x1 convs on 1x1 maps.
    """

    ratio: int = 16
    conv_init: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        kernel_init = (
            nn.initializers.he_normal()
            if self.conv_init == "kaiming_out"
            else nn.initializers.variance_scaling(1.0 / 3, "fan_in", "uniform")
        )
        fc1 = nn.Dense(c // self.ratio, use_bias=False, kernel_init=kernel_init,
                       dtype=self.dtype, param_dtype=jnp.float32)
        fc2 = nn.Dense(c, use_bias=False, kernel_init=kernel_init,
                       dtype=self.dtype, param_dtype=jnp.float32)
        from coastline.pallas import pallas_enabled

        if not train and pallas_enabled() and jax.default_backend() == "tpu":
            from coastline.pallas.pools import fused_avg_max_pool

            avg, mx = fused_avg_max_pool(x)
        else:
            avg = jnp.mean(x, axis=(1, 2))
            mx = jnp.max(x, axis=(1, 2))
        gate = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        gate = jax.nn.sigmoid(gate.astype(jnp.float32)).astype(x.dtype)
        return x * gate[:, None, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial gate (`/root/reference/Main_Final.py:104-117`)."""

    kernel_size: int = 7
    conv_init: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        att = jnp.concatenate([avg, mx], axis=-1)
        att = Conv(1, self.kernel_size, padding=self.kernel_size // 2,
                   use_bias=False, init=self.conv_init, dtype=self.dtype)(att)
        # gate sigmoid stays in compute dtype: an f32 round-trip here costs
        # three full passes over the (N,H,W,1) map at full resolution
        return x * jax.nn.sigmoid(att)


class AttentionGate(nn.Module):
    """Attention-U-Net skip gate (`/root/reference/Main_Final.py:120-148`):
    psi = sigmoid(BN(1x1(relu(BN(1x1 g) + BN(1x1 x))))); returns x * psi."""

    features: int  # F_int
    conv_init: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        g1 = Conv(self.features, 1, init=self.conv_init, dtype=self.dtype)(g)
        g1 = Norm(self.dtype)(g1, train)
        x1 = Conv(self.features, 1, init=self.conv_init, dtype=self.dtype)(x)
        x1 = Norm(self.dtype)(x1, train)
        psi = nn.relu(g1 + x1)
        psi = Conv(1, 1, init=self.conv_init, dtype=self.dtype)(psi)
        psi = Norm(self.dtype)(psi, train)
        psi = jax.nn.sigmoid(psi.astype(jnp.float32)).astype(x.dtype)
        return x * psi


class ResidualBlock(nn.Module):
    """Attention-augmented residual block
    (`/root/reference/Main_Final.py:151-196`): conv-BN-ReLU-Dropout2d-conv-BN
    -> channel gate -> spatial gate -> + shortcut -> ReLU."""

    features: int
    dropout_rate: float = 0.1
    conv_init: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        if in_ch != self.features:
            shortcut = Conv(self.features, 1, use_bias=False, init=self.conv_init,
                            dtype=self.dtype)(x)
            shortcut = Norm(self.dtype)(shortcut, train)
        else:
            shortcut = x

        out = Conv(self.features, 3, padding=1, use_bias=False, init=self.conv_init,
                   dtype=self.dtype)(x)
        out = Norm(self.dtype)(out, train)
        out = nn.relu(out)
        out = Dropout2d(self.dropout_rate)(out, train)
        out = Conv(self.features, 3, padding=1, use_bias=False, init=self.conv_init,
                   dtype=self.dtype)(out)
        out = Norm(self.dtype)(out, train)
        if self._use_fused_tail(train, out.shape):
            # Pallas fused CBAM tail (coastline/pallas/cbam.py): 5 HBM
            # passes instead of XLA's 13 over this block's activation.
            # Init and training always take the module path below (which
            # owns the params); here the bound children's kernels are read
            # straight from the variable tree.
            import os

            from coastline.pallas.cbam import fused_cbam_tail

            p = self.variables["params"]
            return fused_cbam_tail(
                out, shortcut,
                p["ChannelAttention_0"]["Dense_0"]["kernel"],
                p["ChannelAttention_0"]["Dense_1"]["kernel"],
                p["SpatialAttention_0"]["Conv_0"]["Conv_0"]["kernel"],
                interpret=os.environ.get("COASTLINE_PALLAS_INTERPRET") == "1",
            )
        out = ChannelAttention(conv_init=self.conv_init, dtype=self.dtype,
                               name="ChannelAttention_0")(out, train)
        out = SpatialAttention(conv_init=self.conv_init, dtype=self.dtype,
                               name="SpatialAttention_0")(out)
        return nn.relu(out + shortcut)

    def _use_fused_tail(self, train: bool, shape) -> bool:
        import os

        from coastline.pallas import cbam_tail_enabled
        from coastline.pallas.cbam import fits, wins

        # COASTLINE_PALLAS_INTERPRET=1 lifts the TPU and measured-win
        # gates so the full dispatch (including the variable-tree access)
        # runs under interpret mode on any backend — the tests' path.
        interpret = os.environ.get("COASTLINE_PALLAS_INTERPRET") == "1"
        return (
            not train
            and not self.is_initializing()
            and cbam_tail_enabled()
            and (interpret or (jax.default_backend() == "tpu" and wins(shape)))
            and fits(shape)
        )


class DilatedBlock(nn.Module):
    """4-branch dilated bottleneck (`/root/reference/Main_Final.py:199-223`):
    1x1 | 3x3 d1 | 3x3 d2 | 3x3 d4, each features/4, concat -> BN -> ReLU."""

    features: int
    conv_init: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f4 = self.features // 4
        b1 = Conv(f4, 1, init=self.conv_init, dtype=self.dtype)(x)
        b2 = Conv(f4, 3, padding=1, dilation=1, init=self.conv_init, dtype=self.dtype)(x)
        b3 = Conv(f4, 3, padding=2, dilation=2, init=self.conv_init, dtype=self.dtype)(x)
        b4 = Conv(f4, 3, padding=4, dilation=4, init=self.conv_init, dtype=self.dtype)(x)
        out = jnp.concatenate([b1, b2, b3, b4], axis=-1)
        out = Norm(self.dtype)(out, train)
        return nn.relu(out)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (`/root/reference/Main_Final.py:325-356`)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        b1 = Conv(self.features, 1, dtype=self.dtype)(x)
        b2 = Conv(self.features, 3, padding=6, dilation=6, dtype=self.dtype)(x)
        b3 = Conv(self.features, 3, padding=12, dilation=12, dtype=self.dtype)(x)
        b4 = Conv(self.features, 3, padding=18, dilation=18, dtype=self.dtype)(x)
        b5 = Conv(self.features, 1, dtype=self.dtype)(avg_pool_global(x))
        b5 = bilinear_resize(b5, (h, w))
        out = jnp.concatenate([b1, b2, b3, b4, b5], axis=-1)
        out = Conv(self.features, 1, dtype=self.dtype)(out)
        out = Norm(self.dtype)(out, train)
        return nn.relu(out)


class PyramidPooling(nn.Module):
    """PSP pyramid pooling (`/root/reference/comne.py:214-240`): adaptive avg
    pool to each level -> 1x1 conv (C/levels) -> BN -> ReLU -> upsample ->
    concat with input (output 2C)."""

    pool_sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        branch_ch = x.shape[-1] // len(self.pool_sizes)
        outs = [x]
        for size in self.pool_sizes:
            p = adaptive_avg_pool(x, size)
            p = Conv(branch_ch, 1, dtype=self.dtype)(p)
            p = Norm(self.dtype)(p, train)
            p = nn.relu(p)
            outs.append(bilinear_resize(p, (h, w)))
        return jnp.concatenate(outs, axis=-1)


class DepthwiseSeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 + BN + ReLU
    (`/root/reference/comne.py:305-320`)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = Conv(in_ch, 3, stride=self.stride, padding=1, groups=in_ch,
                 use_bias=False, dtype=self.dtype)(x)
        x = Conv(self.features, 1, use_bias=False, dtype=self.dtype)(x)
        x = Norm(self.dtype)(x, train)
        return nn.relu(x)


class MultiScaleBlock(nn.Module):
    """MSWNet 4-branch block
    (`/root/reference/Extended_Baseline_Comparison.py:479-494`)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f4 = self.features // 4
        b1 = ConvBNAct(f4, 1, dtype=self.dtype)(x, train)
        b2 = ConvBNAct(f4, 3, padding=1, dtype=self.dtype)(x, train)
        b3 = ConvBNAct(f4, 5, padding=2, dtype=self.dtype)(x, train)
        b4 = ConvBNAct(f4, 1, dtype=self.dtype)(max_pool(x, 3, 1, 1), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class WaterIndexModule(nn.Module):
    """Learnable NDWI-style spectral index head
    (`/root/reference/Extended_Baseline_Comparison.py:378-393`)."""

    n_indices: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(16, 1, dtype=self.dtype)(x)
        x = Norm(self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv(self.n_indices, 1, dtype=self.dtype)(x)
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(self.dtype)


class MixFFN(nn.Module):
    """SegFormer Mix-FFN (`/root/reference/Extended_Baseline_Comparison.py:622-633`)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = Conv(self.hidden, 1, dtype=self.dtype)(x)
        h = Conv(self.hidden, 3, padding=1, groups=self.hidden, dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        return Conv(in_ch, 1, dtype=self.dtype)(h)


class EfficientSelfAttention(nn.Module):
    """Spatial-reduction attention
    (`/root/reference/Extended_Baseline_Comparison.py:636-664`): queries from
    the full map, keys/values from a stride-`reduction` conv-reduced map.

    Expressed as batched einsum over (heads, tokens, dim) so XLA lowers both
    contractions straight onto the MXU; softmax runs in float32.
    """

    num_heads: int = 8
    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        dh = c // self.num_heads
        q = Conv(c, 1, dtype=self.dtype)(x)
        xr = Conv(c, self.reduction, stride=self.reduction, dtype=self.dtype)(x)
        kv = Conv(2 * c, 1, dtype=self.dtype)(xr)
        hr, wr = xr.shape[1], xr.shape[2]

        q = q.reshape(n, h * w, self.num_heads, dh).transpose(0, 2, 1, 3)
        k = kv[..., :c].reshape(n, hr * wr, self.num_heads, dh).transpose(0, 2, 1, 3)
        v = kv[..., c:].reshape(n, hr * wr, self.num_heads, dh).transpose(0, 2, 1, 3)

        scale = dh ** -0.5
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, h, w, c)
        return Conv(c, 1, dtype=self.dtype)(out)


class ENetInitialBlock(nn.Module):
    """ENet stem (`/root/reference/comne.py:482-497`): 3x3/s2 conv (out-in
    channels) concat with 2x2 maxpool, BN, ReLU."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        conv = Conv(self.features - in_ch, 3, stride=2, padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        pool = max_pool(x, 2, 2)
        out = jnp.concatenate([conv, pool], axis=-1)
        out = Norm(self.dtype)(out, train)
        return nn.relu(out)


class ENetBottleneck(nn.Module):
    """ENet bottleneck (`/root/reference/comne.py:500-557`): 1x1 (stride 2 if
    downsampling) -> {3x3 dilated | 5x1+1x5 asymmetric} -> 1x1 + Dropout2d,
    identity via maxpool+1x1 when downsampling."""

    features: int
    dilation: int = 1
    asymmetric: bool = False
    downsample: bool = False
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        internal = in_ch // 4

        identity = x
        if self.downsample:
            identity = max_pool(identity, 2, 2)
            identity = Conv(self.features, 1, use_bias=False, dtype=self.dtype)(identity)
            identity = Norm(self.dtype)(identity, train)

        out = ConvBNAct(internal, 1, stride=2 if self.downsample else 1,
                        use_bias=False, dtype=self.dtype)(x, train)
        if self.asymmetric:
            out = Conv(internal, (5, 1), padding=(2, 0), use_bias=False,
                       dtype=self.dtype)(out)
            out = Norm(self.dtype)(out, train)
            out = nn.relu(out)
            out = Conv(internal, (1, 5), padding=(0, 2), use_bias=False,
                       dtype=self.dtype)(out)
            out = Norm(self.dtype)(out, train)
            out = nn.relu(out)
        else:
            out = Conv(internal, 3, padding=self.dilation, dilation=self.dilation,
                       use_bias=False, dtype=self.dtype)(out)
            out = Norm(self.dtype)(out, train)
            out = nn.relu(out)
        out = Conv(self.features, 1, use_bias=False, dtype=self.dtype)(out)
        out = Norm(self.dtype)(out, train)
        out = Dropout2d(self.dropout_rate)(out, train)
        return nn.relu(out + identity)
