"""Golden tests for torch-parity primitives, validated against torch itself.

These pin the exact numerical semantics the reference relies on:
ConvTranspose2d padding math, MaxPool/MaxUnpool index round-trips, adaptive
average pooling boundaries, and align_corners=False bilinear resize.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as tF

from coastline.ops import primitives as P


def to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def to_nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


@pytest.mark.parametrize(
    "k,s,p,op",
    [(2, 2, 0, 0), (4, 2, 1, 0), (3, 2, 1, 1)],
)
def test_conv_transpose_matches_torch(k, s, p, op):
    torch.manual_seed(0)
    x = torch.randn(2, 3, 8, 8)
    m = torch.nn.ConvTranspose2d(3, 5, k, stride=s, padding=p, output_padding=op)
    ref = m(x).detach().numpy()

    mod = P.ConvTranspose(5, k, s, p, op)
    # torch convT weight (in, out, kh, kw) applies unflipped in the scatter
    # formulation == flipped kernel in the lhs-dilated-conv formulation.
    w = m.weight.detach().numpy()
    kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()  # (kh, kw, in, out)
    variables = {
        "params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(m.bias.detach().numpy())}
    }
    out = mod.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-4)


def test_max_pool_with_indices_roundtrip_matches_torch():
    torch.manual_seed(1)
    x = torch.randn(2, 4, 8, 8)
    pooled_t, idx_t = tF.max_pool2d(x, 2, 2, return_indices=True)
    unpooled_t = tF.max_unpool2d(pooled_t, idx_t, 2, 2, output_size=(8, 8)).numpy()

    vals, idx = P.max_pool_with_indices(to_nhwc(x))
    np.testing.assert_allclose(to_nchw(vals), pooled_t.numpy(), atol=1e-6)
    un = P.max_unpool(vals, idx, output_size=(8, 8))
    np.testing.assert_allclose(to_nchw(un), unpooled_t, atol=1e-6)


@pytest.mark.parametrize("h,w", [(32, 32), (33, 17)])
@pytest.mark.parametrize("size", [1, 2, 3, 6])
def test_adaptive_avg_pool_matches_torch(h, w, size):
    torch.manual_seed(2)
    x = torch.randn(1, 3, h, w)
    ref = tF.adaptive_avg_pool2d(x, size).numpy()
    out = P.adaptive_avg_pool(to_nhwc(x), size)
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-5)


def test_bilinear_resize_matches_torch_align_corners_false():
    torch.manual_seed(3)
    x = torch.randn(1, 2, 8, 8)
    for size in [(16, 16), (5, 7), (32, 32)]:
        ref = tF.interpolate(x, size=size, mode="bilinear", align_corners=False).numpy()
        out = P.bilinear_resize(to_nhwc(x), size)
        np.testing.assert_allclose(to_nchw(out), ref, atol=1e-5)


def test_max_pool_padding_matches_torch():
    torch.manual_seed(4)
    x = torch.randn(1, 2, 16, 16)
    ref = tF.max_pool2d(x, 3, 2, 1).numpy()
    out = P.max_pool(to_nhwc(x), 3, 2, 1)
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-6)

    ref = tF.max_pool2d(x, 3, 1, 1).numpy()
    out = P.max_pool(to_nhwc(x), 3, 1, 1)
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-6)


def test_conv_padding_and_dilation_shapes():
    x = jnp.zeros((1, 32, 32, 8))
    for k, s, p, d in [(3, 1, 1, 1), (3, 2, 1, 1), (7, 2, 3, 1), (3, 1, 6, 6), (3, 1, 4, 4)]:
        mod = P.Conv(4, k, s, p, d)
        out = jax.eval_shape(
            lambda m=mod: m.init_with_output(jax.random.PRNGKey(0), x)[0]
        )
        expected = (32 + 2 * p - d * (k - 1) - 1) // s + 1
        assert out.shape == (1, expected, expected, 4), (k, s, p, d, out.shape)


def test_conv_transpose_init_matches_torch_fan_in():
    """torch ConvTranspose2d kaiming_uniform fan_in = out_ch * kh * kw
    (weight dim 1), NOT in_ch * kh * kw — ADVICE r1."""
    from coastline.ops.initializers import torch_convt_kernel_init

    in_ch, out_ch, k = 128, 64, 2
    kernel = torch_convt_kernel_init(
        jax.random.PRNGKey(0), (k, k, in_ch, out_ch), jnp.float32
    )
    bound = 1.0 / np.sqrt(out_ch * k * k)
    assert float(jnp.abs(kernel).max()) <= bound + 1e-7
    # and it actually fills the correct range (would fail with the conv
    # fan_in = in_ch*k*k, whose bound is sqrt(2) smaller here)
    assert float(jnp.abs(kernel).max()) > bound * 0.9

    torch.manual_seed(0)
    m = torch.nn.ConvTranspose2d(in_ch, out_ch, k, stride=2)
    tb = float(m.weight.detach().abs().max())
    assert tb <= bound + 1e-7 and tb > bound * 0.9
