"""Pallas kernel tests (interpret mode — backend-independent semantics).

The fused_avg_max_pool kernel is additionally validated compiled on real
TPU (exact match at bf16 across all RobustUNet block shapes; see commit
history for the measured numbers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coastline.ops.primitives import max_pool_with_indices, max_unpool
from coastline.pallas.pools import fused_avg_max_pool
from coastline.pallas.unpool import max_pool_with_indices_pallas, max_unpool_pallas


@pytest.mark.parametrize("shape", [(2, 16, 32, 8), (1, 64, 128, 128), (3, 8, 8, 256)])
def test_fused_avg_max_pool(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    avg, mx = fused_avg_max_pool(x, interpret=True)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(x.mean(axis=(1, 2))), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(x.max(axis=(1, 2))), atol=1e-6)


def test_pool_unpool_roundtrip_matches_xla_formulation():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, 8), jnp.float32)
    v_ref, i_ref = max_pool_with_indices(x)
    v, i = max_pool_with_indices_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    u = max_unpool_pallas(v, i, interpret=True)
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(max_unpool(v_ref, i_ref)), atol=1e-6
    )


def test_channel_attention_pallas_flag(monkeypatch):
    """COASTLINE_PALLAS toggles the fused pooling path; outputs must agree."""
    from coastline.ops.blocks import ChannelAttention

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 32))
    mod = ChannelAttention()
    v = mod.init(jax.random.PRNGKey(0), x)
    base = mod.apply(v, x)
    monkeypatch.setenv("COASTLINE_PALLAS", "1")
    # on CPU the flag is inert (tpu-only guard), output identical
    out = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


@pytest.mark.parametrize("size", [3, 5, 20, 41])
def test_pallas_dilate_matches_cv2(size):
    """Shift-max disk dilation == cv2.dilate exactly (binary masks)."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from coastline.infer.morphology import elliptical_kernel
    from coastline.pallas.morphology import dilate_disk

    rng = np.random.default_rng(size)
    mask = (rng.random((64, 96)) < 0.05).astype(np.uint8)
    ker = elliptical_kernel(size)
    ref = cv2.dilate(mask, ker, iterations=1)
    out = np.asarray(dilate_disk(mask, ker, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_dilate_batch_and_grayscale():
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from coastline.infer.morphology import elliptical_kernel
    from coastline.pallas.morphology import dilate_disk

    rng = np.random.default_rng(0)
    ker = elliptical_kernel(7)
    batch = rng.integers(0, 255, (3, 40, 40), dtype=np.uint8)
    out = np.asarray(dilate_disk(batch, ker, interpret=True))
    for i in range(3):
        ref = cv2.dilate(batch[i], ker, iterations=1)
        np.testing.assert_array_equal(out[i], ref)


@pytest.mark.parametrize("shape", [(16, 128), (24, 256), (8, 512)])
def test_pallas_dilate_lane_aligned_width(shape):
    """Regression: widths that are already multiples of 128 got NO scratch
    padding, so the horizontal realign shift zeroed the last hi columns and
    right-edge pixels lost their dilation (caught on-chip by
    scripts/bench_dilate.py; fixed by _pad_w reserving >= max(hi))."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from coastline.infer.morphology import elliptical_kernel
    from coastline.pallas.morphology import dilate_disk

    rng = np.random.default_rng(1)
    ker = elliptical_kernel(5)
    mask = (rng.random(shape) < 0.05).astype(np.uint8)
    mask[:, -1] = 1  # force right-edge seeds
    ref = cv2.dilate(mask, ker, iterations=1)
    out = np.asarray(dilate_disk(mask, ker, interpret=True))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("shape,size", [((1500, 700), 20), ((1030, 1024), 41),
                                        ((2200, 480), 5), ((3000, 333), 7)])
def test_pallas_dilate_row_banded(shape, size):
    """Images over the VMEM budget are row-banded with a vertical halo —
    must stay exactly cv2 (native-resolution scene masks take this path)."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from coastline.infer.morphology import elliptical_kernel
    from coastline.pallas import morphology as pm

    rng = np.random.default_rng(shape[0] + size)
    ker = elliptical_kernel(size)
    assert pm._plan(shape, pm._se_row_groups(ker))[0] < shape[0], "not banded"
    mask = (rng.random(shape) < 0.02).astype(np.uint8)
    mask[:, -1] = 1
    mask[-1, :] = 1
    ref = cv2.dilate(mask, ker, iterations=1)
    out = np.asarray(pm.dilate_disk(mask, ker, interpret=True))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("shape,size", [((64, 10980), 20), ((48, 25600), 5)])
def test_pallas_dilate_2d_banded(shape, size):
    """Masks whose lane-padded WIDTH alone overflows the VMEM budget are
    banded along BOTH axes with an exact horizontal halo — a full
    Sentinel-2 granule (10980 px wide) must stay on the kernel, exactly
    cv2 (right/left edge seeds included)."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from coastline.infer.morphology import elliptical_kernel
    from coastline.pallas import morphology as pm

    rng = np.random.default_rng(shape[1] + size)
    ker = elliptical_kernel(size)
    plan = pm._plan(shape, pm._se_row_groups(ker))
    assert plan[1] is not None, "expected a column-banded plan"
    mask = (rng.random(shape) < 0.01).astype(np.uint8)
    mask[:, 0] = 1
    mask[:, -1] = 1
    mask[-1, :] = 1
    ref = cv2.dilate(mask, ker, iterations=1)
    out = np.asarray(pm.dilate_disk(mask, ker, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_dilate_huge_se_raises_and_gate():
    import numpy as np

    from coastline.infer.morphology import elliptical_kernel
    from coastline.pallas import morphology as pm

    # an SE so large no valid 2D block fits the VMEM budget
    ker = elliptical_kernel(701)
    shape = (64, 4000)
    assert not pm.fits_vmem(shape, ker)
    with pytest.raises(ValueError):
        pm.dilate_disk(np.zeros(shape, np.uint8), ker, interpret=True)


@pytest.mark.parametrize("shape", [(2, 16, 128, 64), (1, 32, 256, 32),
                                   (2, 24, 128, 128)])
def test_cbam_avg_max_pool(shape):
    from coastline.pallas.cbam import avg_max_pool

    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    avg, mx = avg_max_pool(x, interpret=True)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(jnp.mean(x, axis=(1, 2))),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(jnp.max(x, axis=(1, 2))))


@pytest.mark.parametrize("shape", [(2, 16, 128, 64), (2, 24, 128, 128)])
def test_cbam_gated_spatial_stats(shape):
    from coastline.pallas.cbam import gated_spatial_stats

    b, h, w, c = shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    gate = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(1), (b, c)))
    out = gated_spatial_stats(x, gate, interpret=True)
    z = x * gate[:, None, None, :]
    assert out.shape == (b, 2, h, w)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(jnp.mean(z, -1)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(jnp.max(z, -1)),
                               rtol=1e-6, atol=1e-6)


def test_fused_cbam_tail_matches_block_composition():
    """The fused eval tail must reproduce ChannelAttention ->
    SpatialAttention -> relu(+shortcut) (`ops/blocks.py:185-187`)."""
    from flax import linen as nn

    from coastline.ops.blocks import ChannelAttention, SpatialAttention
    from coastline.pallas.cbam import fused_cbam_tail

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, y, s):
            out = ChannelAttention(conv_init="kaiming_out")(y, False)
            out = SpatialAttention(conv_init="kaiming_out")(out)
            return nn.relu(out + s)

    rng = jax.random.PRNGKey(0)
    y = jax.random.normal(rng, (2, 16, 128, 64), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), y.shape, jnp.float32)
    mod = Tail()
    p = mod.init(rng, y, s)
    ref = mod.apply(p, y, s)
    prm = p["params"]
    got = fused_cbam_tail(
        y, s,
        prm["ChannelAttention_0"]["Dense_0"]["kernel"],
        prm["ChannelAttention_0"]["Dense_1"]["kernel"],
        prm["SpatialAttention_0"]["Conv_0"]["Conv_0"]["kernel"],
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_residual_block_fused_tail_flag_inert_on_cpu(monkeypatch):
    """COASTLINE_PALLAS_CBAM must not change CPU behavior (tpu-only
    guard), and the explicit child names keep the param tree identical."""
    from coastline.ops.blocks import ResidualBlock

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 32))
    mod = ResidualBlock(32)
    v = mod.init(jax.random.PRNGKey(0), x)
    assert "ChannelAttention_0" in v["params"]
    assert "SpatialAttention_0" in v["params"]
    base = mod.apply(v, x)
    monkeypatch.setenv("COASTLINE_PALLAS_CBAM", "1")
    out = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_residual_block_fused_tail_dispatch_interpret(monkeypatch):
    """The WIRED fused path (flag + variable-tree access + kernel call)
    must run end-to-end and agree with the module path — exercised via
    interpret mode so the dispatch itself (blocks.py:_use_fused_tail) is
    covered on any backend."""
    from coastline.ops.blocks import ResidualBlock

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 128, 32))
    mod = ResidualBlock(32)
    v = mod.init(jax.random.PRNGKey(0), x)
    base = mod.apply(v, x)
    monkeypatch.setenv("COASTLINE_PALLAS_CBAM", "1")
    monkeypatch.setenv("COASTLINE_PALLAS_INTERPRET", "1")
    out = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-4, atol=1e-5)


def test_cbam_vmem_stack_model_bounds_tiles():
    """Tile picking must keep the Mosaic scoped-VMEM stack under limit at
    every model shape — the model counts 128-lane padding and in-register
    f32 copies (a (32,512,64) bf16 block cast to f32 is 8M padded and
    OOMed the real AOT compiler at the 16M scoped limit, 2026-08-17)."""
    from coastline.pallas.cbam import (_lane_pack, _pad128, _pick_tile_h,
                                       _vmem_stack_bytes, fits)

    model_shapes = [(8, 512, 512, 64), (8, 256, 256, 128), (8, 128, 128, 256),
                    (8, 64, 64, 512), (8, 32, 32, 1024), (32, 512, 512, 64),
                    (2, 96, 96, 64), (1, 512, 512, 64)]
    for b, h, w, c in model_shapes:
        assert fits((b, h, w, c)), (b, h, w, c)
        k = _lane_pack(c, w)
        wk, ck = w // k, c * k
        for f32c, scratch in [(3.0, 0), (1.0, 2 * wk * _pad128(ck) * 4)]:
            th = _pick_tile_h(h, wk, ck, 2, f32_copies=f32c,
                              scratch_bytes=scratch)
            assert h % th == 0
            assert _vmem_stack_bytes(th, wk, ck, 2, f32c, scratch) <= 10 << 20
    # the raw-RGB shape stays off the kernel path entirely
    assert not fits((8, 512, 512, 3))


def test_cbam_lane_pack_factors():
    from coastline.pallas.cbam import _lane_pack

    assert _lane_pack(64, 512) == 2
    assert _lane_pack(32, 512) == 4
    assert _lane_pack(128, 512) == 1   # already full lanes
    assert _lane_pack(256, 512) == 1
    assert _lane_pack(96, 512) == 1    # 128 % 96 != 0 -> no packing
    assert _lane_pack(64, 6) == 2      # k clipped to divide W
    assert _lane_pack(64, 5) == 1


def test_fused_conv3x3_bn_relu_interpret_parity():
    """Round-5 fused conv+BN+ReLU experiment kernel (pallas/fused_conv.py):
    interpret-mode output must match XLA's conv+epilogue bit-for-bit up to
    bf16 rounding, including the W edges (the in-kernel halo columns) and
    band seams."""
    from jax import lax

    from coastline.pallas.fused_conv import fused_conv3x3_bn_relu, supported

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 128, 64
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)

    ref = lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    ref = jnp.maximum(ref * scale + bias, 0).astype(jnp.bfloat16)
    got = fused_conv3x3_bn_relu(x, w, scale, bias, interpret=True)
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    assert d.max() < 0.15 and d.mean() < 1e-3, (d.max(), d.mean())

    # no-relu path (plain conv + affine)
    got2 = fused_conv3x3_bn_relu(x, w, scale, bias, relu=False,
                                 interpret=True)
    ref2 = lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    ref2 = (ref2 * scale + bias).astype(jnp.bfloat16)
    d2 = np.abs(np.asarray(ref2, np.float32) - np.asarray(got2, np.float32))
    assert d2.max() < 0.15, d2.max()

    assert supported(512, 512, 64, 64)
    assert not supported(512, 512, 128, 128)  # scoped to the C=64 class
