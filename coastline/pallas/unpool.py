"""SegNet's indexed 2x2 max-pool / max-unpool as Pallas kernels.

torch's MaxUnpool2d has no JAX primitive (SURVEY.md §7 hard parts); the XLA
formulation in `coastline.ops.primitives` materializes a (N,h,w,4,C) one-hot
intermediate in HBM. These kernels keep the window expansion entirely in
VMEM: the pool emits values + a 2-bit window code, the unpool re-expands in
one pass. Fused per (image, row-tile) — the intermediate never exists.

Status (re-measured 2026-08-17 on v5e, artifacts/bench_unpool.json):
current Mosaic lowers both kernels for C >= 128 (the unpool's W-axis
interleave merge still fails "unsupported shape cast" at C=64, SegNet's
512^2 stage), but at every SegNet shape that DOES lower the XLA one-hot
formulation in `coastline.ops.primitives` is faster — 1.1-1.4x on the
pool, 3.5-4x on the unpool (XLA fuses the one-hot expand into neighbors;
this kernel's per-window select chain is VPU-serial). The production
SegNet path therefore stays on the XLA formulation by measurement, not
by lowering limitation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_kernel(x_ref, vals_ref, idx_ref):
    x = x_ref[0]  # (2*th, W, C)
    th2, w, c = x.shape
    # row-major window order: (0,0), (0,1), (1,0), (1,1).
    # NB: strided slices (x[0::2]) lower to unsupported >2D gathers in
    # Mosaic; leading-dim reshapes + plain indexing lower cleanly.
    x4 = x.reshape(th2 // 2, 2, w, c)
    t = x4[:, 0].reshape(th2 // 2, w // 2, 2, c)
    b = x4[:, 1].reshape(th2 // 2, w // 2, 2, c)
    cand = jnp.stack(
        [t[:, :, 0], t[:, :, 1], b[:, :, 0], b[:, :, 1]], axis=0
    ).astype(jnp.float32)  # Mosaic argmax supports f32 only
    vals = jnp.max(cand, axis=0)
    idx = jnp.argmax(cand, axis=0).astype(jnp.int32)
    vals_ref[0] = vals.astype(vals_ref.dtype)
    idx_ref[0] = idx


def _unpool_kernel(v_ref, i_ref, out_ref):
    v = v_ref[0]  # (th, w2, C)
    code = i_ref[0]
    th, w2, c = v.shape
    picks = [(code == k).astype(v.dtype) * v for k in range(4)]
    top = jnp.stack([picks[0], picks[1]], axis=2).reshape(th, w2 * 2, c)
    bot = jnp.stack([picks[2], picks[3]], axis=2).reshape(th, w2 * 2, c)
    rows = jnp.stack([top, bot], axis=1).reshape(th * 2, w2 * 2, c)
    out_ref[0] = rows


def _tile_h(h2: int, w: int, c: int, itemsize: int, budget: int = 256 << 10) -> int:
    # small input tiles: the kernel's f32 window-candidate intermediates are
    # ~8x the input tile and must fit the 16MB VMEM scoped stack
    th = max(1, budget // max(1, 2 * w * c * itemsize))
    while h2 % th:
        th -= 1
    return th


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_pool_with_indices_pallas(x, interpret: bool = False):
    """(B, H, W, C) -> ((B, H/2, W/2, C) vals, int32 window codes)."""
    b, h, w, c = x.shape
    th = _tile_h(h // 2, w, c, x.dtype.itemsize)
    grid = (b, (h // 2) // th)
    return pl.pallas_call(
        _pool_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, th, w // 2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w // 2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h // 2, w // 2, c), x.dtype),
            jax.ShapeDtypeStruct((b, h // 2, w // 2, c), jnp.int32),
        ),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_unpool_pallas(vals, idx, interpret: bool = False):
    """Inverse: place vals at their recorded window positions, zero fill."""
    b, h2, w2, c = vals.shape
    th = _tile_h(h2, w2 * 2, c, vals.dtype.itemsize)
    grid = (b, h2 // th)
    return pl.pallas_call(
        _unpool_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, w2 * 2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2 * 2, w2 * 2, c), vals.dtype),
        interpret=interpret,
    )(vals, idx)
