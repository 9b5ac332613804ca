"""Fused CBAM epilogue kernels — the ResidualBlock eval tail.

`ResidualBlock` (parity: `/root/reference/Main_Final.py:151-196`) ends
every block with

    out = ChannelAttention(y); out = SpatialAttention(out)
    out = relu(out + shortcut)

XLA compiles that tail into FOUR separate full-tensor reduction passes
(channel-attention sum and max, spatial-attention sum and max — sibling
reduction fusion does not trigger inside the full graph), plus layout
copies around the 7x7/2-channel spatial conv: 13.2 passes over the
(B,H,W,C) activation against a 5-pass minimum, 26% of the bandwidth ideal
at RobustUNet's hot (8,512,512,64) shape (scripts/bench_epilogue.py,
artifacts/bench_epilogue.json).

Two kernels restore the minimum traffic; everything cheap stays in XLA:

  * `avg_max_pool`: ONE streaming pass producing the global average AND
    maximum per channel. Accumulates into a full (W, C) f32 scratch with
    pure elementwise adds/maxes (lane-parallel, no per-tile cross-lane
    work); the cross-sublane collapse to (C,) happens once per image.
  * `gated_spatial_stats`: ONE pass computing z = y * gate in-register
    and emitting the spatial-attention input [mean_c(z), max_c(z)] as a
    (B, 2, H, W) map — channel-minor layout keeps the (th, W) results in
    native lane orientation, and the tensor is C/2 times smaller than y.

The 7x7 conv runs in XLA on the tiny stats map (NCHW dim labels — the
feature dim is 2); the final `relu(y*gate*att + shortcut)` is one XLA
elementwise fusion (2 reads + 1 write). Total: 5 big-tensor passes.

`fused_cbam_tail` orchestrates kernels + XLA glue with the exact
ChannelAttention/SpatialAttention arithmetic (bf16 compute, f32 gate
sigmoid, shared-MLP sum before sigmoid); `coastline.ops.blocks`
dispatches to it at eval on TPU behind COASTLINE_PALLAS_CBAM + the
`wins` shape gate. Parity: tests/test_pallas.py (interpret mode) plus
the on-chip checks in scripts/bench_epilogue.py — including lane-aligned
widths, per the dilation kernel's hard lesson.

OUTCOME (2026-08-17, one v5e chip): a measured NEGATIVE result, flag
default off. Isolated-tail benches win at C>=256 (1.36x at
(8,128,128,256), 1.30x at C=512, artifacts/bench_epilogue.json) and lose
at the C=64 hot shape (0.85x): Mosaic pads pallas blocks to 128 lanes,
halving C=64 DMA bandwidth (copy kernel 328 vs 656 GB/s packed,
artifacts/diag_cbam_layout.jsonl), while the lane-packed kernels stream
at 748 GB/s — XLA parity — but the pack relayout eats the gain. End to
end the full model is 0.933x even with dispatch gated to the winning
shapes (artifacts/bench_cbam.json): in the whole graph XLA fuses the
tail reductions into neighboring conv epilogues and keeps the deep
levels' small activations VMEM-resident (its cost-analysis "sustained"
1.7-2.1 TB/s at C>=512 — ops that never touch HBM), advantages any
opaque pallas call boundary destroys. The isolated wins are artifacts of
benching against HBM-materialized inputs. Conclusion: on TPU, XLA's
in-context fusion of this tail beats any materialization-boundary
kernel; the win Pallas CAN bank here is the dilation kernel's class
(data-dependent neighborhoods XLA can't fuse), not elementwise+reduce
epilogues.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad128(c: int) -> int:
    """Mosaic pads the minormost (lane) dim to multiples of 128."""
    return -(-c // 128) * 128


def _vmem_stack_bytes(th: int, w: int, c: int, itemsize: int,
                      f32_copies: float, scratch_bytes: int) -> int:
    """Scoped-VMEM stack model for one grid step: the double-buffered
    input block plus every in-register f32 materialization, all padded
    to 128 lanes. Mosaic's scoped limit is 16M; sizing by logical bf16
    bytes alone OOMs — a (32,512,64) bf16 block cast to f32 allocates
    8M padded, 16.7M total (observed AOT failure, 2026-08-17 12:40,
    artifacts/diag_cbam_layout.jsonl)."""
    cp = _pad128(c)
    return int(th * w * cp * (2 * itemsize + 4.0 * f32_copies)) + scratch_bytes


def _pick_tile_h(h: int, w: int, c: int, itemsize: int,
                 f32_copies: float = 1.0, scratch_bytes: int = 0,
                 limit: int = 10 << 20) -> int:
    """Largest divisor of h whose compiled VMEM stack fits under `limit`
    (conservative vs the 16M scoped limit)."""
    th = h
    while h % th:
        th -= 1
    while th > 1 and (
        _vmem_stack_bytes(th, w, c, itemsize, f32_copies, scratch_bytes) > limit
        or th * w * c * itemsize > (2 << 20)  # keep >=4 grid steps in flight
    ):
        th -= 1
        while h % th:
            th -= 1
    return th


# --------------------------------------------------------------------------
# Kernel 1: fused global average + max pooling, one HBM pass
# --------------------------------------------------------------------------


def _avg_max_kernel(x_ref, avg_ref, max_ref, sum_s, max_s, *, hw: float):
    h_idx = pl.program_id(1)

    @pl.when(h_idx == 0)
    def _():
        sum_s[:] = jnp.zeros_like(sum_s)
        max_s[:] = jnp.full_like(max_s, -jnp.inf)

    x = x_ref[0].astype(jnp.float32)  # (th, W, C)
    # elementwise accumulate into the full (W, C) plane: lane-parallel,
    # no cross-lane or cross-sublane reduction per tile
    sum_s[:] = sum_s[:] + jnp.sum(x, axis=0)
    max_s[:] = jnp.maximum(max_s[:], jnp.max(x, axis=0))

    @pl.when(h_idx == pl.num_programs(1) - 1)
    def _():
        avg_ref[0, 0] = (jnp.sum(sum_s[:], axis=0) * (1.0 / hw)).astype(avg_ref.dtype)
        max_ref[0, 0] = jnp.max(max_s[:], axis=0).astype(max_ref.dtype)


def _lane_pack(c: int, w: int) -> int:
    """Pixels-per-lane-row factor k: for C < 128, viewing (W, C) as
    (W/k, C*k) fills the 128-lane vregs (half-empty lanes at C=64 cost
    both DMA and VPU throughput). Requires C | 128 and k | W."""
    if c >= 128 or 128 % c or c & (c - 1):
        return 1
    k = 128 // c
    while w % k:
        k //= 2
    return k


@functools.partial(jax.jit, static_argnames=("interpret",))
def avg_max_pool(x, interpret: bool = False):
    """(B, H, W, C) -> (avg (B, C), max (B, C)) in x.dtype, one HBM pass."""
    b, h, w, c = x.shape
    k = _lane_pack(c, w)
    if k > 1:
        # lane-packed view: groups of k consecutive pixels share a vreg
        # row; channel stats fold back over the k pixel groups (equal
        # element counts per group, so the mean of means is exact)
        avg2, max2 = avg_max_pool(x.reshape(b, h, w // k, c * k),
                                  interpret=interpret)
        avg = jnp.mean(avg2.reshape(b, k, c), axis=1)
        mx = jnp.max(max2.reshape(b, k, c), axis=1)
        return avg.astype(x.dtype), mx.astype(x.dtype)
    th = _pick_tile_h(h, w, c, x.dtype.itemsize, f32_copies=1.0,
                      scratch_bytes=2 * w * _pad128(c) * 4)
    avg, mx = pl.pallas_call(
        functools.partial(_avg_max_kernel, hw=float(h * w)),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((w, c), jnp.float32),
            pltpu.VMEM((w, c), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return avg[:, 0], mx[:, 0]


# --------------------------------------------------------------------------
# Kernel 2: z = y * gate fused with the spatial-attention channel stats
# --------------------------------------------------------------------------


def _gated_stats_kernel(x_ref, gate_ref, out_ref, *, c: int):
    z = x_ref[0] * gate_ref[0, 0]  # (th, W, C) * (C,) in compute dtype
    zf = z.astype(jnp.float32)
    out_ref[0, 0] = (jnp.sum(zf, axis=-1) * (1.0 / c)).astype(out_ref.dtype)
    out_ref[0, 1] = jnp.max(z, axis=-1).astype(out_ref.dtype)


def _gated_stats_kernel_packed(x_ref, gate_ref, out_ref, *, c: int, k: int):
    """Lane-packed variant: each vreg row holds k pixels x c channels.

    Group stats come from STATIC LANE SLICES + full-minor reduces — Mosaic
    rejects lane-splitting reshapes ((..., k*c) -> (..., k, c) fails with
    'unsupported shape cast'), but aligned slices compile (chip-probed,
    scripts/diag_cbam_layout.py stage=probe). Results land in group-major
    planes out[0, stat, g]; the caller interleaves pixel order back with
    one tiny XLA transpose on the C/2-times-smaller stats tensor.
    """
    z = x_ref[0] * gate_ref[0, 0]  # (th, W/k, C*k)
    zf = z.astype(jnp.float32)
    for g in range(k):
        sl = slice(g * c, (g + 1) * c)
        out_ref[0, 0, g] = (jnp.sum(zf[:, :, sl], -1) * (1.0 / c)).astype(out_ref.dtype)
        out_ref[0, 1, g] = jnp.max(z[:, :, sl], -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gated_spatial_stats(x, gate, interpret: bool = False):
    """(B,H,W,C), (B,C) -> (B, 2, H, W): [mean_c(x*gate), max_c(x*gate)].

    One read of x; x*gate is never materialized. Channel-minor output so
    each (th, W) result plane stays in native sublane x lane orientation.
    C < 128 inputs are lane-packed (see _lane_pack) with the gate tiled
    across the k pixel groups.
    """
    b, h, w, c = x.shape
    k = _lane_pack(c, w)
    # stack: z (bf16) + zf (f32) + per-group f32 slice temps
    th = _pick_tile_h(h, w // k, c * k, x.dtype.itemsize, f32_copies=3.0)
    if k > 1:
        out = pl.pallas_call(
            functools.partial(_gated_stats_kernel_packed, c=c, k=k),
            grid=(b, h // th),
            in_specs=[
                pl.BlockSpec((1, th, w // k, c * k), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c * k), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 2, k, th, w // k),
                                   lambda i, j: (i, 0, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 2, k, h, w // k), x.dtype),
            interpret=interpret,
        )(x.reshape(b, h, w // k, c * k), jnp.tile(gate, (1, k))[:, None, :])
        # group-major -> pixel order: w = wk * k + g
        return out.transpose(0, 1, 3, 4, 2).reshape(b, 2, h, w)
    return pl.pallas_call(
        functools.partial(_gated_stats_kernel, c=c),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, th, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, h, w), x.dtype),
        interpret=interpret,
    )(x, gate[:, None, :])


# --------------------------------------------------------------------------
# Orchestrator: the full eval-mode CBAM + residual tail
# --------------------------------------------------------------------------


def wins(shape) -> bool:
    """Whether the fused tail MEASURED faster than the XLA module path at
    this activation shape on the real chip (artifacts/bench_epilogue.json,
    2026-08-17): 1.36x at (8,128,128,256); a wash (1.03x) at C=128; a
    LOSS (0.85x) at the C=64 hot shape. The C=64 loss is layout physics,
    not kernel structure: Mosaic pads pallas blocks to 128 lanes, halving
    DMA bandwidth (copy kernel: 328 GB/s native-C64 vs 656 GB/s packed,
    artifacts/diag_cbam_layout.jsonl), and the pack/unpack relayout
    round-trips eat the 13.2->5 pass fusion gain, while XLA's own
    reductions stream at 753 GB/s in either layout. Production dispatch
    therefore takes the fused path only where it wins: C >= 256."""
    return shape[-1] >= 256


def fits(shape) -> bool:
    """Whether the kernels handle this activation shape (tile divisibility,
    Mosaic's (8, 128)-block rules, and the scoped-VMEM stack model; model
    shapes are powers of two so this is the general-input guard)."""
    b, h, w, c = shape
    k = _lane_pack(c, w)
    wk, ck = w // k, c * k
    th = _pick_tile_h(h, wk, ck, 2, f32_copies=3.0)
    return (
        h % th == 0
        and (th % 8 == 0 or th == h)
        and wk >= 8
        and ck >= 8
        and _vmem_stack_bytes(th, wk, ck, 2, 3.0, 0) <= 10 << 20
        and _vmem_stack_bytes(th, wk, ck, 2, 1.0,
                              2 * wk * _pad128(ck) * 4) <= 10 << 20
    )


def variadic_avg_max(x, axes):
    """Mean and max over `axes` in ONE pass via XLA's variadic reduce.

    `jnp.mean` + `jnp.max` issue two separate full-tensor reduction passes
    (XLA's sibling-reduction fusion does not trigger inside large graphs —
    see artifacts/bench_epilogue.json); a single multi-operand lax.reduce
    is one HLO op and one pass by construction. Sum accumulates f32, mean
    is cast back to x.dtype (matching jnp.mean-then-convert semantics).

    WARNING (this container): do NOT compile this on the axon tunnel —
    the remote AOT service rejects mixed-precision variadic reduces and
    HANGS on same-precision ones (observed 2026-08-17, two ~50-min tunnel
    wedges). CPU-correct and tested; kept as the reference formulation
    for hardware with a healthy compiler. The Pallas impl is the TPU
    path.
    """
    n = 1
    for a in axes:
        n *= x.shape[a]
    # both operands f32: TPU XLA rejects mixed-precision variadic reduces,
    # the converts fuse into the single read, and f32 max is exact
    init = (jnp.zeros((), jnp.float32), jnp.full((), -jnp.inf, jnp.float32))

    def comp(acc, val):
        return acc[0] + val[0], jnp.maximum(acc[1], val[1])

    xf = x.astype(jnp.float32)
    s, m = jax.lax.reduce((xf, xf), init, comp, axes)
    return (s * (1.0 / n)).astype(x.dtype), m.astype(x.dtype)


def fused_cbam_tail(y, shortcut, fc1, fc2, sconv, *, impl: str = "pallas",
                    interpret: bool = False):
    """relu(SpatialAttention(ChannelAttention(y)) + shortcut) in 5 passes.

    Arithmetic matches `ops.blocks` exactly: the channel gate is
    sigmoid(f32) of the shared-MLP sum over the avg- and max-pooled
    vectors, cast back to compute dtype; the spatial gate sigmoid stays in
    compute dtype (blocks.py:131-133).

    impl='pallas' (default, the TPU path) uses the hand-written streaming
    kernels; impl='xla' uses variadic single-pass reduces — numerically
    identical and CPU-tested, but see variadic_avg_max's warning: this
    container's remote compiler hangs on it, so nothing dispatches to it
    on TPU. Both share the minimum-traffic dataflow.

    fc1: (C, C//ratio), fc2: (C//ratio, C) — ChannelAttention's Dense
    kernels; sconv: (7, 7, 2, 1) — SpatialAttention's conv kernel.
    """
    dt = y.dtype
    if impl == "pallas":
        avg, mx = avg_max_pool(y, interpret=interpret)
    else:
        avg, mx = variadic_avg_max(y, (1, 2))
    mlp = lambda v: jnp.dot(jax.nn.relu(jnp.dot(v, fc1.astype(dt))), fc2.astype(dt))
    gate = jax.nn.sigmoid((mlp(avg) + mlp(mx)).astype(jnp.float32)).astype(dt)

    if impl == "pallas":
        att_in = gated_spatial_stats(y, gate, interpret=interpret)  # (B,2,H,W)
    else:
        zmean, zmax = variadic_avg_max(y * gate[:, None, None, :], (3,))
        att_in = jnp.stack([zmean, zmax], axis=1)  # (B,2,H,W)
    att = jax.lax.conv_general_dilated(
        att_in, sconv.astype(dt), window_strides=(1, 1),
        padding=((3, 3), (3, 3)), dimension_numbers=("NCHW", "HWIO", "NHWC"),
    )  # (B, H, W, 1)
    att = jax.nn.sigmoid(att)
    return jax.nn.relu(y * gate[:, None, None, :] * att + shortcut)
