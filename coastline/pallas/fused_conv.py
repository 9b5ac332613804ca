"""Fused 3x3 conv + folded-BN + ReLU Mosaic kernel — the round-5 scoped
experiment (VERDICT r4 item 5).

Target: ONE shape — the C=64 full-resolution 3x3 conv+BN+ReLU that
dominates the bf16 RobustUNet graph (512^2, the lane-padding-bound level
per docs/QUANT.md's probe table). Hypothesis: XLA's conv at C_in=64
contracts K=64 per tap, padding the MXU's 128-wide contraction to half
utilization; packing all 9 taps into ONE K=9*64=576 contraction
(im2col-in-VMEM) restores ~90% MXU utilization and fuses the BN
scale/bias + ReLU epilogue into the same pass.

Design (per the house wedge rules: static VMEM sizing, interpret-mode
parity first, tiny-shape compile probe before any production-shape
compile — CLAUDE.md):

  * input is pre-padded (H+2, W+2) and row-banded OUTSIDE the kernel
    (band+2-row overlapping bands via an XLA gather, the
    pallas/morphology.py pattern) — overlap cost 2/band.
  * grid: one step per band. Block (1, band+2, W+2, 64) bf16.
  * in-kernel: for each half-band of 4 rows, build the patch matrix
    (4*W, 576) by lane-concatenating the 9 shifted slices, one
    dot_general against the (576, 64) repacked kernel with f32
    accumulation, then y = max(acc*scale + bias, 0) cast to bf16.
  * weights enter as arguments (never captured constants — remote
    compiles hang on them, CLAUDE.md).

The lane-concat at 64-lane (sub-register for bf16) boundaries is the
known Mosaic risk; `supported()` + the compile probe in
scripts/bench_fused_conv.py gate it. Parity: tests/test_pallas.py
(interpret mode) + the on-chip check in the bench script.

OUTCOME (2026-08-20, one v5e chip, artifacts/bench_fused_conv.json):
measured NEGATIVE, decisively — 10.67 ms vs XLA's 2.22 ms at the target
shape (0.21x), with BIT-EXACT on-chip parity (max err 0.0). Mosaic
accepted the kernel everywhere (both chipless AOT probes pass, the
64-lane concats lower fine), so this is pure performance physics: XLA's
conv emitter already sustains 69.7 TF/s (~35% MXU peak — near the
bandwidth-coupled limit for this shape) with the BN+ReLU epilogue fused,
while the Pallas formulation reaches 14.5 TF/s — the C=64 lane-padded
block DMA at half bandwidth (the CBAM kernels' measured physics,
artifacts/diag_cbam_layout.jsonl) plus in-VMEM lane-concats at 64-lane
sub-register boundaries put 4.8x of overhead on the critical path, far
more than the K=576 MXU-packing hypothesis could win back (the
hypothesis itself was wrong: 69.7 TF/s shows XLA does NOT pad this
contraction to half utilization). Same conclusion class as the round-3
CBAM epilogue negative: XLA's native conv pipeline + epilogue fusion is
at the achievable roofline for dense NHWC convs; Pallas wins on TPU
come from data-dependent neighborhoods XLA cannot fuse (the dilation
kernel, 55-529x), not from re-implementing convolutions. This closes
docs/STATUS.md's last "untried lever": every single-chip performance
lever is now measured, and 36 img/s train / 166 bf16 / 265 int8 img/s
stand as the design's measured operating points.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def supported(h: int, w: int, cin: int, cout: int) -> bool:
    """Static shape gate: the experiment targets the C=64 class; the
    patch buffer must fit the scoped-VMEM model."""
    return (cin == 64 and cout == 64 and h % 8 == 0 and w % 128 == 0
            and _vmem_bytes(w) < (12 << 20))


def _vmem_bytes(w: int, band: int = 8) -> int:
    """Scoped-VMEM stack model (CLAUDE.md sizing rule): double-buffered
    input block + patch matrix + f32 accumulator + output block, all
    padded to 128 lanes."""
    blk = (band + 2) * (w + 2 + 126) * _pad128(64) * 2  # bf16, lane-padded
    patch = (band // 2) * w * _pad128(9 * 64) * 2       # bf16
    acc = (band // 2) * w * _pad128(64) * 4             # f32
    out = band * w * _pad128(64) * 2
    return 2 * blk + patch + 2 * acc + out


def _kernel(xb_ref, w_ref, s_ref, b_ref, out_ref, *, band: int, w_out: int,
            relu: bool):
    x = xb_ref[0]  # (band+2, W+2pad, 64) bf16
    half = band // 2
    for h0 in (0, half):  # static unroll: two half-band patch matmuls
        taps = []
        for dy in range(3):
            for dx in range(3):
                sl = x[h0 + dy:h0 + dy + half, dx:dx + w_out, :]
                taps.append(sl.reshape(half * w_out, 64))
        p = jnp.concatenate(taps, axis=-1)  # (half*W, 576) bf16
        acc = jax.lax.dot_general(
            p, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (half*W, 64) f32
        y = acc * s_ref[0] + b_ref[0]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0, h0:h0 + half] = y.astype(out_ref.dtype).reshape(
            half, w_out, 64)


def fused_conv3x3_bn_relu(x, w, scale, bias, band: int = 8,
                          relu: bool = True, interpret: bool = False):
    """`relu((conv3x3_same(x, w)) * scale + bias)` for NHWC bf16 x with
    C_in = C_out = 64 — one Pallas pass with a K=576 packed contraction.

    x: (B, H, W, 64) bf16; w: (3, 3, 64, 64); scale/bias: (64,) f32
    (the BN fold: scale = gamma/sqrt(var+eps), bias = beta - mean*scale;
    a plain conv+bias is scale=1, bias=b).
    """
    bsz, h, ww, cin = x.shape
    assert cin == 64 and w.shape == (3, 3, 64, 64)
    assert h % band == 0 and band % 2 == 0
    nb = h // band
    # pad W+2 up to a 128 multiple so the lane dim stays tiled
    wp2 = ww + 2
    wpad = -wp2 % 128
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    rows = (np.arange(nb) * band)[:, None] + np.arange(band + 2)[None, :]
    xb = xp[:, jnp.asarray(rows)]              # (B, nb, band+2, W+2p, 64)
    xb = xb.reshape(bsz * nb, band + 2, wp2 + wpad, cin)

    wmat = jnp.asarray(w, jnp.bfloat16).reshape(9 * 64, 64)
    s2 = jnp.asarray(scale, jnp.float32).reshape(1, 64)
    b2 = jnp.asarray(bias, jnp.float32).reshape(1, 64)

    out = pl.pallas_call(
        functools.partial(_kernel, band=band, w_out=ww, relu=relu),
        grid=(bsz * nb,),
        in_specs=[
            pl.BlockSpec((1, band + 2, wp2 + wpad, cin),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * 64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, band, ww, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz * nb, band, ww, 64),
                                       jnp.bfloat16),
        interpret=interpret,
    )(xb, wmat, s2, b2)
    return out.reshape(bsz, h, ww, 64)
