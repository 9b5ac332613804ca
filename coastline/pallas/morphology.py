"""Pallas disk-dilation kernel — the production morphology path.

`coastline.infer.morphology` implements cv2-exact elliptical dilation
(`/root/reference/predict_coastline.py:594-602`) as an XLA convolution with
the 0/1 structuring element. For the GUI/CLI default `dilation_size=20`
that is a 20x20-tap convolution on a SINGLE channel — the worst case for
the MXU (no channel dimension to tile) and pure overhead for the VPU
(every tap re-reads the neighborhood from HBM/VMEM).

This kernel exploits two structural facts instead:

  1. Every row of a convex structuring element is one contiguous column
     interval, so dilation decomposes exactly into per-SE-row horizontal
     window maxima followed by vertical shift-maxima:
         dst(y,x) = max_i  hwin_{[lo_i,hi_i]}(src)(y + i - a, x)
  2. A window maximum over k shifts costs O(log k) shift+max passes via
     doubling, not k.

The whole image lives in VMEM; one grid step per batch image. Total work
for a 41x41 disk drops from 1681 multiply-adds/pixel to ~50 VPU
shift+max passes over the image.

Exact match vs cv2.dilate on random masks, including even-size SEs'
asymmetric anchors and grayscale inputs (tests/test_pallas.py), and an
on-chip exact-parity assert vs the XLA convolution in the benchmark. On by
default in `coastline.infer.morphology.dilate` for images that fit the
VMEM budget; `COASTLINE_PALLAS_DILATE=0` opts out.

v5e measurements (512^2 masks, scripts/bench_dilate.py ->
artifacts/bench_dilate.json):

    SE size  batch   XLA conv   this kernel   speedup
       5       1     0.496 ms     0.006 ms      80x
       5       8     2.371 ms     0.043 ms      56x
      20       1     6.072 ms     0.016 ms     369x
      20       8    56.8   ms     0.107 ms     529x
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _se_row_groups(kernel: np.ndarray):
    """SE matrix -> ((lo, hi) -> [vertical shifts]) with offsets relative to
    the cv2 anchor (size//2, size//2). Requires every nonzero SE row to be
    one contiguous segment (true for cv2 ellipses/rects of any size)."""
    kh, kw = kernel.shape
    ay, ax = kh // 2, kw // 2
    groups = {}
    for i in range(kh):
        cols = np.flatnonzero(kernel[i])
        if cols.size == 0:
            continue
        lo, hi = int(cols[0]), int(cols[-1])
        if not np.all(kernel[i, lo : hi + 1]):
            raise ValueError("structuring element row is not contiguous")
        key = (lo - ax, hi - ax)
        groups.setdefault(key, []).append(ay - i)
    return tuple((k, tuple(v)) for k, v in groups.items())


def _shift(x, s: int, axis: int):
    """Shift by s along axis with zero fill (s > 0 moves content toward
    higher indices). pltpu.roll is circular; the iota mask zeroes the
    wrapped region."""
    if s == 0:
        return x
    n = x.shape[axis]
    y = pltpu.roll(x, s % n, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if s > 0:
        return jnp.where(idx >= s, y, 0.0)
    return jnp.where(idx < n + s, y, 0.0)


def _window_max(x, m: int, axis: int):
    """max_{s in [0..m]} shift_s(x) in O(log m) passes (doubling)."""
    covered, y = 1, x
    while covered <= m:
        step = min(covered, m + 1 - covered)
        y = jnp.maximum(y, _shift(y, step, axis))
        covered += step
    return y


def _kernel(x_ref, out_ref, *, groups):
    x = x_ref[0]
    acc = jnp.zeros_like(x)
    for (lo, hi), vshifts in groups:
        # hwin over columns [x+lo, x+hi]: positive-direction window then
        # realign, max_{t in [0, hi-lo]} x(c + hi - t)
        hw = _shift(_window_max(x, hi - lo, axis=1), -hi, axis=1)
        for s in vshifts:
            acc = jnp.maximum(acc, _shift(hw, s, axis=0))
    out_ref[0] = acc


# images bigger than this fall back to the XLA convolution path: the kernel
# holds input + accumulator + shift temporaries in VMEM
VMEM_BUDGET_PX = 1024 * 1024


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def _dilate_call(x, groups, interpret=False):
    n, h, w = x.shape
    return pl.pallas_call(
        functools.partial(_kernel, groups=groups),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(x)


def _pad_w(w: int, hi_max: int) -> int:
    """Right padding: lane-align AND reserve >= hi_max scratch columns.

    The horizontal pass realigns the suffix-window maximum by reading
    z(c + hi); for the last hi columns of the array that index is out of
    range and the zero-fill would DROP their partial in-bounds window
    (right-edge pixels lose dilation). Padding by at least max(hi) pushes
    those clipped columns into scratch that the caller crops away.
    """
    pad = -w % 128
    while pad < hi_max:
        pad += 128
    return pad


def fits_vmem(shape, kernel=None) -> bool:
    h, w = shape[-2], shape[-1]
    hi_max = 0
    if kernel is not None:
        hi_max = max(
            (hi for (_, hi), _ in _se_row_groups(np.asarray(kernel))), default=0
        )
    pad_h = -h % 8
    return (h + pad_h) * (w + _pad_w(w, max(hi_max, 0))) <= VMEM_BUDGET_PX


def dilate_disk(mask, kernel: np.ndarray, interpret: bool = False):
    """cv2.dilate(mask, SE) for (H, W) or (N, H, W) masks via the shift-max
    kernel. Max semantics (grayscale-correct); binary in -> binary out."""
    groups = _se_row_groups(np.asarray(kernel))
    hi_max = max((hi for (_, hi), _ in groups), default=0)
    x = jnp.asarray(mask)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    n, h, w = x.shape
    pad_h, pad_w = -h % 8, _pad_w(w, max(hi_max, 0))
    xf = x.astype(jnp.float32)
    if pad_h or pad_w:
        xf = jnp.pad(xf, ((0, 0), (0, pad_h), (0, pad_w)))
    out = _dilate_call(xf, groups, interpret=interpret)
    out = out[:, :h, :w].astype(mask.dtype)
    return out[0] if squeeze else out
