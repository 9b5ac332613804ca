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

    SE size  shape        XLA conv   this kernel   speedup
       5     512^2  b1    0.496 ms     0.006 ms      80x
       5     512^2  b8    2.371 ms     0.043 ms      56x
      20     512^2  b1    6.072 ms     0.016 ms     369x
      20     512^2  b8   56.8   ms     0.107 ms     529x
      20     2048^2 b1   97.1   ms     0.254 ms     382x   (row-banded)

Masks over the per-block VMEM budget are row-banded with a vertical halo
of the SE row-radius — exact, so native-resolution scene masks (the
CoastlineExtractor path dilates at ORIGINAL image size) stay on this
kernel instead of falling back to the convolution; on-chip cv2 parity is
asserted for the banded path at 512^2/size41 and 2048^2/sizes 20+41.
Masks whose lane-padded WIDTH alone overflows the budget (a full
Sentinel-2 granule is 10980 px wide) are banded along BOTH axes with an
exact horizontal halo of the SE column reach (`_dilate_banded2d`), so
granule-scale dilation stays on the kernel too; only enormous structuring
elements (no valid 2D block) fall back to the convolution.
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


# Mosaic's scoped-vmem stack limit: the kernel's live shift/max
# temporaries must fit it per grid step. Measured from compiler OOM
# reports: a size-20 SE uses 38.7 bytes/px of stack, size-41 uses 54.0 —
# roughly 40.5 + vmax bytes/px (vmax = SE row-radius), which _plan uses
# to size blocks. The production 512x512/size-20 case (512x640
# lane-padded = 327k px -> 12.7M) single-calls; taller images are
# row-banded (exact: a vertical halo of the SE row-radius overlaps the
# bands); only images too WIDE for an 8-row band fall back to XLA conv.
VMEM_LIMIT_BYTES = 16 * 2**20


def _budget_px(vmax: int) -> int:
    return int(VMEM_LIMIT_BYTES / (40.5 + vmax))


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


def _plan(shape, groups):
    """(band_rows, band_cols, vmax, hi_max, halo_l) for the given mask shape,
    or None when even a minimal 2D block overflows the VMEM budget (only
    enormous structuring elements). band_rows == h means a single un-tiled
    call; band_cols is None unless the (lane-padded) width alone overflows
    the budget, in which case columns are banded too with an exact
    horizontal halo (halo_l left, hi_max right) — full-width Sentinel-2
    granules (10980 px) take this path instead of falling back to the XLA
    convolution."""
    h, w = shape[-2], shape[-1]
    hi_max = max((max(hi, 0) for (_, hi), _ in groups), default=0)
    halo_l = -min((min(lo, 0) for (lo, _), _ in groups), default=0)
    vmax = max((abs(s) for _, vs in groups for s in vs), default=0)
    w_pad = w + _pad_w(w, hi_max)
    budget = _budget_px(vmax)
    if (h + (-h % 8)) * w_pad <= budget:
        return h, None, vmax, hi_max, halo_l
    halo8 = 2 * vmax + (-2 * vmax % 8)  # halo rounded up so bh pads to <= budget
    band = (budget // w_pad - halo8) // 8 * 8
    if band >= 8:
        return band, None, vmax, hi_max, halo_l
    # 2D banding: pick the column-band width whose (sublane/lane-padded
    # block px) / (valid px) overhead is smallest. These block shapes are
    # novel (the 40.5+vmax bytes/px stack fit was measured on full-width
    # blocks), so plan 5% under the budget — a failed remote compile
    # wedges this container's tunnel for ~50 min, and the perf cost of
    # slightly smaller blocks is negligible.
    budget = budget * 95 // 100
    best = None
    for bw in (128, 256, 512, 1024, 2048, 4096):
        if bw >= w:
            break
        blk_w = halo_l + bw + hi_max
        bw_p = blk_w + (-blk_w % 128)
        bh = (budget // bw_p - halo8) // 8 * 8
        if bh < 8:
            continue
        bh_p = bh + 2 * vmax + (-(bh + 2 * vmax) % 8)
        score = (bh_p * bw_p) / (bh * bw)
        if best is None or score < best[0]:
            best = (score, bh, bw)
    if best is None:
        return None
    return best[1], best[2], vmax, hi_max, halo_l


def fits_vmem(shape, kernel=None) -> bool:
    groups = ()
    if kernel is not None:
        groups = _se_row_groups(np.asarray(kernel))
    return _plan(shape, groups) is not None


def _dilate_banded2d(xf, groups, band_h: int, band_w: int, vmax: int,
                     halo_l: int, hi_max: int, interpret: bool):
    """Exact 2D-banded dilation for masks whose (lane-padded) WIDTH alone
    overflows the VMEM budget: blocks carry a vertical halo of the SE
    row-radius AND a horizontal halo (halo_l left / hi_max right — the SE
    column reach), so every valid output pixel sees its full dependency
    cone; halo/pad pixels are recomputed by the neighboring block and
    cropped here."""
    n, h, w = xf.shape
    nbh = -(-h // band_h)
    nbw = -(-w // band_w)
    bh = band_h + 2 * vmax
    bh_p = bh + (-bh % 8)
    bw = halo_l + band_w + hi_max
    bw_p = bw + (-bw % 128)
    hp = (nbh - 1) * band_h + bh_p
    wp = (nbw - 1) * band_w + bw_p
    xp = jnp.pad(
        xf, ((0, 0), (vmax, hp - vmax - h), (halo_l, wp - halo_l - w)))
    rows = (np.arange(nbh) * band_h)[:, None] + np.arange(bh_p)[None, :]
    cols = (np.arange(nbw) * band_w)[:, None] + np.arange(bw_p)[None, :]
    blocks = xp[:, jnp.asarray(rows), :][..., jnp.asarray(cols)]
    blocks = blocks.transpose(0, 1, 3, 2, 4).reshape(n * nbh * nbw, bh_p, bw_p)
    out = _dilate_call(blocks, groups, interpret=interpret)
    out = out[:, vmax : vmax + band_h, halo_l : halo_l + band_w]
    out = (out.reshape(n, nbh, nbw, band_h, band_w)
              .transpose(0, 1, 3, 2, 4)
              .reshape(n, nbh * band_h, nbw * band_w))
    return out[:, :h, :w]


def _dilate_banded(xf, groups, band: int, vmax: int, interpret: bool):
    """Exact row-banded dilation: each band carries a vertical halo of the
    SE row-radius, so every valid output row sees all the input rows it
    depends on; halo/scratch rows are cropped after the kernel."""
    n, h, w = xf.shape
    nb = -(-h // band)
    bh = band + 2 * vmax
    xp = jnp.pad(xf, ((0, 0), (vmax, nb * band - h + vmax), (0, 0)))
    rows = (jnp.arange(nb) * band)[:, None] + jnp.arange(bh)[None, :]
    bands = xp[:, rows, :].reshape(n * nb, bh, w)
    if bh % 8:
        bands = jnp.pad(bands, ((0, 0), (0, -bh % 8), (0, 0)))
    out = _dilate_call(bands, groups, interpret=interpret)
    return out[:, vmax : vmax + band, :].reshape(n, nb * band, w)[:, :h, :]


def dilate_disk(mask, kernel: np.ndarray, interpret: bool = False):
    """cv2.dilate(mask, SE) for (H, W) or (N, H, W) masks via the shift-max
    kernel; large images are row-banded (exact). Max semantics
    (grayscale-correct); binary in -> binary out."""
    groups = _se_row_groups(np.asarray(kernel))
    x = jnp.asarray(mask)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    n, h, w = x.shape
    plan = _plan(x.shape, groups)
    if plan is None:
        raise ValueError(
            f"structuring element {kernel.shape} is too large for a minimal "
            "2D VMEM block; use the convolution fallback "
            "(infer.morphology.dilate does this)"
        )
    band_h, band_w, vmax, hi_max, halo_l = plan
    xf = x.astype(jnp.float32)
    if band_w is not None:
        out = _dilate_banded2d(
            xf, groups, band_h, band_w, vmax, halo_l, hi_max, interpret)
    else:
        pad_w = _pad_w(w, hi_max)
        if pad_w:
            xf = jnp.pad(xf, ((0, 0), (0, 0), (0, pad_w)))
        if band_h >= h:
            pad_h = -h % 8
            if pad_h:
                xf = jnp.pad(xf, ((0, 0), (0, pad_h), (0, 0)))
            out = _dilate_call(xf, groups, interpret=interpret)
        else:
            out = _dilate_banded(xf, groups, band_h, vmax, interpret)
    out = out[:, :h, :w].astype(mask.dtype)
    return out[0] if squeeze else out
