"""Device-side binary morphology.

The reference dilates the water mask with an elliptical structuring element
on host (`/root/reference/predict_coastline.py:594-602`). Here dilation is a
single XLA convolution-threshold on device — for batches of scene tiles the
whole mask->coastline-band computation stays in HBM.

Kernel shape matches cv2.getStructuringElement(MORPH_ELLIPSE) exactly
(generated via cv2 when available; analytic fallback otherwise), including
cv2's default anchor for even sizes.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def elliptical_kernel(size: int) -> np.ndarray:
    """(size, size) uint8 ellipse SE, cv2-compatible."""
    if _HAS_CV2:
        return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size)).astype(np.uint8)
    # cv2's ellipse fill: inv_r2 = 1/r^2; per row dx = r*sqrt(1 - dy^2*inv_r2)
    r = size // 2
    ker = np.zeros((size, size), np.uint8)
    inv_r2 = 1.0 / (r * r) if r else 0.0
    for i in range(size):
        dy = i - r
        if abs(dy) > r:
            continue
        dx = int(round(r * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2))))
        ker[i, max(0, r - dx) : min(size, r + dx + 1)] = 1
    return ker


@partial(jax.jit, static_argnames=("size",))
def _dilate_jit(mask, kernel, size):
    # cv2 rule: dst(p) = max_{q: SE(q)!=0} src(p + q - anchor), anchor=size//2.
    # lax conv is cross-correlation out(p) = sum_q lhs(p + q - pad_lo) rhs(q),
    # so pad_lo = anchor, pad_hi = size-1-anchor, kernel unflipped.
    anchor = size // 2
    pad = (anchor, size - 1 - anchor)
    x = mask.astype(jnp.float32)[None, :, :, None]
    k = kernel.astype(jnp.float32)[:, :, None, None]
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), (pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y[0, :, :, 0] > 0).astype(mask.dtype)


def _pallas_dilate_enabled() -> bool:
    import os

    if os.environ.get("COASTLINE_PALLAS_DILATE", "1").lower() in (
        "0", "false", "no", "off",
    ):
        return False
    return jax.default_backend() != "cpu"  # Mosaic needs a real TPU


def dilate(mask, size: int = 5, kernel=None):
    """cv2.dilate(mask, ellipse(size)) for BINARY (H, W) or (N, H, W) masks.

    Input is binarized (>0) so the Pallas and convolution paths agree
    exactly on every platform; grayscale callers wanting cv2's true max
    semantics should use pallas.morphology.dilate_disk directly.

    On TPU the Pallas shift-max kernel (pallas/morphology.py) is the
    default — measured 55-529x faster than the XLA single-channel
    convolution it replaces (v5e, SE sizes 5/20/41, 512^2 and row-banded
    2048^2 — see artifacts/bench_dilate.json); the convolution remains
    the fallback for CPU runs and masks too wide for even one banded
    VMEM block."""
    if kernel is None:
        kernel = elliptical_kernel(size)
    orig_dtype = jnp.asarray(mask).dtype
    mask = (jnp.asarray(mask) > 0).astype(orig_dtype)
    if _pallas_dilate_enabled():
        from coastline.pallas.morphology import dilate_disk, fits_vmem

        if fits_vmem(mask.shape, kernel):
            return dilate_disk(mask, kernel)
    if mask.ndim == 3:
        return jax.vmap(lambda m: _dilate_jit(m, jnp.asarray(kernel), size))(mask)
    return _dilate_jit(mask, jnp.asarray(kernel), size)


def coastline_band(water_mask, dilation_size: int = 5):
    """Dilated-minus-original boundary band
    (`predict_coastline.py:599-602`): the pixels the dilation added.

    The input is binarized (>0) first so 0/255 masks (the convention of the
    reference's saved ``*_water_mask.png`` files, `predict_coastline.py:594`)
    subtract in the same 0/1 domain as ``dilate``'s binarized output —
    otherwise uint8 wrap-around turns the interior into 1-255 garbage."""
    water = jnp.asarray(water_mask)
    binary = (water > 0).astype(water.dtype)
    dil = dilate(binary, dilation_size)
    return dil - binary
