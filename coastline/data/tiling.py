"""Scene -> tile-batch -> stitched-mask pipeline.

The reference's only answer to scene-scale rasters is downscaling the whole
scene to 512x512 (`image_size=(512,512)` everywhere, SURVEY.md §5.7). This
module adds the TPU-native spatial path (BASELINE.json config #5): pad a
full Sentinel-2 scene to a tile grid, run all 512^2 tiles as one (or a few)
batched device calls, and stitch logits back at native resolution —
arbitrarily large coastlines at full detail through a static-shape compute
path.
"""

from typing import Tuple

import numpy as np


def tile_scene(
    image: np.ndarray, tile: int = 512, overlap: int = 0
) -> Tuple[np.ndarray, dict]:
    """(H,W,3) uint8 -> (N, tile, tile, 3) + grid info. Edge tiles are
    zero-padded; `overlap` keeps context at seams (stitch crops it back)."""
    h, w = image.shape[:2]
    stride = tile - overlap
    if stride <= 0:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than tile ({tile}); "
            "the stride between tiles would be <= 0")
    ny = max(1, -(-max(h - overlap, 1) // stride))
    nx = max(1, -(-max(w - overlap, 1) // stride))
    tiles = np.zeros((ny * nx, tile, tile, image.shape[2]), image.dtype)
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * stride, ix * stride
            patch = image[y0 : y0 + tile, x0 : x0 + tile]
            tiles[iy * nx + ix, : patch.shape[0], : patch.shape[1]] = patch
    return tiles, {"ny": ny, "nx": nx, "h": h, "w": w, "tile": tile, "overlap": overlap}


def stitch_tiles(tile_outputs: np.ndarray, grid: dict) -> np.ndarray:
    """(N, tile, tile[, C]) -> (H, W[, C]) cropping overlap margins."""
    ny, nx, h, w = grid["ny"], grid["nx"], grid["h"], grid["w"]
    tile, overlap = grid["tile"], grid["overlap"]
    stride = tile - overlap
    extra = tile_outputs.shape[3:] if tile_outputs.ndim > 3 else ()
    out = np.zeros((ny * stride + overlap, nx * stride + overlap, *extra),
                   tile_outputs.dtype)
    half = overlap // 2
    for iy in range(ny):
        for ix in range(nx):
            t = tile_outputs[iy * nx + ix]
            y0, x0 = iy * stride, ix * stride
            ys = half if iy > 0 else 0
            xs = half if ix > 0 else 0
            out[y0 + ys : y0 + tile, x0 + xs : x0 + tile] = t[ys:, xs:]
    return out[:h, :w]
