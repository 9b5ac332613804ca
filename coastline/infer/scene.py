"""Device-resident scene prediction: ONE jitted program for tile → forward
→ stitch.

The host tiling path (`data/tiling.py` + chunked `predict_masks_batch`)
moves every overlapping tile through the host↔device link and pays one
dispatch round-trip per chunk; at 2048² that is ~20 MB of uploads over 4
round-trips through this container's ~30 ms-RTT tunnel, and transfers —
not compute — dominate `artifacts/scene_e2e.json`. This module uploads the
scene ONCE (12 MB at 2048²), materializes the overlapping tile batch
on-device (vmapped `dynamic_slice` — a gather XLA handles natively), runs
the model over fixed-shape chunks under `lax.map` (one compiled model
body, SPMD-friendly static shapes), stitches with the exact
`stitch_tiles` crop semantics via masked `dynamic_update_slice`s in a
`lax.scan`, and downloads the (H, W) uint8 mask once.

Numerics are bit-identical to the host path (tested in
tests/test_infer.py): same grid, same zero edge-padding, same batch
padding, same row-major overwrite order with half-overlap crops.

TPU-first notes: everything is static-shape (`ny`/`nx`/chunk count are
Python ints derived from the scene shape, so one compile per scene
geometry); the per-tile crop masks are traced `>=` comparisons, not
dynamic shapes; the model weights enter as ARGUMENTS (never captured
constants — a captured device tree hangs remote compiles, CLAUDE.md).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_scene_fn(
    predict_fn: Callable, h: int, w: int, channels: int,
    tile: int, overlap: int, batch: int,
    band_dilation: Optional[int] = None,
    mesh=None,
) -> Callable:
    """Compile a (predict_params, scene_u8) -> (h, w) mask program.

    `predict_fn(predict_params, x_u8)` maps a (batch, tile, tile, C) uint8
    chunk to (batch, tile, tile) uint8 masks — the extractor's jitted
    forward (fp32/bf16 or int8). Grid math mirrors `data.tiling.tile_scene`
    / `stitch_tiles` exactly (same ny/nx, zero padding, half-overlap
    crops, row-major overwrite order).

    With `band_dilation` set, the program also computes the coastline
    band (`infer.morphology.coastline_band`, the reference's
    dilated-minus-original boundary, `predict_coastline.py:599-602`)
    on-device — the Pallas disk dilation runs inside the same program —
    and returns `(mask, band)`. That saves the mask download → re-upload
    round trip the separate `coastline_band` call pays at scene scale.

    With `mesh` set (a `jax.sharding.Mesh`), each chunk's tile batch is
    sharded across the mesh's data axes via a GSPMD constraint, so one
    scene's forward fans out over all chips of a pod slice (`batch` must
    be divisible by the data-axes size). Output is bit-identical to the
    unsharded program (tested on a virtual mesh in tests/test_parallel.py).
    """
    stride = tile - overlap
    if stride <= 0:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than tile ({tile})")
    ny = max(1, -(-max(h - overlap, 1) // stride))
    nx = max(1, -(-max(w - overlap, 1) // stride))
    n = ny * nx
    n_chunks = -(-n // batch)
    n_pad = n_chunks * batch
    hp = (ny - 1) * stride + tile
    wp = (nx - 1) * stride + tile
    half = overlap // 2
    origins = np.array(
        [(iy * stride, ix * stride) for iy in range(ny) for ix in range(nx)],
        np.int32,
    )
    crops = np.array(
        [(half if iy > 0 else 0, half if ix > 0 else 0)
         for iy in range(ny) for ix in range(nx)],
        np.int32,
    )
    lane = np.arange(tile, dtype=np.int32)

    chunk_sharding = None
    if mesh is not None:
        from coastline.parallel.mesh import batch_sharding, data_axis_size

        n_shards = data_axis_size(mesh)
        if batch % n_shards:
            raise ValueError(
                f"scene chunk batch ({batch}) must be divisible by the "
                f"mesh's data-axes size ({n_shards})")
        chunk_sharding = batch_sharding(mesh)

    @jax.jit
    def run(predict_params, scene_u8):
        padded = jnp.zeros((hp, wp, channels), scene_u8.dtype)
        padded = padded.at[:h, :w].set(scene_u8)
        org = jnp.asarray(origins)
        tiles = jax.vmap(
            lambda o: jax.lax.dynamic_slice(
                padded, (o[0], o[1], 0), (tile, tile, channels))
        )(org)
        if n_pad > n:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((n_pad - n, tile, tile, channels),
                                  tiles.dtype)])
        chunks = tiles.reshape(n_chunks, batch, tile, tile, channels)

        def fwd(c):
            if chunk_sharding is not None:
                c = jax.lax.with_sharding_constraint(c, chunk_sharding)
            return predict_fn(predict_params, c)

        masks = jax.lax.map(fwd, chunks)
        masks = masks.reshape(n_pad, tile, tile)[:n]

        def body(out, inp):
            m, o, cr = inp
            cur = jax.lax.dynamic_slice(out, (o[0], o[1]), (tile, tile))
            keep = (lane[:, None] >= cr[0]) & (lane[None, :] >= cr[1])
            return (
                jax.lax.dynamic_update_slice(
                    out, jnp.where(keep, m, cur), (o[0], o[1])),
                None,
            )

        out, _ = jax.lax.scan(
            body, jnp.zeros((hp, wp), masks.dtype),
            (masks, org, jnp.asarray(crops)))
        mask = out[:h, :w]
        if band_dilation is None:
            return mask
        from coastline.infer.morphology import coastline_band

        return mask, coastline_band(mask, band_dilation)

    return run
