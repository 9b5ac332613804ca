"""Device mesh + GSPMD sharding layer (SURVEY.md §2.8, §5.8).

The reference has no distributed code of any kind (single
`torch.device(...)`, DataLoader(num_workers=0)). This module is the
TPU-native capability the north star mandates: a `jax.sharding.Mesh` with

  * `data`  — batch-parallel axis over ICI; gradients all-reduce via the
              collectives GSPMD inserts (no hand-written communication).
  * `space` — optional spatial axis sharding image rows, letting one large
              scene's convolutions partition across chips with XLA-managed
              halo exchange (the reference's only answer to large rasters
              is host-side downscaling).

An outer `dcn` axis can be prepended for future multi-slice without
touching call sites (mesh axes are addressed by name throughout).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'space') mesh over the first `n_devices` devices.

    space=1 (default) is pure data parallelism; space>1 carves each data
    group into a spatial-partitioning subgroup.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % space != 0:
        raise ValueError(f"{n} devices not divisible by space={space}")
    grid = np.asarray(devices).reshape(n // space, space)
    return Mesh(grid, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharding: N over 'data', H over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_dataset(mesh: Mesh, images: np.ndarray, masks: np.ndarray):
    """Place a host dataset across the mesh, sample-sharded over 'data'.

    Dataset arrays shard along N only (gather indices stay global); batches
    gathered from them inherit the sharding, so each chip reads its local
    HBM shard. Uses `jax.make_array_from_process_local_data` semantics via
    device_put with a NamedSharding (single-process here).
    """
    ds_sharding = NamedSharding(mesh, P("data"))
    return (
        jax.device_put(images, ds_sharding),
        jax.device_put(masks, ds_sharding),
    )
