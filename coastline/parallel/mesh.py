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

  * `dcn`   — optional outer multi-slice axis (`make_mesh(dcn=N)`): batch
              shards over ('dcn', 'data') jointly, so slices data-parallel
              over DCN while everything inside a slice stays on ICI. Call
              sites are unchanged (axes are addressed by name throughout);
              numerics proven equal to single-device in tests.

  * `model` — optional innermost tensor-parallel axis: parameters shard
              over their CHANNEL dimension (`param_sharding`) so each chip
              holds 1/N of every large conv kernel, its BN affine/stats
              slice, and (via `state_sharding`) the matching Adam moments —
              weight+optimizer memory scales down with the axis. GSPMD
              propagates the channel sharding through the network (convs
              contract over a sharded C_in with an all-reduce XLA inserts)
              — no hand-written collectives, numerics proven equal to
              single-device in tests. Innermost placement keeps each
              model group on adjacent ICI neighbours.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence] = None,
    dcn: int = 1,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'space') mesh over the first `n_devices` devices —
    extended with an outer 'dcn' axis when dcn > 1 (multi-slice: that axis
    ranges over slices connected by data-center network, the inner axes
    stay within a slice's ICI) and an innermost 'model' tensor-parallel
    axis when model > 1 (channel-sharded parameters via `param_sharding`).

    space=1 (default) is pure data parallelism; space>1 carves each data
    group into a spatial-partitioning subgroup. Batch sharding spans
    ('dcn', 'data') jointly, so gradient all-reduces decompose into a
    cheap intra-slice ICI reduce plus one small cross-slice DCN reduce —
    the layout GSPMD picks when the outer axis is leading. The 'model'
    axis is innermost so each tensor-parallel group sits on adjacent ICI
    neighbours, where its per-layer all-reduces are cheapest.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % (space * dcn * model) != 0:
        raise ValueError(
            f"{n} devices not divisible by space={space} x dcn={dcn} "
            f"x model={model}")
    model_dims = (model,) if model > 1 else ()
    model_names = ("model",) if model > 1 else ()
    if dcn > 1:
        inner = n // (space * dcn * model)
        # The 'dcn' axis only maps onto actual DCN links if each row of the
        # grid is one slice. Real multi-slice devices expose `slice_index`;
        # group by it (via mesh_utils, which also optimizes the intra-slice
        # ICI layout). Virtual/test meshes (CPU devices, no slice_index)
        # fall back to a naive reshape — numerics identical, topology moot.
        slice_ids = {getattr(d, "slice_index", None) for d in devices}
        if None not in slice_ids and len(slice_ids) == dcn:
            from jax.experimental import mesh_utils

            inner_shape = (1, inner, space) + model_dims
            grid = mesh_utils.create_hybrid_device_mesh(
                inner_shape, (dcn,) + (1,) * (len(inner_shape) - 1),
                devices=devices,
            )
        else:
            grid = np.asarray(devices).reshape(dcn, inner, space, *model_dims)
        return Mesh(grid, ("dcn", "data", "space") + model_names)
    grid = np.asarray(devices).reshape(
        n // (space * model), space, *model_dims)
    return Mesh(grid, ("data", "space") + model_names)


def _data_axes(mesh: Mesh):
    return ("dcn", "data") if "dcn" in mesh.axis_names else "data"


def data_axis_size(mesh: Mesh) -> int:
    """Number of shards a batch dimension splits into on this mesh."""
    axes = _data_axes(mesh)
    if isinstance(axes, str):
        return int(mesh.shape[axes])
    return int(np.prod([mesh.shape[a] for a in axes]))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharding: N over 'data' (and 'dcn' when present), H over
    'space'."""
    return NamedSharding(mesh, P(_data_axes(mesh), "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, tree):
    """Channel-shard a parameter tree over the 'model' axis.

    Every array whose LAST dimension is a multiple of (and larger than)
    the model-axis size shards that dimension: conv kernels (kh, kw, cin,
    cout) and Dense kernels (in, out) split their output channels, and
    the matching biases / BN scale-bias-mean-var vectors (C,) split the
    same way, so a layer's whole parameter group lands on one shard
    boundary. Small heads (C < axis) and scalars stay replicated. Without
    a 'model' axis this is `replicated` everywhere (so call sites can be
    unconditional).

    Tensor-parallel semantics come from GSPMD: convolutions against a
    cout-sharded kernel yield channel-sharded activations, the next conv
    contracts over that sharded C_in with an XLA-inserted all-reduce, and
    BatchNorm's per-channel statistics stay shard-local. Proven loss- and
    forward-equal to single-device in tests/test_parallel.py.
    """
    if "model" not in mesh.axis_names:
        rep = replicated(mesh)
        return jax.tree.map(lambda _: rep, tree)
    m = int(mesh.shape["model"])

    def spec(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[-1] > m and shape[-1] % m == 0:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def state_sharding(mesh: Mesh, state):
    """Sharding tree for a `train.loop.TrainState`: params, batch_stats and
    the Adam moments channel-shard via `param_sharding` (optimizer memory
    scales down with the 'model' axis — the moments mirror the params);
    step / plateau / rng scalars replicate. `jax.device_put(state,
    state_sharding(mesh, state))` places a fresh state for `mesh`."""
    rep = replicated(mesh)
    return state.replace(
        step=rep,
        params=param_sharding(mesh, state.params),
        batch_stats=param_sharding(mesh, state.batch_stats),
        opt_state=param_sharding(mesh, state.opt_state),
        plateau=jax.tree.map(lambda _: rep, state.plateau),
        rng=rep,
    )


def shard_dataset(mesh: Mesh, images: np.ndarray, masks: np.ndarray):
    """Place a host dataset across the mesh, sample-sharded over 'data'.

    Dataset arrays shard along N only (gather indices stay global); batches
    gathered from them inherit the sharding, so each chip reads its local
    HBM shard. Goes through `jax.make_array_from_process_local_data`, the
    multi-host fan-out primitive (SURVEY.md §2.8): under a multi-process
    topology each host passes only ITS samples and the runtime assembles
    the global sharded array without any host holding the full dataset;
    single-process (this container, and the virtual CPU mesh the tests
    run on) it degenerates to a sharded device_put of the whole array.

    Multi-process note: each process must pass a local slab whose samples
    correspond to its addressable devices' shards — i.e. process p loads
    samples [p*n/P, (p+1)*n/P) of the GLOBAL order. `global_shape` is
    inferred as (sum of local leading dims, *rest).
    """
    ds_sharding = NamedSharding(mesh, P(_data_axes(mesh)))
    nproc = jax.process_count()
    return (
        jax.make_array_from_process_local_data(
            ds_sharding, images, (images.shape[0] * nproc, *images.shape[1:])
        ),
        jax.make_array_from_process_local_data(
            ds_sharding, masks, (masks.shape[0] * nproc, *masks.shape[1:])
        ),
    )


def local_batch_gather(mesh: Mesh, idx, *arrays):
    """Gather a batch from sample-sharded arrays with NO dataset collective.

    A plain `images[idx]` on a 'data'-sharded array makes GSPMD prove the
    gather shard-local — which it can't for dynamic indices, so it
    all-gathers the full dataset to every device. This shard_maps the
    gather instead: each device indexes ONLY its local shard with its
    local indices, by construction collective-free
    (tests/test_parallel.py asserts the compiled HLO has no all-gather).

    `idx` is sharded over the data axes like the batch: device d's slice
    holds LOCAL indices into d's dataset shard (global index g lives on
    shard g // shard_size with local offset g % shard_size — the caller
    aligns the shuffle so each batch position lands on its own shard;
    `localize_aligned_indices` converts such a global shuffle).
    Returns per-array batches sharded over the data axes.
    """
    axes = _data_axes(mesh)
    spec = P(axes)

    def gather(local_idx, *local_arrays):
        return tuple(a[local_idx] for a in local_arrays)

    out = jax.shard_map(
        gather,
        mesh=mesh,
        in_specs=(spec,) + (spec,) * len(arrays),
        out_specs=(spec,) * len(arrays),
    )(idx, *arrays)
    return out if len(arrays) > 1 else out[0]


def pad_for_sharding(images: np.ndarray, masks: np.ndarray, n_shards: int):
    """Pad a dataset's leading dim up to a multiple of `n_shards`.

    Padding wraps the FIRST samples (real images — never zeros, so any
    batch statistics they leak into are real-image statistics, matching
    `train.loop.batch_indices`' padding policy). Returns
    (images, masks, n_real); `sharded_batch_indices` marks every padded
    sample invalid so losses/metrics never see it.
    """
    n = images.shape[0]
    if n == 0:
        raise ValueError("cannot shard an empty dataset")
    m = -(-n // n_shards)  # ceil
    pad = n_shards * m - n
    if pad:
        wrap = np.arange(pad) % n  # pad may exceed n (tiny datasets)
        images = np.concatenate([images, images[wrap]], axis=0)
        masks = np.concatenate([masks, masks[wrap]], axis=0)
    return images, masks, n


def process_local_slab(images: np.ndarray, masks: np.ndarray,
                       n_shards: int):
    """This process's contiguous slab of the globally padded sample order.

    Multi-host loading helper: pads the GLOBAL arrays with
    `pad_for_sharding` (so padding is identical on every host) and slices
    process p's samples [p*M/P, (p+1)*M/P) of the padded order M. Returns
    (local_images, local_masks, n_real_global) ready for
    `shard_device_dataset`. For datasets too large to assemble per host,
    load the same slab range directly from storage instead.
    """
    images, masks, n_real = pad_for_sharding(
        np.asarray(images), np.asarray(masks), n_shards)
    nproc = jax.process_count()
    m = images.shape[0]
    if m % nproc:
        raise ValueError(f"padded dataset size {m} not divisible by "
                         f"process count {nproc}")
    p = jax.process_index()
    lo, hi = p * m // nproc, (p + 1) * m // nproc
    return images[lo:hi], masks[lo:hi], n_real


def shard_device_dataset(mesh: Mesh, images: np.ndarray, masks: np.ndarray,
                         paths=None, *, n_valid: Optional[int] = None):
    """Sample-sharded DeviceDataset: each chip's HBM holds only its 1/k of
    the dataset (contiguous block of the sample axis), padded to divide
    evenly. `len(ds)` reports the REAL sample count; the stored (padded)
    size is `ds.images.shape[0]`. Pair with `sharded_epoch_indices` +
    `make_train_epoch(..., sharded_dataset=True)` for collective-free
    epochs (SURVEY.md §2.8).

    Under a multi-process topology (`jax.process_count() > 1`), `images`/
    `masks` are THIS process's contiguous slab of the globally PADDED
    sample order (build it with `process_local_slab`, or load the same
    range from storage) and `n_valid` must carry the GLOBAL real sample
    count — the runtime assembles the global sharded array from the
    per-process slabs without any host holding the full dataset
    (exercised for real by tests/test_multiprocess.py, VERDICT r4 item 3).
    """
    from coastline.data.pipeline import DeviceDataset

    nproc = jax.process_count()
    k = data_axis_size(mesh)
    if nproc == 1:
        images, masks, n_real = pad_for_sharding(
            np.asarray(images), np.asarray(masks), k)
        if n_valid is None:
            n_valid = n_real
        if paths is not None:
            # wrap-pad paths with the same rule as pad_for_sharding so
            # stored index i always names sample i's source (ADVICE r4: an
            # unpadded list misaligns for any index >= n_real)
            paths = list(paths)
            paths += [paths[i % n_real]
                      for i in range(images.shape[0] - len(paths))]
    else:
        if n_valid is None:
            raise ValueError(
                "multi-process shard_device_dataset needs n_valid = the "
                "GLOBAL real sample count (inputs are per-process slabs "
                "of the padded global order; see process_local_slab)")
        if (images.shape[0] * nproc) % k:
            raise ValueError(
                f"global stored size {images.shape[0] * nproc} not "
                f"divisible by the data-axis size {k}")
    di, dm = shard_dataset(mesh, np.ascontiguousarray(images),
                           np.ascontiguousarray(masks))
    return DeviceDataset(di, dm, paths, n_valid=n_valid)


def sharded_batch_indices(n_real: int, n_stored: int, batch_size: int,
                          n_shards: int, *, shuffle: bool,
                          rng: np.random.Generator):
    """Shard-aligned epoch indices: (num_batches, B) GLOBAL indices + a
    validity mask, such that batch position j always reads from shard
    j // (B / n_shards) — the alignment `local_batch_gather` requires.

    Each shard's real samples are permuted independently and dealt
    B/n_shards per batch (torch DistributedSampler semantics: stratified
    -by-shard shuffling instead of a global shuffle — a documented,
    standard deviation for sample-sharded loading). Every real sample
    appears exactly once valid per epoch; shard-tail padding wraps the
    shard's own order and is masked invalid, as are the dataset's
    `pad_for_sharding` duplicates (global index >= n_real).
    """
    if batch_size % n_shards:
        raise ValueError(
            f"batch_size={batch_size} must divide by the data-axis size "
            f"{n_shards} for sample-sharded training")
    if n_stored % n_shards:
        raise ValueError(f"stored dataset size {n_stored} not divisible by "
                         f"{n_shards}; use pad_for_sharding")
    m = n_stored // n_shards  # shard size
    per = batch_size // n_shards
    real = [int(np.clip(n_real - s * m, 0, m)) for s in range(n_shards)]
    if max(real) == 0:
        raise ValueError("dataset has no real samples")
    num_batches = -(-max(real) // per)
    total = num_batches * per
    cols_idx, cols_valid = [], []
    for s in range(n_shards):
        r = real[s]
        if r == 0:  # shard holds only padding: emit index 0, all invalid
            order = np.zeros(total, dtype=np.int64)
        else:
            order = rng.permutation(r) if shuffle else np.arange(r)
            order = order[np.arange(total) % r]
        cols_idx.append((order + s * m).reshape(num_batches, per))
        v = (np.arange(total) < r).astype(np.float32)
        cols_valid.append(v.reshape(num_batches, per))
    return (
        np.concatenate(cols_idx, axis=1).astype(np.int32),
        np.concatenate(cols_valid, axis=1),
    )


def sharded_epoch_indices(mesh: Mesh, ds, batch_size: int, *, shuffle: bool,
                          rng: np.random.Generator):
    """LOCAL per-shard epoch indices + validity for a `shard_device_dataset`
    dataset — ready to feed a `sharded_dataset=True` epoch."""
    k = data_axis_size(mesh)
    n_stored = int(ds.images.shape[0])
    gidx, valid = sharded_batch_indices(
        len(ds), n_stored, batch_size, k, shuffle=shuffle, rng=rng)
    return localize_aligned_indices(gidx, n_stored, k), valid


def localize_aligned_indices(global_idx: np.ndarray, n: int, n_shards: int):
    """Global->local index conversion for an aligned batch.

    A batch of global indices is 'aligned' when position j's index lives
    on the shard that produces position j of the batch (j*n_shards//len ==
    idx*n_shards//n). Raises if not — misaligned batches need a real
    collective and should use the plain gather path.
    """
    global_idx = np.asarray(global_idx)
    b = global_idx.shape[-1]
    shard = n // n_shards
    owner = global_idx // shard
    expect = np.arange(b) * n_shards // b
    if not np.all(owner == expect):
        raise ValueError(
            "batch indices are not shard-aligned; use a replicated dataset "
            "or the plain gather (which all-gathers)"
        )
    return global_idx % shard
