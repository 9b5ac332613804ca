"""Host->device input pipeline.

Design (contrast with the reference, SURVEY.md §3.1 hot loops): the
reference decodes PNGs, rasterizes polygons and LANCZOS-resizes *per item,
per epoch* inside DataLoader workers (num_workers=0, single process). Here
decoding/rasterizing/resizing happens ONCE at cache-build; the whole dataset
is pushed to HBM as uint8 (4x smaller than f32) and every epoch reads it via
on-device gathers. Normalization/augmentation fuse into the train step.
"""

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from coastline.data.rasterize import mask_from_labelme

# torchvision Normalize constants (`/root/reference/Main_Final.py:700`)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Device-resident uint8 caches above this are placed host-side instead
# (HostDataset): ~half a v5e chip's 16 GB HBM, leaving room for params,
# optimizer state and activations. Override via env or make_dataset().
DEFAULT_MAX_DEVICE_BYTES = int(
    os.environ.get("COASTLINE_MAX_DEVICE_DATASET_BYTES", 8 << 30)
)


@dataclass
class DeviceDataset:
    """Whole dataset resident on device: images uint8 (N,H,W,3), masks uint8
    (N,H,W) — {0,1} water masks (BCE zoo) or class ids (2-class UNet)."""

    images: jnp.ndarray
    masks: jnp.ndarray
    paths: Optional[List[str]] = None  # Extended variant returns paths
                                       # (Extended_Baseline_Comparison.py:70)
    n_valid: Optional[int] = None  # real sample count when the arrays carry
                                   # wrap-padding (parallel.mesh
                                   # shard_device_dataset); len() honors it

    def __len__(self):
        return int(self.n_valid if self.n_valid is not None
                   else self.images.shape[0])

    @staticmethod
    def from_numpy(images: np.ndarray, masks: np.ndarray, paths=None,
                   sharding=None) -> "DeviceDataset":
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jax.device_put
        return DeviceDataset(put(np.ascontiguousarray(images)),
                             put(np.ascontiguousarray(masks)), paths)


@dataclass
class HostDataset:
    """Host-resident uint8 cache for datasets too large to park in HBM.

    Same (images, masks, paths, __len__) surface as DeviceDataset, but the
    arrays stay numpy; the train loop uploads `superbatch` batches at a
    time (double-buffered device_put overlapping the previous superbatch's
    compute — coastline.train.loop._chunk_stream). The reference streams
    from disk per item per epoch (`Main_Final.py:40-54`), which has no HBM
    ceiling but re-decodes forever; this keeps decode-once semantics with
    an O(superbatch) device footprint. Training numerics are identical to
    the resident path: the same global shuffle is gathered host-side per
    chunk, so every batch's contents and order match exactly
    (tests/test_train.py::test_host_dataset_training_matches_resident).
    """

    images: np.ndarray
    masks: np.ndarray
    paths: Optional[List[str]] = None
    superbatch: int = 32  # batches uploaded per chunk
    sharding: object = None  # applied to each uploaded chunk (mesh runs)

    def __len__(self):
        return int(self.images.shape[0])


def dataset_nbytes(images: np.ndarray, masks: np.ndarray) -> int:
    return int(images.nbytes + masks.nbytes)


def _per_device_nbytes(a: np.ndarray, sharding) -> int:
    """Bytes ONE device holds for `a` under `sharding` (a.nbytes if None).

    A dataset sharded 8-ways costs each chip 1/8th of its total; the
    device-resident budget must compare against that, not the global size,
    or multi-chip runs get demoted to host-chunked uploads for datasets
    that fit their mesh comfortably."""
    if sharding is None:
        return int(a.nbytes)
    try:
        shard = sharding.shard_shape(np.shape(a))
        return int(np.prod(shard)) * a.dtype.itemsize
    except Exception:  # non-NamedSharding placements: assume unsharded
        return int(a.nbytes)


def make_dataset(images: np.ndarray, masks: np.ndarray, paths=None,
                 sharding=None, placement: str = "auto",
                 max_device_bytes: Optional[int] = None, superbatch: int = 32):
    """Build a device- or host-resident dataset.

    placement='auto' picks DeviceDataset while the uint8 cache fits the
    device budget and HostDataset (chunked uploads) above it — with a log
    line, so an eventual OOM is never mysterious. placement='device'
    raises a sized, actionable error instead of letting XLA fail with an
    opaque allocation message."""
    limit = DEFAULT_MAX_DEVICE_BYTES if max_device_bytes is None else max_device_bytes
    # The budget is PER CHIP: a mesh-sharded dataset costs each device only
    # its shard, so compare the largest per-device footprint, not the total.
    nbytes = (_per_device_nbytes(images, sharding)
              + _per_device_nbytes(masks, sharding))
    total = dataset_nbytes(images, masks)
    if placement == "device" and nbytes > limit:
        raise ValueError(
            f"dataset is {total / 2**30:.2f} GiB "
            f"({nbytes / 2**30:.2f} GiB per device) but the device-resident "
            f"budget is {limit / 2**30:.2f} GiB/chip: a whole-dataset "
            f"device_put would OOM the chip's HBM once activations are "
            f"added. Use placement='host' (chunked uploads), raise "
            f"max_device_bytes / COASTLINE_MAX_DEVICE_DATASET_BYTES, or "
            f"shard over more devices (parallel.mesh.shard_dataset)."
        )
    if placement == "host" or (placement == "auto" and nbytes > limit):
        if placement == "auto":
            print(
                f"dataset ({total / 2**30:.2f} GiB, "
                f"{nbytes / 2**30:.2f} GiB/device) exceeds the "
                f"device-resident budget ({limit / 2**30:.2f} GiB/chip); "
                f"using host-resident cache with {superbatch}-batch chunked "
                f"uploads"
            )
        return HostDataset(np.ascontiguousarray(images),
                           np.ascontiguousarray(masks), paths, superbatch,
                           sharding)
    return DeviceDataset.from_numpy(images, masks, paths, sharding)


def load_image_rgb(path: str, fallback_size=(512, 512)) -> Image.Image:
    """RGB loader with the reference's gray-fallback (`Main_Final.py:56-60`).

    Raw GeoTIFFs route through the NIR-R-G water-enhancement ingest, the
    production dataset's behavior
    (`train_water_segmentation.py:89-101,103-174`)."""
    try:
        if path.lower().endswith((".tif", ".tiff")):
            from coastline.data.geotiff import load_tif_enhanced

            rgb, _ = load_tif_enhanced(path)
            return Image.fromarray(rgb)
        return Image.open(path).convert("RGB")
    except Exception:
        return Image.new("RGB", fallback_size, (128, 128, 128))


def load_pair(
    image_path: str,
    label_path: str,
    image_size: Tuple[int, int] = (512, 512),
    resample=Image.LANCZOS,
) -> Tuple[np.ndarray, np.ndarray]:
    """One (image, mask) pair exactly as `CoastalDataset.__getitem__` builds
    it (`Main_Final.py:40-54`): mask rasterized at native size, image LANCZOS
    -resized, mask NEAREST-resized. Returns uint8 (H,W,3), uint8 (H,W)."""
    image = load_image_rgb(image_path)
    mask = mask_from_labelme(label_path, image.size)
    image = image.resize(image_size, resample)
    mask_img = Image.fromarray(mask).resize(image_size, Image.NEAREST)
    return np.asarray(image, np.uint8), np.asarray(mask_img, np.uint8)


def pair_files(
    images_dir: str,
    labels_dir: str,
    extensions: Tuple[str, ...] = (".png", ".jpg", ".jpeg"),
) -> Tuple[List[str], List[str]]:
    """Sorted-filename pairing of images with same-stem Labelme JSONs
    (`Main_Final.py:671-686`). The comparison protocol pairs PNG/JPEG only;
    pass extensions=(..., '.tif', '.tiff') for the production trainer's
    raw-GeoTIFF intake (enhanced on load, train_water_segmentation.py:90-92)."""
    image_files, label_files = [], []
    for name in sorted(os.listdir(images_dir)):
        if name.lower().endswith(extensions):
            stem = os.path.splitext(name)[0]
            label = os.path.join(labels_dir, f"{stem}.json")
            if os.path.exists(label):
                image_files.append(os.path.join(images_dir, name))
                label_files.append(label)
    return image_files, label_files


def sequential_split(items: Sequence, fraction: float = 0.8):
    """Deterministic sequential 80/20 split — the comparison-protocol split
    the published numbers depend on (`Main_Final.py:692-694`)."""
    split = int(fraction * len(items))
    return list(items[:split]), list(items[split:])


def seeded_split(items: Sequence, test_size: float = 0.2, seed: int = 42):
    """Shuffled split with fixed seed — the production-trainer protocol
    (`train_water_segmentation.py:810-812`, sklearn train_test_split
    semantics: permutation by seed, test fraction from the front)."""
    items = list(items)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(items))
    n_test = int(np.ceil(test_size * len(items)))
    test_idx, train_idx = order[:n_test], order[n_test:]
    return [items[i] for i in train_idx], [items[i] for i in test_idx]


def build_dataset(
    image_paths: Sequence[str],
    label_paths: Sequence[str],
    image_size: Tuple[int, int] = (512, 512),
    with_paths: bool = False,
    sharding=None,
) -> DeviceDataset:
    """Decode + rasterize + resize once; stack and place (device-resident
    while it fits the HBM budget, host-resident chunked uploads above)."""
    images, masks = [], []
    for img_path, lbl_path in zip(image_paths, label_paths):
        img, msk = load_pair(img_path, lbl_path, image_size)
        images.append(img)
        masks.append(msk)
    return make_dataset(
        np.stack(images), np.stack(masks),
        list(image_paths) if with_paths else None, sharding,
    )


def prepare_datasets(
    images_dir: str,
    labels_dir: str,
    image_size: Tuple[int, int] = (512, 512),
    split: str = "sequential",
    sharding=None,
):
    """Full `prepare_dataset` parity (`Main_Final.py:671-711`): pair, split
    80/20, build device-resident train/val datasets."""
    image_files, label_files = pair_files(images_dir, labels_dir)
    if not image_files:
        return None
    pairs = list(zip(image_files, label_files))
    if split == "sequential":
        train_pairs, val_pairs = sequential_split(pairs)
    else:
        train_pairs, val_pairs = seeded_split(pairs)
    train = build_dataset([p[0] for p in train_pairs], [p[1] for p in train_pairs],
                          image_size, sharding=sharding)
    val = build_dataset([p[0] for p in val_pairs], [p[1] for p in val_pairs],
                        image_size, sharding=sharding)
    return train, val
