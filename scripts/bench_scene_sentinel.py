"""Full Sentinel-2 tile (10980 x 10980) through the device scene pipeline.

The reference handles large rasters by resizing the WHOLE scene down to
512^2 (`predict_coastline.py:433-447`), throwing away ~460x of the pixels
of a real Sentinel-2 granule. This framework's scene pipeline
(`infer/scene.py`) keeps native resolution: the 10980^2 granule uploads
once (345 MB uint8), 625 overlapping 512^2 tiles are materialized, run,
and stitched on-device under one jitted program, and the stitched mask +
coastline band download once. This measures that path end to end on a
real v5e chip — the capability headline for scene-scale serving.

Writes artifacts/scene_sentinel.json.
"""

import json
import pathlib
import time

import numpy as np

from coastline.infer.contours import extract_contours
from coastline.infer.extract import CoastlineExtractor

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "scene_sentinel.json")
SIZE = 10980  # one Sentinel-2 granule at 10 m bands
DILATION = 20


def build_granule(size: int):
    """A synthetic coastal granule at full Sentinel-2 resolution.

    One smooth sinusoidal shoreline across the full width, water below,
    textured land above — numpy-only so a 120-Mpx scene assembles in
    seconds on this container's single CPU. Returns (image, analytic
    ground-truth water mask) so the benchmark can report granule-scale
    accuracy, not just throughput.
    """
    xs = np.arange(size, dtype=np.float32)
    shoreline = (0.55 * size
                 + 0.12 * size * np.sin(2 * np.pi * xs / size * 2.3 + 0.7)
                 + 0.03 * size * np.sin(2 * np.pi * xs / size * 9.1))
    rows = np.arange(size, dtype=np.float32)[:, None]
    water = rows > shoreline[None, :]

    rng = np.random.default_rng(0)
    img = np.empty((size, size, 3), np.uint8)
    # band-by-band to keep peak host memory ~size^2 floats
    yy = rows
    xx = xs[None, :]
    for c, (land_base, water_base) in enumerate(((120, 35), (110, 55), (90, 95))):
        land = land_base + 30 * np.sin((xx + 13 * c) / 29.0) \
            + 10 * np.sin((yy + 7 * c) / 37.0)
        chan = np.where(water, float(water_base), land)
        chan += rng.normal(0, 6, (size, size))
        img[..., c] = np.clip(chan, 0, 255).astype(np.uint8)
    return img, water


def main():
    t0 = time.perf_counter()
    scene, gt_water = build_granule(SIZE)
    t_build = time.perf_counter() - t0
    print(f"granule built: {scene.shape} in {t_build:.1f}s", flush=True)

    import pickle

    import jax
    import jax.numpy as jnp

    # Trained production 2-class UNet (512^2 synthetic protocol, the zoo
    # artifact's checkpoint) so the extraction is REAL — a random-weight run
    # yields a degenerate mask and a vacuous int8 agreement of 1.0.
    ckpt = pathlib.Path(__file__).resolve().parents[1] / \
        "artifacts" / "quant_accuracy_zoo" / "trained_unet_s0.pkl"
    variables, train_iou = None, None
    if ckpt.exists():
        with open(ckpt, "rb") as f:
            variables = pickle.load(f)
        train_iou = variables.pop("_best_iou", None)
        print(f"checkpoint: {ckpt.name} (train best IoU {train_iou:.5f})",
              flush=True)
    ex = CoastlineExtractor(variables=variables, image_size=512,
                            dtype=jnp.bfloat16)

    def run(s):
        return ex.predict_scene(s, batch=8, with_band=DILATION)

    t0 = time.perf_counter()
    mask, band = run(scene)  # compile + first run
    t_first = time.perf_counter() - t0
    print(f"first run (incl. compile): {t_first:.1f}s", flush=True)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        mask, band = run(scene)
        times.append(time.perf_counter() - t0)
    t_scene = min(times)

    # Device-resident variant: pre-upload the scene once (jnp.asarray in
    # the dispatch path is then a no-op), isolating compute + download
    # from the 345 MB tunnel upload the wall numbers include.
    scene_dev = jax.device_put(scene)
    jax.block_until_ready(scene_dev)
    run(scene_dev)
    times_dev = []
    for _ in range(2):
        t0 = time.perf_counter()
        run(scene_dev)
        times_dev.append(time.perf_counter() - t0)
    t_scene_dev = min(times_dev)

    t0 = time.perf_counter()
    contours = extract_contours(band)
    t_cont = time.perf_counter() - t0

    # int8 serving mode over the identical scene program
    ex.quantize()
    mask_q, band_q = run(scene_dev)  # compile
    times_q = []
    for _ in range(2):
        t0 = time.perf_counter()
        mask_q, band_q = run(scene_dev)
        times_q.append(time.perf_counter() - t0)
    t_scene_q = min(times_q)
    agree = float((mask_q == mask).mean())

    mpx = SIZE * SIZE / 1e6
    result = {
        "scene": f"{SIZE}x{SIZE}",
        "megapixels": round(mpx, 1),
        "tiles_512": 625,
        "dilation_size": DILATION,
        "checkpoint": ckpt.name if variables is not None else None,
        "checkpoint_train_iou": (round(train_iou, 5) if train_iou else None),
        "water_fraction": round(float(mask.mean()), 4),
        # granule-scale accuracy vs the analytic shoreline (not just
        # throughput): 120.6 Mpx mask IoU against ground truth
        "granule_iou_vs_ground_truth": round(float(
            np.logical_and(mask > 0, gt_water).sum()
            / max(1, np.logical_or(mask > 0, gt_water).sum())), 5),
        "predict_scene_bf16_s": round(t_scene, 2),
        "predict_scene_bf16_device_resident_s": round(t_scene_dev, 2),
        "predict_scene_int8_device_resident_s": round(t_scene_q, 2),
        "contours_s": round(t_cont, 2),
        "total_bf16_s": round(t_scene + t_cont, 2),
        "mpx_per_s_bf16": round(mpx / t_scene, 1),
        "mpx_per_s_bf16_device_resident": round(mpx / t_scene_dev, 1),
        "mpx_per_s_int8_device_resident": round(mpx / t_scene_q, 1),
        "first_run_incl_compile_s": round(t_first, 1),
        "int8_vs_bf16_mask_agreement": round(agree, 5),
        "n_coastlines": len(contours),
        "note": ("One Sentinel-2 granule (120.6 Mpx) at native resolution "
                 "through the single-program device pipeline: scene uploads "
                 "once (345 MB uint8), 625 overlapping 512^2 tiles are cut, "
                 "forwarded (batch 8 under lax.map), stitched, and the "
                 "SE-20 coastline band (Pallas dilation) computed on-device; "
                 "mask+band download once. The reference resizes any scene "
                 "to 512^2 (predict_coastline.py:433-447), i.e. cannot "
                 "produce this artifact at all. Wall time includes the "
                 "~345 MB upload + 2x120 MB download through this "
                 "container's tunnel."),
    }
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
