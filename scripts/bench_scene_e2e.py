"""End-to-end scene extraction on the real chip, with a stage breakdown.

The production scene path (`predict` CLI `--scene`): tile a native-
resolution scene into 512^2 tiles -> batched jitted forward+argmax ->
stitch -> coastline band via the (row-banded) Pallas dilation -> host
contour tracing. This measures each stage at 2048^2 so the artifact shows
where scene time goes and that the dilation is no longer a bottleneck (and the int8 serving mode runs the same tiled path)
(it was 97 ms of XLA conv per scene before pallas/morphology.py).

Writes artifacts/scene_e2e.json.
"""

import json
import pathlib
import time

import numpy as np

from coastline.data.synthetic import make_scene
from coastline.infer.extract import CoastlineExtractor
from coastline.infer.morphology import coastline_band
from coastline.infer.contours import extract_contours

OUT = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / "scene_e2e.json"
SIZE = 2048
DILATION = 20


def timed(fn, *args, repeat=3, **kw):
    fn(*args, **kw)  # warm/compile
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        np.asarray(out) if not isinstance(out, (list, tuple)) else out
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    rng = np.random.default_rng(0)
    # assemble a 2048^2 scene (and its ground-truth mask) from 4x4 tiles
    pairs = [make_scene(rng, size=512)[:2] for _ in range(16)]
    scene = np.concatenate(
        [np.concatenate([pairs[r * 4 + c][0] for c in range(4)], axis=1)
         for r in range(4)], axis=0)
    gt_mask = np.concatenate(
        [np.concatenate([pairs[r * 4 + c][1] for c in range(4)], axis=1)
         for r in range(4)], axis=0).astype(np.uint8)
    assert scene.shape == (SIZE, SIZE, 3)

    ex = CoastlineExtractor(image_size=512)  # random weights: timing only

    t_pred, mask = timed(ex.predict_scene, scene, 8)
    t_pred_host, mask_host = timed(
        lambda s, b: ex.predict_scene(s, b, device_pipeline=False), scene, 8)
    np.testing.assert_array_equal(mask, mask_host)  # on-chip path identity
    ex.quantize()  # int8 serving mode on the same tiled path
    t_pred_int8, _ = timed(ex.predict_scene, scene, 8)
    t_pred_int8_host, _ = timed(
        lambda s, b: ex.predict_scene(s, b, device_pipeline=False), scene, 8)
    # band + contours on the scene's TRUE water mask so the artifact shows
    # real coastlines (prediction quality is benched elsewhere)
    t_band, band = timed(lambda m: np.asarray(coastline_band(m, DILATION)), gt_mask)
    t_cont, contours = timed(extract_contours, band)

    result = {
        "scene": f"{SIZE}x{SIZE}",
        "dilation_size": DILATION,
        "predict_scene_ms": round(t_pred * 1e3, 1),
        "predict_scene_host_tiling_ms": round(t_pred_host * 1e3, 1),
        "predict_scene_int8_ms": round(t_pred_int8 * 1e3, 1),
        "predict_scene_int8_host_tiling_ms": round(t_pred_int8_host * 1e3, 1),
        "coastline_band_ms": round(t_band * 1e3, 2),
        "contours_ms": round(t_cont * 1e3, 1),
        "total_ms": round((t_pred + t_band + t_cont) * 1e3, 1),
        "n_coastlines": len(contours),
        "note": ("predict_scene now runs the single-program device pipeline "
                 "(infer/scene.py): the scene uploads once and the stitched "
                 "mask downloads once, vs the host tiling path's per-chunk "
                 "tile round-trips (the *_host_tiling_ms rows; outputs "
                 "asserted identical on-chip). Remaining time is the one "
                 "scene upload + mask download over this container's "
                 "~30ms-RTT tunnel. coastline_band moves ~20MB round-trip; "
                 "device time for the row-banded Pallas dilation itself is "
                 "0.25 ms at this size vs 97 ms for the XLA convolution it "
                 "replaced (artifacts/bench_dilate.json)"),
    }
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
