"""GeoTIFF preprocessing parity — pinned directly against the reference's
`tif_to_image.enhance_image` / band-combination logic executed from the
read-only mount (skipped if absent)."""

import os
import sys
import types

import numpy as np
import pytest

from coastline.data.geotiff import (
    combine_bands,
    enhance_image,
    normalize_for_display,
    percentile_stretch,
    read_bands,
)

REFERENCE = "/root/reference"


def _ref_converter():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    for name in ("osgeo", "osgeo.gdal"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__file__ = "<stub>"
            sys.modules[name] = m
    sys.modules["osgeo"].gdal = sys.modules["osgeo.gdal"]
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import tif_to_image

    return tif_to_image.TIFToImageConverter.__new__(tif_to_image.TIFToImageConverter)


def test_enhance_image_matches_reference():
    conv = _ref_converter()
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 4000, (50, 60, 3)).astype(np.float64)
    ref = conv.enhance_image(rgb.copy(), enhance_water=True)
    got = enhance_image(rgb.copy(), enhance_water=True)
    np.testing.assert_allclose(got.astype(np.float64), ref.astype(np.float64), atol=1)


def test_enhance_image_no_water_matches_reference():
    conv = _ref_converter()
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (30, 40, 3)).astype(np.float64)
    ref = conv.enhance_image(rgb.copy(), enhance_water=False)
    got = enhance_image(rgb.copy(), enhance_water=False)
    np.testing.assert_allclose(got.astype(np.float64), ref.astype(np.float64), atol=1)


def test_band_combination_rules():
    five = np.stack([np.full((4, 4), i, np.float32) for i in range(5)])
    rgb, combo = combine_bands(five, enhance_water=True)
    assert "NIR" in combo
    np.testing.assert_array_equal(rgb[..., 0], 4)  # NIR = band index 4
    np.testing.assert_array_equal(rgb[..., 1], 3)
    np.testing.assert_array_equal(rgb[..., 2], 2)

    four = five[:4]  # 4 bands: reference's bands[4] raises -> standard RGB
    rgb, combo = combine_bands(four, enhance_water=True)
    assert combo == "standard RGB"
    np.testing.assert_array_equal(rgb[..., 0], 2)

    one = five[:1]
    rgb, combo = combine_bands(one, enhance_water=True)
    assert combo == "grayscale" and rgb.shape[-1] == 3


def test_percentile_stretch_constant_band():
    band = np.full((8, 8), 7.0)
    out = percentile_stretch(band)
    assert np.all(out == 7.0)  # degenerate range -> clip only


def test_pil_tiff_backend_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (20, 30), dtype=np.uint8))
              for _ in range(5)]
    path = str(tmp_path / "t.tif")
    frames[0].save(path, save_all=True, append_images=frames[1:])
    bands, meta = read_bands(path)
    assert bands.shape == (5, 20, 30)
    assert meta["bands_count"] == 5


def test_training_dataset_accepts_raw_tifs(tmp_path):
    """Production-dataset capability (train_water_segmentation.py:90-92):
    raw multi-band TIFFs load with water enhancement applied."""
    import json

    from PIL import Image

    from coastline.data.pipeline import build_dataset, pair_files

    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (40, 50), dtype=np.uint8))
              for _ in range(5)]
    img_dir = tmp_path / "imgs"
    lbl_dir = tmp_path / "lbls"
    img_dir.mkdir(), lbl_dir.mkdir()
    frames[0].save(str(img_dir / "a.tif"), save_all=True, append_images=frames[1:])
    with open(lbl_dir / "a.json", "w") as f:
        json.dump({"shapes": [{"label": "water",
                               "points": [[0, 0], [20, 0], [20, 20]]}]}, f)

    imgs, lbls = pair_files(str(img_dir), str(lbl_dir),
                            extensions=(".png", ".tif", ".tiff"))
    assert len(imgs) == 1
    ds = build_dataset(imgs, lbls, (32, 32))
    assert ds.images.shape == (1, 32, 32, 3)
    assert ds.masks.sum() > 0
    # comparison protocol still ignores TIFs by default
    imgs_default, _ = pair_files(str(img_dir), str(lbl_dir))
    assert imgs_default == []
