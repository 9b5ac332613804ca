"""CLI smoke tests — the surfaces users actually touch. Kept light: the
convert CLI is pure host work; predict runs a 64px model.

(The bench_all and train CLIs run full training loops and are exercised
end-to-end out-of-band; their building blocks are covered by
tests/test_train.py and tests/test_trainer.py.)
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def tif_tree(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = [
        Image.fromarray(rng.integers(0, 255, (40, 50), dtype=np.uint8))
        for _ in range(5)
    ]
    d = tmp_path / "data" / "2021"
    d.mkdir(parents=True)
    frames[0].save(str(d / "scene.tif"), save_all=True, append_images=frames[1:])
    return tmp_path


def test_convert_cli(tif_tree, capsys):
    from coastline.cli.convert import main

    out = str(tif_tree / "out")
    assert main(["--input", str(tif_tree / "data"), "--output", out]) == 0
    assert os.path.exists(os.path.join(out, "converted", "scene.png"))
    with open(os.path.join(out, "metadata", "scene.json")) as f:
        meta = json.load(f)
    assert meta["bands_count"] == 5
    assert "NIR" in meta["enhancement_type"]
    with open(os.path.join(out, "conversion_summary.json")) as f:
        assert json.load(f)["converted_files"] == 1


def test_convert_cli_empty_dir(tmp_path):
    from coastline.cli.convert import main

    assert main(["--input", str(tmp_path), "--output", str(tmp_path / "o")]) == 0


def test_predict_cli_random_weights(tmp_path):
    from PIL import Image

    from coastline.cli.predict import main
    from coastline.data.synthetic import make_scene

    img, _, _ = make_scene(np.random.default_rng(0), size=64)
    path = str(tmp_path / "scene.png")
    Image.fromarray(img).save(path)
    out = str(tmp_path / "out")
    rc = main([path, "--random-weights", "--image-size", "64",
               "--output", out, "--dilation", "5"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "scene_water_mask.png"))
    assert os.path.exists(os.path.join(out, "scene_coastlines.json"))


def test_predict_cli_scene_full_artifact_set(tmp_path):
    """--scene (tiled native-resolution mode) writes the SAME artifact set
    as the single-image path: masks at native scene size, the polylines
    JSON, and the analysis figure (no geojson for non-geo PNG input)."""
    import json as _json

    from PIL import Image

    from coastline.cli.predict import main
    from coastline.data.synthetic import make_scene

    img, _, _ = make_scene(np.random.default_rng(0), size=64)
    big = np.tile(img, (2, 3, 1))  # 128x192 scene, larger than the 64 tile
    path = str(tmp_path / "scene.png")
    Image.fromarray(big).save(path)
    out = str(tmp_path / "out")
    rc = main([path, "--random-weights", "--image-size", "64",
               "--output", out, "--scene", "--dilation", "5"])
    assert rc == 0
    mask = np.asarray(Image.open(os.path.join(out, "scene_water_mask.png")))
    assert mask.shape == (128, 192)  # native resolution, not model size
    assert os.path.exists(os.path.join(out, "scene_coastline_mask.png"))
    with open(os.path.join(out, "scene_coastlines.json")) as f:
        payload = _json.load(f)
    assert payload["image_size"] == [192, 128]
    assert payload["dilation_size"] == 5
    assert not os.path.exists(os.path.join(out, "scene_coastlines.geojson"))


def test_predict_cli_int8(tmp_path):
    from PIL import Image

    from coastline.cli.predict import main
    from coastline.data.synthetic import make_scene

    img, _, _ = make_scene(np.random.default_rng(0), size=64)
    path = str(tmp_path / "scene.png")
    Image.fromarray(img).save(path)
    out = str(tmp_path / "out")
    rc = main([path, "--random-weights", "--image-size", "64",
               "--output", out, "--int8"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "scene_water_mask.png"))


def test_predict_cli_save_quantized_flag_validation(tmp_path):
    """--save-quantized without --int8 (or combined with --quantized) is a
    usage error — previously the request was silently dropped and no .npz
    was ever written."""
    import pytest

    from coastline.cli.predict import main

    with pytest.raises(SystemExit) as e:
        main(["x.png", "--save-quantized", str(tmp_path / "q.npz")])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        main(["x.png", "--quantized", "a.npz", "--int8",
              "--save-quantized", str(tmp_path / "q.npz")])
    assert e.value.code == 2


def test_predict_cli_quantized_artifact(tmp_path):
    """--int8 --save-quantized writes a serving .npz; --quantized serves
    from it without any checkpoint (masks identical)."""
    from PIL import Image

    from coastline.cli.predict import main
    from coastline.data.synthetic import make_scene

    img, _, _ = make_scene(np.random.default_rng(0), size=64)
    path = str(tmp_path / "scene.png")
    Image.fromarray(img).save(path)
    npz = str(tmp_path / "unet_int8.npz")
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    rc = main([path, "--random-weights", "--image-size", "64",
               "--output", out1, "--int8", "--save-quantized", npz])
    assert rc == 0 and os.path.exists(npz)
    rc = main([path, "--image-size", "64", "--output", out2,
               "--quantized", npz])
    assert rc == 0
    m1 = np.asarray(Image.open(os.path.join(out1, "scene_water_mask.png")))
    m2 = np.asarray(Image.open(os.path.join(out2, "scene_water_mask.png")))
    np.testing.assert_array_equal(m1, m2)


def test_predict_cli_missing_checkpoint(tmp_path, capsys):
    from PIL import Image

    from coastline.cli.predict import main

    path = str(tmp_path / "x.png")
    Image.new("RGB", (32, 32)).save(path)
    rc = main([path, "--checkpoint", str(tmp_path / "nope"), "--image-size", "64"])
    assert rc == 1
    assert "hint" in capsys.readouterr().out


def test_bench_all_per_model_protocol():
    """The unified runner must reproduce each source harness's scheduler
    wiring: the comne four step plateau on VAL loss with patience 3
    (`/root/reference/comne.py:654,723`), everything else on TRAIN loss
    with patience 5 (`Main_Final.py:555,605`) — with the reference epoch
    budgets (`Main_Final.py:862-865`, `comne.py:978-983`)."""
    from coastline.cli.bench_all import COMNE_MODELS, model_train_config

    expected = {
        "Robust UNet": ("train", 5, 20),
        "DeepLabV3+": ("train", 5, 25),
        "YOLO-SEG": ("train", 5, 20),
        "SegNet": ("val", 3, 15),
        "PSPNet": ("val", 3, 20),
        "Fast-SCNN": ("val", 3, 25),
        "ENet": ("val", 3, 20),
        "WaterNet": ("train", 5, 20),
    }
    for name, (on, patience, epochs) in expected.items():
        cfg = model_train_config(name)
        assert (cfg.plateau_on, cfg.plateau_patience, cfg.epochs) == (
            on, patience, epochs
        ), name
    # --protocol forces one wiring for every model
    for name in ("Robust UNet", "SegNet"):
        forced = model_train_config(name, protocol="comne")
        assert (forced.plateau_on, forced.plateau_patience) == ("val", 3)
        forced = model_train_config(name, protocol="main")
        assert (forced.plateau_on, forced.plateau_patience) == ("train", 5)
    assert set(COMNE_MODELS) == {"SegNet", "PSPNet", "Fast-SCNN", "ENet"}


def test_full_pipeline_chain(tmp_path):
    """The whole user journey across the reference's entry points (SURVEY
    §2.7): multi-band TIFs -> convert CLI -> train CLI -> predict CLI on a
    raw TIF -> masks + polyline JSON + CoastSat-style analysis figure with
    the NDWI panel."""
    import glob

    from PIL import Image

    from coastline.cli.convert import main as convert_main
    from coastline.cli.predict import main as predict_main
    from coastline.cli.train import main as train_main
    from coastline.data.synthetic import make_scene

    size, n = 64, 6
    rng = np.random.default_rng(5)
    raw = tmp_path / "raw" / "2024"
    raw.mkdir(parents=True)
    ann = tmp_path / "labelme" / "annotations"
    ann.mkdir(parents=True)

    for i in range(n):
        img, _, poly = make_scene(rng, size)
        # 5-band TIF: bands[4],[3],[2] = NIR-R-G combo -> the scene RGB;
        # band[1] bright over water so the NDWI panel separates.
        water_green = np.where(img[..., 2] > img[..., 0], 200, 80).astype(np.uint8)
        bands = [rng.integers(0, 255, (size, size), dtype=np.uint8),
                 water_green, img[..., 2], img[..., 1], img[..., 0]]
        frames = [Image.fromarray(b) for b in bands]
        frames[0].save(str(raw / f"scene_{i:02d}.tif"), save_all=True,
                       append_images=frames[1:])
        with open(ann / f"scene_{i:02d}.json", "w") as f:
            json.dump({"shapes": [{"label": "water",
                                   "points": [[float(x), float(y)]
                                              for x, y in poly]}]}, f)

    # 1. convert
    out_root = str(tmp_path / "labelme")
    assert convert_main(["--input", str(tmp_path / "raw"),
                         "--output", out_root]) == 0
    converted = sorted(glob.glob(os.path.join(out_root, "converted", "*.png")))
    assert len(converted) == n

    # 2. train (production trainer, tiny protocol)
    models_dir = str(tmp_path / "models")
    assert train_main([
        "--images-dir", os.path.join(out_root, "converted"),
        "--labels-dir", str(ann), "--epochs", "1", "--batch-size", "2",
        "--image-size", str(size), "--dtype", "float32", "--no-augment",
        "--save-dir", models_dir,
    ]) == 0

    # 3. predict on a RAW TIF (water-enhanced ingest + NDWI figure path)
    results = str(tmp_path / "results")
    assert predict_main([
        str(raw / "scene_00.tif"), "--checkpoint", models_dir,
        "--output", results, "--dilation", "5", "--image-size", str(size),
    ]) == 0
    assert os.path.exists(os.path.join(results, "scene_00_water_mask.png"))
    assert os.path.exists(os.path.join(results, "scene_00_coastline_mask.png"))
    with open(os.path.join(results, "scene_00_coastlines.json")) as f:
        payload = json.load(f)
    assert "coastlines" in payload and "image_size" in payload
    figs = glob.glob(os.path.join(results, "scene_00*analysis*.png"))
    assert figs, os.listdir(results)


def test_predict_cli_batch_scene(tmp_path):
    """--batch --scene runs the native-resolution tiled pipeline per file
    (the per-year workflow feeding cli.change) instead of silently falling
    back to the 512-downscale batch path, and one corrupt file degrades to
    a per-image failure rather than aborting the directory run."""
    from PIL import Image

    from coastline.cli.predict import main
    from coastline.data.synthetic import make_scene

    img, _, _ = make_scene(np.random.default_rng(0), size=64)
    big = np.tile(img, (2, 3, 1))  # 128x192, larger than the 64 tile
    d = tmp_path / "years"
    d.mkdir()
    for year in (2020, 2021):
        Image.fromarray(big).save(str(d / f"{year}.png"))
    (d / "2022.png").write_bytes(b"not a png")
    out = str(tmp_path / "out")
    rc = main([str(d), "--batch", "--scene", "--random-weights",
               "--image-size", "64", "--output", out, "--dilation", "5"])
    assert rc == 0  # two successes, one per-image failure
    for year in (2020, 2021):
        mask = np.asarray(Image.open(os.path.join(out, f"{year}_water_mask.png")))
        assert mask.shape == (128, 192)  # native resolution per scene
        assert os.path.exists(os.path.join(out, f"{year}_coastlines.json"))
    assert not os.path.exists(os.path.join(out, "2022_water_mask.png"))
