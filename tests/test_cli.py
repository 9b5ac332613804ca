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


def test_predict_cli_missing_checkpoint(tmp_path, capsys):
    from PIL import Image

    from coastline.cli.predict import main

    path = str(tmp_path / "x.png")
    Image.new("RGB", (32, 32)).save(path)
    rc = main([path, "--checkpoint", str(tmp_path / "nope"), "--image-size", "64"])
    assert rc == 1
    assert "hint" in capsys.readouterr().out
