"""Report-figure smoke tests: every artifact the reference produces renders
from representative inputs (SURVEY.md §2.6)."""

import os

import numpy as np


def _history(n=5):
    return {
        "train_loss": list(np.linspace(1.0, 0.2, n)),
        "val_loss": list(np.linspace(1.1, 0.3, n)),
        "val_iou": list(np.linspace(0.2, 0.9, n)),
        "val_f1": list(np.linspace(0.3, 0.95, n)),
        "val_accuracy": list(np.linspace(0.5, 0.97, n)),
    }


def _results():
    base = {
        "mean_iou": 0.9, "mean_f1_score": 0.94, "mean_accuracy": 0.95,
        "mean_precision": 0.93, "mean_recall": 0.92,
        "avg_inference_time": 0.011,
    }
    return {"Robust UNet": dict(base), "SegNet": {k: v * 0.97 for k, v in base.items()}}


def test_training_curves(tmp_path):
    from coastline.report.curves import plot_training_curves

    path = plot_training_curves(
        {"Robust UNet": _history(), "SegNet": _history()},
        str(tmp_path / "training_curves.png"),
    )
    assert os.path.getsize(path) > 10_000
    assert plot_training_curves({}, str(tmp_path / "x.png")) is None


def test_comparison_figures(tmp_path):
    from coastline.report.comparison import plot_comparison, plot_extended_comparison

    p1 = plot_comparison(_results(), str(tmp_path / "coastal_comparison.png"))
    p2 = plot_extended_comparison(_results(), str(tmp_path / "extended_comparison.png"))
    assert os.path.getsize(p1) > 10_000 and os.path.getsize(p2) > 10_000


def test_error_maps(tmp_path):
    from coastline.report.error_maps import generate_error_maps

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    targets = (rng.random((3, 32, 32)) > 0.5).astype(np.float32)
    preds = {"A": rng.random((3, 32, 32)), "B": rng.random((3, 32, 32))}
    path = generate_error_maps(images, targets, preds, str(tmp_path / "em"), n_samples=3)
    assert os.path.getsize(path) > 10_000


def test_trainer_figures(tmp_path):
    from coastline.report.trainer_viz import (
        save_confusion_matrix, save_final_report, save_progress_figure,
    )

    hist = {
        "train_losses": [1.0, 0.5], "val_losses": [1.1, 0.6],
        "learning_rates": [1e-4, 1e-4], "accuracies": [0.6, 0.8],
        "iou_scores": [0.4, 0.7], "best_model_epoch": 1, "training_time": 12.0,
    }
    p1 = save_progress_figure(hist, 1, str(tmp_path))
    p2 = save_confusion_matrix(
        np.array([[0, 1], [1, 1]]), np.array([[0, 1], [0, 1]]), 1, str(tmp_path)
    )
    p3 = save_final_report(hist, str(tmp_path))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 5_000


def test_coastsat_figure(tmp_path):
    from PIL import Image

    from coastline.report.coastsat_fig import create_analysis_figure

    water = np.zeros((64, 64), np.uint8)
    water[24:, :] = 1
    band = np.zeros_like(water)
    band[22:24, :] = 1
    result = {
        "image_path": "demo.png",
        "image_size": [64, 64],
        "water_mask": water,
        "coastline_mask": band,
        "coastlines": [[[0, 23], [63, 23]]],
        "coastline_count": 1,
        "dilation_size": 5,
        "extraction_time": "2026-08-16 00:00:00",
    }
    img = Image.new("RGB", (64, 64), (80, 90, 100))
    path = create_analysis_figure(result, str(tmp_path), img)
    assert os.path.getsize(path) > 10_000


def test_coastsat_figure_ndwi_panel(tmp_path):
    """>=4-band TIF source -> the analysis figure renders the water vs
    non-water NDWI density panel (predict_coastline.py:789-815)."""
    import numpy as np
    from PIL import Image

    from coastline.data.geotiff import compute_ndwi
    from coastline.report.coastsat_fig import create_analysis_figure

    rng = np.random.default_rng(3)
    h, w = 40, 50
    water = np.zeros((h, w), np.uint8)
    water[25:, :] = 1
    # NIR dark over water, green bright over water -> NDWI separates
    nir = np.where(water > 0, 20, 180).astype(np.uint8)
    green = np.where(water > 0, 160, 90).astype(np.uint8)
    other = rng.integers(0, 255, (h, w), dtype=np.uint8)
    frames = [Image.fromarray(b) for b in (other, green, other, nir, other)]
    tif = str(tmp_path / "scene.tif")
    frames[0].save(tif, save_all=True, append_images=frames[1:])

    ndwi = compute_ndwi(tif)
    assert ndwi is not None and ndwi.shape == (h, w)
    assert ndwi[water > 0].mean() > 0 > ndwi[water == 0].mean()

    result = {
        "image_path": tif,
        "water_mask": water,
        "coastline_mask": np.zeros((h, w), np.uint8),
        "coastlines": [[[0, 25], [w - 1, 25]]],
        "coastline_count": 1,
        "image_size": [w, h],
        "extraction_time": "2026-08-16T00:00:00",
    }
    path = create_analysis_figure(result, str(tmp_path))
    assert os.path.exists(path)

    # < 4 bands -> no NDWI
    frames[0].save(str(tmp_path / "rgb.tif"), save_all=True,
                   append_images=frames[1:3])
    assert compute_ndwi(str(tmp_path / "rgb.tif")) is None
