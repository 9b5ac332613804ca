"""Production-trainer tests: quality gates, short training run with
checkpointing, early-stop bookkeeping, figure artifacts."""

import json
import os

import numpy as np
import pytest


def test_quality_gates(tmp_path):
    from PIL import Image

    from coastline.train.trainer import quality_gate_pairs

    good_img = str(tmp_path / "good.png")
    Image.new("RGB", (100, 100)).save(good_img)
    small_img = str(tmp_path / "small.png")
    Image.new("RGB", (30, 30)).save(small_img)

    def write_label(name, label):
        p = str(tmp_path / name)
        with open(p, "w") as f:
            json.dump({"shapes": [{"label": label, "points": [[0, 0], [5, 0], [5, 5]]}]}, f)
        return p

    water = write_label("water.json", "water")
    grass = write_label("grass.json", "grass")
    broken = str(tmp_path / "broken.json")
    with open(broken, "w") as f:
        f.write("{not json")

    imgs, lbls = quality_gate_pairs(
        [good_img, small_img, good_img, good_img],
        [water, water, grass, broken],
        verbose=False,
    )
    assert imgs == [good_img] and lbls == [water]


@pytest.mark.slow
def test_trainer_short_run(tmp_path):
    from coastline.data.synthetic import synthetic_device_dataset
    from coastline.train.trainer import TrainerConfig, WaterSegmentationTrainer

    cfg = TrainerConfig(
        epochs=3,
        batch_size=2,
        lr=1e-3,
        image_size=32,
        save_dir=str(tmp_path / "models"),
        viz_every=2,
        augment=True,
    )
    trainer = WaterSegmentationTrainer(cfg)
    train_ds = synthetic_device_dataset(4, size=32, seed=0)
    val_ds = synthetic_device_dataset(2, size=32, seed=1)
    hist = trainer.train(train_ds, val_ds, verbose=False)

    assert len(hist["train_losses"]) == 3
    assert len(hist["iou_scores"]) == 3
    assert hist["training_time"] > 0
    assert os.path.exists(os.path.join(cfg.save_dir, "training_history.pkl"))
    assert os.path.exists(os.path.join(cfg.save_dir, "training_report.png"))
    progress = os.listdir(os.path.join(cfg.save_dir, "progress"))
    assert any(p.startswith("progress_epoch") for p in progress)
    assert any(p.startswith("confusion_epoch") for p in progress)

    payload = trainer.load_best(cfg.save_dir)
    assert payload is not None and "params" in payload and "batch_stats" in payload

    # restored weights drive the extractor
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(variables=payload, image_size=32)
    masks = ex.predict_masks_batch(np.asarray(val_ds.images[:2]))
    assert masks.shape == (2, 32, 32)
