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


def test_validate_masks_padded_samples():
    """A padded last validation batch must not bias metrics: validate() on
    n=3 with batch_size=2 (one padding slot) must equal the same metrics
    computed over torch-DataLoader-style natural batches [2, 1]
    (reference semantics: train_water_segmentation.py:360-399)."""
    import jax
    import jax.numpy as jnp

    from coastline.data.synthetic import synthetic_device_dataset
    from coastline.train.loop import TrainConfig, batch_indices, create_train_state, normalize_images
    from coastline.train.trainer import TrainerConfig, WaterSegmentationTrainer

    cfg = TrainerConfig(image_size=32, batch_size=2)
    trainer = WaterSegmentationTrainer(cfg)
    ds = synthetic_device_dataset(3, size=32, seed=7)
    state = create_train_state(trainer.model, TrainConfig(loss="ce"), (1, 32, 32, 3))
    validate = trainer._make_validate()

    idx, valid = batch_indices(3, 2, shuffle=False, rng=np.random.default_rng(0))
    loss, acc, iou, _ = validate(
        state.params, state.batch_stats, ds.images, ds.masks,
        jnp.asarray(idx), jnp.asarray(valid),
    )

    # Natural short batches, batch-level metrics averaged over batches.
    ref_loss, ref_acc, ref_iou, nb = 0.0, 0.0, 0.0, 0
    for sl in (slice(0, 2), slice(2, 3)):
        x = normalize_images(ds.images[sl])
        y = jnp.asarray(ds.masks[sl], jnp.int32)
        logits = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
        )
        logz = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
        ref_loss += float((logz - picked).mean())
        pred = jnp.argmax(logits, axis=-1)
        ref_acc += float((pred == y).mean())
        inter = float(jnp.sum((pred == 1) & (y == 1)))
        union = float(jnp.sum((pred == 1) | (y == 1)))
        ref_iou += 1.0 if union == 0 else inter / union
        nb += 1

    assert abs(float(loss) - ref_loss / nb) < 1e-5
    assert abs(float(acc) - ref_acc / nb) < 1e-5
    assert abs(float(iou) - ref_iou / nb) < 1e-5


@pytest.mark.slow
def test_trainer_resume_bit_exact(tmp_path):
    """Crash-safe resume: train 2 epochs + resume for 2 more == one
    straight 4-epoch run, bit-exactly — params, histories, best-IoU
    bookkeeping and the epoch shuffles all continue from the resume point
    (full state via Orbax; host loop state incl. the numpy shuffle-rng in
    the sidecar meta). Capability the reference lacks (SURVEY §5.4)."""
    import jax

    from coastline.data.synthetic import synthetic_device_dataset
    from coastline.train.trainer import TrainerConfig, WaterSegmentationTrainer

    train_ds = synthetic_device_dataset(4, size=32, seed=0)
    val_ds = synthetic_device_dataset(2, size=32, seed=1)

    def make_cfg(save_dir, epochs):
        return TrainerConfig(
            epochs=epochs, batch_size=2, lr=1e-3, image_size=32,
            save_dir=str(save_dir), viz_every=0, augment=True,
            checkpoint_every=2,
        )

    # straight 4-epoch run
    t_a = WaterSegmentationTrainer(make_cfg(tmp_path / "a", 4))
    hist_a = t_a.train(train_ds, val_ds, verbose=False)

    # interrupted run: 2 epochs (resume point written at epoch 2), then a
    # NEW trainer resumes in the same dir with the full 4-epoch budget
    t_b1 = WaterSegmentationTrainer(make_cfg(tmp_path / "b", 2))
    t_b1.train(train_ds, val_ds, verbose=False)
    t_b2 = WaterSegmentationTrainer(make_cfg(tmp_path / "b", 4))
    hist_b = t_b2.train(train_ds, val_ds, verbose=False, resume=True)

    assert len(hist_b["train_losses"]) == 4
    np.testing.assert_array_equal(hist_a["train_losses"], hist_b["train_losses"])
    np.testing.assert_array_equal(hist_a["val_losses"], hist_b["val_losses"])
    np.testing.assert_array_equal(hist_a["iou_scores"], hist_b["iou_scores"])
    assert hist_a["best_model_epoch"] == hist_b["best_model_epoch"]

    pa = jax.tree.leaves(t_a.state.params)
    pb = jax.tree.leaves(t_b2.state.params)
    for la, lb in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # resuming a FINISHED run is a no-op returning the saved history
    t_b3 = WaterSegmentationTrainer(make_cfg(tmp_path / "b", 4))
    hist_c = t_b3.train(train_ds, val_ds, verbose=False, resume=True)
    np.testing.assert_array_equal(hist_b["train_losses"], hist_c["train_losses"])

    # resume with no checkpoint at all falls back to a fresh start
    t_fresh = WaterSegmentationTrainer(make_cfg(tmp_path / "fresh", 2))
    hist_f = t_fresh.train(train_ds, val_ds, verbose=False, resume=True)
    assert len(hist_f["train_losses"]) == 2
