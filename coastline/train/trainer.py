"""Production training loop — the reference's `WaterSegmentationTrainer`
(`/root/reference/train_water_segmentation.py:290-830`) rebuilt TPU-native.

Capability parity: 2-class U-Net + CrossEntropy, Adam 1e-4, plateau LR on
val loss (patience 10, x0.5), quality-gated dataset prep with the seeded
80/20 split, per-epoch validation (pixel accuracy + batch-level IoU with
the union==0 -> 1.0 rule), best-IoU checkpointing, early stop after 20
stale epochs, history artifact, periodic progress/confusion figures.

TPU redesign: the epoch is a single compiled scan (see train.loop); device
-side augmentation (train.checkpoint / data.augment) applies geometric
transforms to image AND mask (the reference rotates only the image —
documented deviation, `image_only_geometric=True` restores it); checkpoints
are full-state Orbax (resume capability the reference lacks).
"""

import os
import pickle
import time
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from coastline.data.augment import make_augment_fn
from coastline.data.pipeline import (
    DeviceDataset,
    HostDataset,
    build_dataset,
    pair_files,
    seeded_split,
)
from coastline.models.unet import UNet
from coastline.train.checkpoint import CheckpointManager
from coastline.train.loop import (
    TrainConfig,
    _chunk_stream,
    _gather_batch,
    create_train_state,
    epoch_indices,
    make_train_epoch,
    normalize_images,
    run_train_epoch_any,
)
from coastline.train.lr import plateau_update


@dataclass
class TrainerConfig:
    epochs: int = 200
    batch_size: int = 8
    lr: float = 1e-4
    plateau_patience: int = 10
    early_stop_patience: int = 20
    image_size: int = 512
    save_dir: str = "./models"
    viz_every: int = 5
    augment: bool = True
    image_only_geometric: bool = False  # True = strict reference parity
    min_image_px: int = 50
    seed: int = 0
    dtype: str = "float32"
    # Crash-safe resume cadence: every N epochs the FULL train state
    # (params, BN stats, Adam moments, plateau, rng) plus host-side loop
    # state (epoch, best IoU, stale count, history, shuffle-rng state) is
    # checkpointed, so `train(resume=True)` continues bit-exactly from the
    # last save. 0 disables periodic saves (end-of-run save still happens).
    checkpoint_every: int = 5


def quality_gate_pairs(image_paths, label_paths, min_px: int = 50, verbose=True):
    """The reference's dataset quality gates
    (`train_water_segmentation.py:774-807`): drop images smaller than
    `min_px`, pairs without a water polygon, and unreadable files."""
    import json

    from coastline.data.rasterize import WATER_LABELS

    kept_i, kept_l = [], []
    for ip, lp in zip(image_paths, label_paths):
        try:
            with Image.open(ip) as im:
                if min(im.size) < min_px:
                    continue
            with open(lp, "r", encoding="utf-8") as f:
                shapes = json.load(f).get("shapes", [])
            if not any(
                str(s.get("label", "")).lower() in WATER_LABELS for s in shapes
            ):
                continue
            kept_i.append(ip)
            kept_l.append(lp)
        except Exception:
            continue
    if verbose:
        print(f"quality gate: kept {len(kept_i)}/{len(image_paths)} pairs")
    return kept_i, kept_l


class WaterSegmentationTrainer:
    def __init__(self, config: TrainerConfig = TrainerConfig(), mesh=None,
                 sharded_data: bool = False):
        """`sharded_data=True` (requires `mesh`): train/val datasets must be
        sample-sharded (`parallel.mesh.shard_device_dataset`); each chip
        then holds and reads only its 1/k of the dataset (SURVEY §2.8)."""
        if sharded_data and mesh is None:
            raise ValueError("sharded_data=True requires a mesh")
        self.config = config
        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        self.model = UNet(n_classes=2, dtype=dtype)
        self.mesh = mesh
        self.sharded_data = sharded_data
        self.history = {
            "train_losses": [],
            "val_losses": [],
            "learning_rates": [],
            "accuracies": [],
            "iou_scores": [],
            "best_model_epoch": 0,
            "training_time": 0.0,
        }

    # ---------------------------------------------------------------- data
    def prepare_dataset(self, images_dir, labels_dir) -> Tuple[DeviceDataset, DeviceDataset]:
        imgs, lbls = pair_files(
            images_dir, labels_dir,
            extensions=(".png", ".jpg", ".jpeg", ".tif", ".tiff"),
        )
        imgs, lbls = quality_gate_pairs(imgs, lbls, self.config.min_image_px)
        pairs = list(zip(imgs, lbls))
        train_pairs, val_pairs = seeded_split(pairs, test_size=0.2, seed=42)
        size = (self.config.image_size, self.config.image_size)
        train = build_dataset([p[0] for p in train_pairs], [p[1] for p in train_pairs], size)
        val = build_dataset([p[0] for p in val_pairs], [p[1] for p in val_pairs], size)
        return train, val

    # ------------------------------------------------------------ validate
    def _make_validate(self):
        model = self.model
        mesh, sharded = self.mesh, self.sharded_data

        @jax.jit
        def validate(params, batch_stats, images, masks, idx, valid):
            def step(_, batch):
                bidx, bvalid = batch
                x_u8, y = _gather_batch(images, masks, bidx, mesh, sharded)
                x = normalize_images(x_u8)
                y = y.astype(jnp.int32)
                logits = model.apply(
                    {"params": params, "batch_stats": batch_stats}, x, train=False
                )
                # The reference's torch DataLoader yields a SHORT last batch;
                # here batches are fixed-shape with index-0 padding, so every
                # reduction is masked per-sample by bvalid — otherwise the
                # duplicated padding samples bias loss/acc/IoU and with them
                # plateau stepping and best-IoU selection.
                w = bvalid.astype(jnp.float32)
                n_valid = jnp.maximum(w.sum(), 1.0)
                logz = jax.nn.logsumexp(logits, axis=-1)
                picked = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
                loss = ((logz - picked).mean(axis=(1, 2)) * w).sum() / n_valid
                pred = jnp.argmax(logits, axis=-1)
                acc = ((pred == y).mean(axis=(1, 2)) * w).sum() / n_valid
                # batch-level IoU over valid samples, union==0 -> 1.0
                # (train_water_segmentation.py:341-358,388)
                inter = (jnp.sum((pred == 1) & (y == 1), axis=(1, 2)) * w).sum()
                union = (jnp.sum((pred == 1) | (y == 1), axis=(1, 2)) * w).sum()
                iou = jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1))
                return None, (loss, acc, iou, bvalid.max())

            _, (losses, accs, ious, has_valid) = jax.lax.scan(step, None, (idx, valid))
            n = jnp.maximum(has_valid.sum(), 1.0)
            return (
                (losses * has_valid).sum() / n,
                (accs * has_valid).sum() / n,
                (ious * has_valid).sum() / n,
                has_valid.sum(),  # batch count for exact chunked combining
            )

        return validate

    # ----------------------------------------------------------- resume IO
    @staticmethod
    def _resume_meta_path(save_dir: str) -> str:
        return os.path.join(save_dir, "resume_meta.pkl")

    def _save_resume_point(self, ckpt, epoch, state, val_iou, best_iou,
                           stale, host_rng, elapsed_s):
        """Durable mid-run snapshot: Orbax full state + host loop state.

        The Orbax save is awaited before the sidecar meta is written, so
        the meta never points at a checkpoint that did not finish — a
        crash between the two leaves the PREVIOUS resume point intact."""
        step = epoch + 1
        ckpt.save(step, state, metrics={"val_iou": float(val_iou)},
                  force=True)
        ckpt.wait()
        meta = {
            "epoch": epoch,
            "ckpt_step": step,
            "best_iou": float(best_iou),
            "stale": int(stale),
            "history": {k: (list(v) if isinstance(v, list) else v)
                        for k, v in self.history.items()},
            "host_rng_state": host_rng.bit_generator.state,
            "elapsed_s": float(elapsed_s),
        }
        tmp = self._resume_meta_path(self.config.save_dir) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(meta, f)
        os.replace(tmp, self._resume_meta_path(self.config.save_dir))

    def _load_resume_point(self, ckpt, state_template):
        """Restore (state, meta) from the last resume point, or None."""
        path = self._resume_meta_path(self.config.save_dir)
        if not os.path.exists(path):
            return None
        try:
            with open(path, "rb") as f:
                meta = pickle.load(f)
            state = ckpt.restore(state_template, step=meta["ckpt_step"])
        except Exception as e:
            print(f"resume point unreadable ({e}); starting fresh")
            return None
        if state is None:
            return None
        return state, meta

    # --------------------------------------------------------------- train
    def train(self, train_ds: DeviceDataset, val_ds: DeviceDataset,
              verbose=True, resume: bool = False):
        cfg = self.config
        loop_cfg = TrainConfig(
            epochs=cfg.epochs,
            lr=cfg.lr,
            weight_decay=0.0,  # reference production Adam has no weight decay
            batch_size=cfg.batch_size,
            eval_batch_size=cfg.batch_size,
            loss="ce",
            plateau_on="val",
            plateau_patience=cfg.plateau_patience,
            seed=cfg.seed,
        )
        augment_fn = (
            make_augment_fn(image_only_geometric=cfg.image_only_geometric)
            if cfg.augment
            else None
        )
        train_epoch = make_train_epoch(self.model, loop_cfg, augment_fn,
                                       self.mesh,
                                       sharded_dataset=self.sharded_data)
        validate = self._make_validate()

        h, w = train_ds.images.shape[1:3]
        state = create_train_state(self.model, loop_cfg, (1, h, w, 3))
        if self.mesh is not None:
            from coastline.parallel.mesh import state_sharding

            state = jax.device_put(state, state_sharding(self.mesh, state))
        ckpt = CheckpointManager(cfg.save_dir)
        host_rng = np.random.default_rng(cfg.seed)

        vidx, vvalid = epoch_indices(
            val_ds, cfg.batch_size, shuffle=False, rng=host_rng,
            mesh=self.mesh, sharded=self.sharded_data,
        )

        def run_train_epoch(state, idx, valid):
            """Device- or host-resident train epoch (chunked uploads for
            HostDataset — one combine implementation, loop.run_train_epoch_any)."""
            return run_train_epoch_any(train_epoch, state, train_ds, idx, valid)

        def run_validate(state):
            if isinstance(val_ds, HostDataset):
                tot, n_tot = np.zeros(3), 0.0
                for imgs, msks, lidx, v, cnt in _chunk_stream(val_ds, vidx, vvalid):
                    l, a, i, n = validate(state.params, state.batch_stats,
                                          imgs, msks, lidx, v)
                    n = float(n)
                    tot += np.array([float(l), float(a), float(i)]) * n
                    n_tot += n
                return tuple((tot / max(n_tot, 1.0)).tolist())
            l, a, i, _ = validate(state.params, state.batch_stats,
                                  val_ds.images, val_ds.masks,
                                  jnp.asarray(vidx), jnp.asarray(vvalid))
            return l, a, i

        best_iou, stale, t_start = -1.0, 0, time.time()
        start_epoch, elapsed_prior = 0, 0.0
        if resume:
            restored = self._load_resume_point(ckpt, state)
            if restored is None:
                if verbose:
                    print("no resume point found — starting fresh")
            else:
                state, meta = restored
                start_epoch = meta["epoch"] + 1
                best_iou, stale = meta["best_iou"], meta["stale"]
                elapsed_prior = meta.get("elapsed_s", 0.0)
                self.history = meta["history"]
                host_rng.bit_generator.state = meta["host_rng_state"]
                ckpt.best_iou = best_iou  # keep the best export monotone
                if verbose:
                    print(f"resumed at epoch {start_epoch + 1}/{cfg.epochs} "
                          f"(best IoU {best_iou:.4f})")
        last_epoch, last_saved = None, start_epoch  # nothing saved this run
        for epoch in range(start_epoch, cfg.epochs):
            idx, valid = epoch_indices(
                train_ds, cfg.batch_size, shuffle=True, rng=host_rng,
                mesh=self.mesh, sharded=self.sharded_data,
            )
            state, train_loss = run_train_epoch(state, idx, valid)
            val_loss, val_acc, val_iou = run_validate(state)
            train_loss, val_loss = float(train_loss), float(val_loss)
            val_acc, val_iou = float(val_acc), float(val_iou)

            self.history["train_losses"].append(train_loss)
            self.history["val_losses"].append(val_loss)
            self.history["learning_rates"].append(float(state.plateau.lr))
            self.history["accuracies"].append(val_acc)
            self.history["iou_scores"].append(val_iou)

            state = state.replace(
                plateau=plateau_update(
                    state.plateau, val_loss, cfg.plateau_patience, 0.5
                )
            )

            if val_iou > best_iou:
                best_iou = val_iou
                stale = 0
                self.history["best_model_epoch"] = epoch
                ckpt.maybe_save_best(epoch, state, val_iou)
            else:
                stale += 1

            if verbose:
                print(
                    f"Epoch {epoch + 1}/{cfg.epochs}: train {train_loss:.4f} "
                    f"val {val_loss:.4f} acc {val_acc:.4f} IoU {val_iou:.4f} "
                    f"lr {float(state.plateau.lr):.2e}"
                )
            if cfg.viz_every and (epoch + 1) % cfg.viz_every == 0:
                self._save_progress_figures(epoch, val_ds, state)
            last_epoch = epoch
            if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
                self._save_resume_point(
                    ckpt, epoch, state, val_iou, best_iou, stale, host_rng,
                    elapsed_prior + (time.time() - t_start))
                last_saved = epoch + 1
            if stale >= cfg.early_stop_patience:
                if verbose:
                    print(f"early stop at epoch {epoch + 1} (patience {cfg.early_stop_patience})")
                break

        self.history["training_time"] = elapsed_prior + (time.time() - t_start)
        os.makedirs(cfg.save_dir, exist_ok=True)
        with open(os.path.join(cfg.save_dir, "training_history.pkl"), "wb") as f:
            pickle.dump(self.history, f)
        try:
            from coastline.report.trainer_viz import save_final_report

            save_final_report(self.history, cfg.save_dir)
        except Exception as e:
            print("final report figure failed:", e)
        self.state = state
        # Final resume point (also the end-of-run full-state artifact the
        # round-2 code saved under state.step): epoch-keyed so resuming a
        # finished run — or extending it with a larger cfg.epochs — picks
        # up exactly where this one stopped.
        if last_epoch is not None and last_epoch + 1 != last_saved:
            self._save_resume_point(
                ckpt, last_epoch, state, val_iou, best_iou, stale, host_rng,
                self.history["training_time"])
        ckpt.close()
        return self.history

    def _save_progress_figures(self, epoch, val_ds, state):
        try:
            from coastline.report.trainer_viz import (
                save_confusion_matrix,
                save_progress_figure,
            )

            out_dir = os.path.join(self.config.save_dir, "progress")
            save_progress_figure(self.history, epoch, out_dir)
            x = normalize_images(val_ds.images[:4])
            logits = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False,
            )
            pred = np.asarray(jnp.argmax(logits, axis=-1))
            save_confusion_matrix(
                np.asarray(val_ds.masks[:4]), pred, epoch, out_dir
            )
        except Exception as e:
            print("progress figure failed:", e)

    # ----------------------------------------------------------- restoring
    def load_best(self, save_dir: Optional[str] = None):
        cfg_dir = save_dir or self.config.save_dir
        ckpt = CheckpointManager(cfg_dir)
        loop_cfg = TrainConfig(loss="ce")
        template_state = create_train_state(
            self.model, loop_cfg, (1, self.config.image_size, self.config.image_size, 3)
        )
        payload = ckpt.restore_best(
            {"params": template_state.params, "batch_stats": template_state.batch_stats}
        )
        ckpt.close()
        return payload
