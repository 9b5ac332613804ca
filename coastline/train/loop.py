"""Jitted train/eval loops and the unified benchmark harness.

Capability parity with `ModelEvaluator` (`/root/reference/Main_Final.py:
513-668` and clones), redesigned for TPU:

  * The reference re-decodes, re-rasterizes and re-normalizes every image on
    host every epoch, syncs to host per image for metrics, and dispatches
    op-by-op. Here the whole dataset lives in HBM as uint8; an epoch is ONE
    `lax.scan` over gather-indexed batches with normalization, augmentation,
    forward/backward, Adam update and metric reduction fused into a single
    XLA program. Host sees one scalar bundle per epoch.
  * Optimizer matches torch `Adam(lr, weight_decay=1e-4)` coupling exactly:
    L2 term added to the gradient *before* the moment updates
    (optax.add_decayed_weights -> scale_by_adam), then scaled by the
    dynamic plateau-controlled learning rate carried in the train state.
  * Per-partial-batch handling: torch DataLoader yields a short last batch;
    here batches are fixed-shape (XLA requirement) with a validity mask —
    losses are weighted and metrics gathered only for valid samples, so the
    numbers match the reference protocol exactly.
"""

import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from coastline.data.pipeline import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    DeviceDataset,
    HostDataset,
)
from coastline.train.lr import PlateauState, plateau_init, plateau_update
from coastline.train.metrics import per_image_metrics


@dataclass(frozen=True)
class TrainConfig:
    """Training protocol knobs, defaults = the comparison protocol
    (`Main_Final.py:549-553,834`)."""

    epochs: int = 20
    lr: float = 1e-4
    weight_decay: float = 1e-4
    batch_size: int = 2
    eval_batch_size: int = 2
    loss: str = "bce"  # bce (sigmoid models) | ce (2-class UNet) | hsv_bce
    hsv_weight: float = 0.1  # weight of the HSV-consistency term (hsv_bce)
    plateau_on: str = "train"  # train (Main_Final/Extended) | val (comne/production)
    plateau_patience: int = 5
    plateau_factor: float = 0.5
    threshold: float = 0.5
    augment: bool = False
    log_every: int = 5
    seed: int = 0
    nan_policy: str = "halt"  # halt | warn — failure detection (SURVEY §5.3)
    log_path: str = ""  # optional JSONL metrics stream


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    plateau: PlateauState
    rng: jnp.ndarray


def make_optimizer(weight_decay: float) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def normalize_images(u8_images):
    """uint8 RGB -> ImageNet-normalized float32 (torchvision parity,
    `Main_Final.py:697-701`)."""
    x = u8_images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def create_train_state(model, config: TrainConfig, sample_shape=(1, 512, 512, 3)) -> TrainState:
    rng = jax.random.PRNGKey(config.seed)
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": jax.random.PRNGKey(1)},
        jnp.zeros(sample_shape, jnp.float32),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config.weight_decay)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        plateau=plateau_init(config.lr),
        rng=state_rng,
    )


def _compute_loss(model, config: TrainConfig, logits, masks, valid, rgb01=None):
    """Masked mean loss over valid samples only."""
    w = valid.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    if config.loss == "ce":
        logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(
            logits.astype(jnp.float32), masks[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        per_img = (logz - picked).mean(axis=(1, 2))
    else:
        l = logits.astype(jnp.float32)
        t = masks.astype(jnp.float32)
        if l.ndim == 4 and t.ndim == 3:
            t = t[..., None]
        per = jnp.maximum(l, 0.0) - l * t + jnp.log1p(jnp.exp(-jnp.abs(l)))
        per_img = per.mean(axis=tuple(range(1, per.ndim)))
        if config.loss == "hsv_bce" and rgb01 is not None:
            from coastline.train.hsv import hsv_consistency

            probs = jax.nn.sigmoid(l[..., 0] if l.ndim == 4 else l)
            cons = hsv_consistency(probs, rgb01, axes=(1, 2))
            per_img = per_img + config.hsv_weight * cons
    return (per_img * w).sum() / denom


def _gather_batch(images, masks, idx, mesh, sharded: bool):
    """Pull one fixed-shape batch out of the resident dataset.

    Replicated (default): `jnp.take` with global indices — every chip holds
    the whole dataset. Sharded (`sharded=True`, SURVEY.md §2.8): the
    dataset arrays are sample-sharded over the mesh's data axes
    (`parallel.mesh.shard_device_dataset`) and `idx` holds shard-LOCAL
    indices (`sharded_epoch_indices`); the gather shard_maps so each chip
    reads only its own HBM shard — no dataset-sized collective in the
    compiled epoch (asserted in tests/test_parallel.py).
    """
    if sharded:
        from coastline.parallel.mesh import local_batch_gather

        return local_batch_gather(mesh, idx, images, masks)
    return jnp.take(images, idx, axis=0), jnp.take(masks, idx, axis=0)


def _constrain_batch(x, y, mesh):
    """Pin the gathered batch to the mesh's batch sharding; GSPMD then
    partitions the whole fwd/bwd and inserts the gradient all-reduce."""
    if mesh is None:
        return x, y
    from coastline.parallel.mesh import batch_sharding

    sh = batch_sharding(mesh)
    return jax.lax.with_sharding_constraint(x, sh), jax.lax.with_sharding_constraint(y, sh)


def make_train_epoch(model, config: TrainConfig, augment_fn: Optional[Callable] = None,
                     mesh=None, sharded_dataset: bool = False):
    """Build a jitted epoch: lax.scan over gather-indexed fixed-shape batches.

    `sharded_dataset=True` (requires `mesh`): dataset arrays are sample
    -sharded over the data axes and `idx` is shard-local — see
    `_gather_batch`. Each chip trains from its own dataset shard; HBM cost
    per chip is dataset/k instead of the full copy.
    """
    if sharded_dataset and mesh is None:
        raise ValueError("sharded_dataset=True requires a mesh")
    tx = make_optimizer(config.weight_decay)

    def step(carry, batch_idx_valid, images, masks):
        state = carry
        idx, valid = batch_idx_valid
        x_u8, y = _gather_batch(images, masks, idx, mesh, sharded_dataset)
        x_u8, y = _constrain_batch(x_u8, y, mesh)

        rng = jax.random.fold_in(state.rng, state.step)
        drop_rng, aug_rng = jax.random.split(rng)
        x01 = x_u8.astype(jnp.float32) / 255.0
        if augment_fn is not None:
            x01, y = augment_fn(aug_rng, x01, y)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = (x01 - mean) / std

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                return_logits=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            return (
                _compute_loss(model, config, out, y, valid, x01),
                updates["batch_stats"],
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        lr = state.plateau.lr
        params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
        state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return state, loss

    @partial(jax.jit, donate_argnums=0)
    def train_epoch(state: TrainState, images, masks, idx, valid):
        state, losses = jax.lax.scan(
            lambda c, b: step(c, b, images, masks), state, (idx, valid)
        )
        return state, losses.mean()

    return train_epoch


def make_eval_epoch(model, config: TrainConfig, mesh=None,
                    sharded_dataset: bool = False):
    """Jitted full-validation pass: loss + per-image metrics, all on device."""
    if sharded_dataset and mesh is None:
        raise ValueError("sharded_dataset=True requires a mesh")

    def step(_, batch, params, batch_stats, images, masks):
        idx, valid = batch
        x_u8, y = _gather_batch(images, masks, idx, mesh, sharded_dataset)
        x_u8, y = _constrain_batch(x_u8, y, mesh)
        x = normalize_images(x_u8)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=False,
            return_logits=True,
        )
        loss = _compute_loss(model, config, logits, y, valid,
                             x_u8.astype(jnp.float32) / 255.0)
        if config.loss == "ce":
            probs = jax.nn.softmax(logits, axis=-1)[..., 1]
        else:
            probs = jax.nn.sigmoid(logits[..., 0] if logits.ndim == 4 else logits)
        metrics = per_image_metrics(probs, y.astype(jnp.float32), config.threshold)
        return None, (loss, metrics, valid)

    @jax.jit
    def eval_epoch(params, batch_stats, images, masks, idx, valid):
        _, (losses, metrics, valids) = jax.lax.scan(
            lambda c, b: step(c, b, params, batch_stats, images, masks),
            None,
            (idx, valid),
        )
        flat_valid = valids.reshape(-1)
        flat = {k: v.reshape(-1) for k, v in metrics.items()}
        n = jnp.maximum(flat_valid.sum(), 1.0)
        agg = {}
        for k, v in flat.items():
            m = (v * flat_valid).sum() / n
            var = (((v - m) ** 2) * flat_valid).sum() / n
            agg[f"mean_{k}"] = m
            agg[f"std_{k}"] = jnp.sqrt(var)
        return losses.mean(), agg

    return eval_epoch


def batch_indices(n: int, batch_size: int, *, shuffle: bool, rng: np.random.Generator):
    """Fixed-shape (num_batches, B) index + validity arrays covering all n
    samples.

    The last batch is padded wrap-around with the FIRST samples of the order
    (distinct real images, masked invalid) rather than repeats of index 0:
    losses/metrics ignore padding via the validity mask, and the padding that
    unavoidably enters BatchNorm batch statistics in train mode is then real
    -image statistics. Residual deviation vs the reference's torch DataLoader
    (which trains on a SHORT last batch, so its BN sees fewer samples) is
    documented here; it vanishes when batch_size divides the dataset.
    """
    order = rng.permutation(n) if shuffle else np.arange(n)
    num_batches = (n + batch_size - 1) // batch_size
    total = num_batches * batch_size
    padded = order[np.arange(total) % n].astype(np.int32)
    valid = np.zeros(total, dtype=np.float32)
    valid[:n] = 1.0
    return (
        padded.reshape(num_batches, batch_size),
        valid.reshape(num_batches, batch_size),
    )


def epoch_indices(ds, batch_size: int, *, shuffle: bool, rng,
                  mesh=None, sharded: bool = False):
    """Epoch index plan: global wrap-padded batches (replicated data) or
    shard-local aligned batches (`sharded=True`, a sample-sharded
    DeviceDataset from `parallel.mesh.shard_device_dataset`)."""
    if not sharded:
        return batch_indices(len(ds), batch_size, shuffle=shuffle, rng=rng)
    if isinstance(ds, HostDataset):
        raise ValueError(
            "sharded data requires device-resident sharded datasets "
            "(parallel.mesh.shard_device_dataset); HostDataset chunked "
            "uploads already bound per-chip HBM — use one or the other")
    from coastline.parallel.mesh import sharded_epoch_indices

    return sharded_epoch_indices(mesh, ds, batch_size, shuffle=shuffle,
                                 rng=rng)


def _chunk_stream(ds: HostDataset, idx: np.ndarray, valid: np.ndarray):
    """Yield device chunks of a host-resident dataset, double-buffered.

    Each chunk covers `ds.superbatch` consecutive batches of the epoch's
    global shuffle: their samples are gathered host-side (numpy fancy
    indexing), uploaded with async `device_put`, and the batch indices are
    remapped to chunk-local positions — so the jitted epoch scan runs
    UNCHANGED on the chunk and every batch's contents/order are identical
    to the device-resident path. Because the consumer's compute dispatch is
    non-blocking, each next chunk's gather+upload overlaps the device's
    work on the current one.
    """
    def _put(a):
        if getattr(ds, "sharding", None) is not None:
            try:  # sharded upload: each chip receives only its shard
                return jax.device_put(a, ds.sharding)
            except Exception:  # e.g. ragged final chunk not divisible
                pass
        return jax.device_put(a)

    sb = ds.superbatch
    n_batches = idx.shape[0]
    for j0 in range(0, n_batches, sb):
        j1 = min(j0 + sb, n_batches)
        gidx = np.asarray(idx[j0:j1])
        flat = gidx.reshape(-1)
        imgs = _put(ds.images[flat])
        msks = _put(ds.masks[flat])
        lidx = np.arange(flat.size, dtype=np.int32).reshape(gidx.shape)
        yield (imgs, msks, jnp.asarray(lidx),
               jnp.asarray(valid[j0:j1]), j1 - j0)


def run_train_epoch_any(train_epoch_fn, state, ds, idx, valid):
    """One train epoch on either dataset residency.

    HostDataset runs the same compiled scan per uploaded chunk (state
    threads through, so parameter updates are bit-identical to the
    resident path); the reported loss is the batch-count-weighted mean
    over chunks == the resident path's mean over all batches. The ONE
    implementation of this combine — Evaluator and WaterSegmentationTrainer
    both call it."""
    if isinstance(ds, HostDataset):
        losses, counts = [], []
        for imgs, msks, lidx, v, cnt in _chunk_stream(ds, idx, valid):
            state, loss = train_epoch_fn(state, imgs, msks, lidx, v)
            losses.append(loss)
            counts.append(cnt)
        total = sum(counts)
        return state, sum(l * c for l, c in zip(losses, counts)) / total
    return train_epoch_fn(
        state, ds.images, ds.masks, jnp.asarray(idx), jnp.asarray(valid)
    )


class Evaluator:
    """Unified train/eval protocol — the reference `ModelEvaluator` rebuilt.

    API parity: `train_model(...) -> {'best_iou', 'history'}` with history
    keys train_loss/val_loss/val_iou/val_f1/val_accuracy, and
    `evaluate_model(...) -> {'mean_*','std_*','avg_inference_time',
    'total_samples'}` (`Main_Final.py:549-668`).
    """

    def __init__(self, model, config: TrainConfig, augment_fn=None, mesh=None,
                 sharded_data: bool = False):
        """`sharded_data=True` (requires `mesh`): datasets passed to
        train_model/evaluate_model must be sample-sharded DeviceDatasets
        (`parallel.mesh.shard_device_dataset`); epochs then read each
        chip's own shard with no dataset-sized collective (SURVEY §2.8)."""
        self.model = model
        self.config = config
        self.mesh = mesh
        self.sharded_data = sharded_data
        self._train_epoch = make_train_epoch(model, config, augment_fn, mesh,
                                             sharded_dataset=sharded_data)
        self._eval_epoch = make_eval_epoch(model, config, mesh,
                                           sharded_dataset=sharded_data)
        from coastline.utils.metrics_log import JsonlLogger

        self._log = JsonlLogger(config.log_path or None)

    def _epoch_indices(self, ds, batch_size: int, *, shuffle: bool, rng):
        return epoch_indices(ds, batch_size, shuffle=shuffle, rng=rng,
                             mesh=self.mesh, sharded=self.sharded_data)

    def _run_train_epoch(self, state, ds, idx, valid):
        return run_train_epoch_any(self._train_epoch, state, ds, idx, valid)

    def _run_eval_epoch(self, params, batch_stats, ds, idx, valid):
        """Validation pass on either residency. Chunked means/stds combine
        exactly via per-chunk sufficient statistics (n, mean, E[x^2])."""
        if not isinstance(ds, HostDataset):
            return self._eval_epoch(
                params, batch_stats, ds.images, ds.masks,
                jnp.asarray(idx), jnp.asarray(valid),
            )
        s1, s2 = {}, {}
        n_tot, loss_num, nb = 0.0, 0.0, 0
        for imgs, msks, lidx, v, cnt in _chunk_stream(ds, idx, valid):
            loss, agg = self._eval_epoch(params, batch_stats, imgs, msks, lidx, v)
            nv = float(np.asarray(v).sum())
            loss_num = loss_num + loss * cnt
            nb += cnt
            for k, m in agg.items():
                if not k.startswith("mean_"):
                    continue
                base = k[5:]
                sd = agg[f"std_{base}"]
                s1[base] = s1.get(base, 0.0) + m * nv
                s2[base] = s2.get(base, 0.0) + (sd * sd + m * m) * nv
            n_tot += nv
        n = max(n_tot, 1.0)
        agg = {}
        for base in s1:
            m = s1[base] / n
            var = jnp.maximum(s2[base] / n - m * m, 0.0)
            agg[f"mean_{base}"] = m
            agg[f"std_{base}"] = jnp.sqrt(var)
        return loss_num / nb, agg

    def train_model(self, train_ds: DeviceDataset, val_ds: DeviceDataset, verbose=True,
                    init_variables=None):
        """`init_variables={'params', 'batch_stats'}` (e.g. from
        utils.torch_import) replaces the random init — the optimizer state
        is value-independent at step 0 (Adam moments start at zero), so
        injecting params here exactly reproduces training-from-that-init."""
        cfg = self.config
        state = create_train_state(
            self.model, cfg, (1, *train_ds.images.shape[1:3], train_ds.images.shape[3])
        )
        if init_variables is not None:
            cast = lambda ref, new: jax.tree.map(
                lambda r, n: jnp.asarray(n, r.dtype), ref, new
            )
            state = state.replace(
                params=cast(state.params, init_variables["params"]),
                batch_stats=cast(
                    state.batch_stats,
                    init_variables.get("batch_stats", state.batch_stats),
                ),
            )
        if self.mesh is not None:
            # place the state for the mesh: replicated for dp/space/dcn,
            # channel-sharded params + Adam moments when a 'model'
            # (tensor-parallel) axis is present
            from coastline.parallel.mesh import state_sharding

            state = jax.device_put(state, state_sharding(self.mesh, state))
        host_rng = np.random.default_rng(cfg.seed)
        history = {k: [] for k in ("train_loss", "val_loss", "val_iou", "val_f1", "val_accuracy")}
        best_iou = 0.0

        vidx, vvalid = self._epoch_indices(
            val_ds, cfg.eval_batch_size, shuffle=False, rng=host_rng
        )

        for epoch in range(cfg.epochs):
            idx, valid = self._epoch_indices(
                train_ds, cfg.batch_size, shuffle=True, rng=host_rng
            )
            state, train_loss = self._run_train_epoch(state, train_ds, idx, valid)
            val_loss, agg = self._run_eval_epoch(
                state.params, state.batch_stats, val_ds, vidx, vvalid
            )
            train_loss = float(train_loss)
            val_loss = float(val_loss)
            val_iou = float(agg["mean_iou"])

            if not (math.isfinite(train_loss) and math.isfinite(val_loss)):
                msg = (f"non-finite loss at epoch {epoch} "
                       f"(train={train_loss}, val={val_loss})")
                self._log.log(event="nan", epoch=epoch, train_loss=train_loss)
                if cfg.nan_policy == "halt":
                    print(f"HALT: {msg} — stopping (nan_policy=halt); "
                          f"history up to here is returned")
                    break
                print(f"WARNING: {msg}")
            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["val_iou"].append(val_iou)
            history["val_f1"].append(float(agg["mean_f1_score"]))
            history["val_accuracy"].append(float(agg["mean_accuracy"]))

            metric = train_loss if cfg.plateau_on == "train" else val_loss
            state = state.replace(
                plateau=plateau_update(
                    state.plateau, metric, cfg.plateau_patience, cfg.plateau_factor
                )
            )
            best_iou = max(best_iou, val_iou)
            self._log.log(event="epoch", epoch=epoch, train_loss=train_loss,
                          val_loss=val_loss, val_iou=val_iou,
                          lr=float(state.plateau.lr))
            if verbose and epoch % cfg.log_every == 0:
                print(
                    f"Epoch {epoch:2d}: Train Loss: {train_loss:.4f}, "
                    f"Val Loss: {val_loss:.4f}, IoU: {val_iou:.4f}, "
                    f"F1: {history['val_f1'][-1]:.4f}"
                )

        self.state = state
        return {"best_iou": best_iou, "history": history}

    def evaluate_model(self, test_ds: DeviceDataset, state: Optional[TrainState] = None,
                       throughput_batch: int = 0):
        """Protocol metrics + timing. `avg_inference_time` is per-image at
        the PROTOCOL batch (eval_batch_size, default 2 — faithful to
        `Main_Final.py:644`, but ~2.5x off the chip's best rate).
        `throughput_batch > 0` additionally times at that batch and
        reports `throughput_images_per_sec` so result tables carry the
        chip's actual serving rate alongside the protocol number."""
        cfg = self.config
        state = state or self.state
        idx, valid = self._epoch_indices(
            test_ds, cfg.eval_batch_size, shuffle=False,
            rng=np.random.default_rng(0),
        )

        # Timed inference path (parity: Main_Final.py:644-651, but compile
        # excluded and timed with the dependency-chained on-device loop —
        # block_until_ready is not a reliable sync on every transport).
        from coastline.utils.profiling import device_loop_seconds

        x0 = normalize_images(test_ds.images[: cfg.eval_batch_size])

        def step(c, params, batch_stats, x):
            xi = x * (1.0 + c * 1e-20)
            y = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, xi, train=False
            )
            return c + y.mean().astype(jnp.float32)

        sec = device_loop_seconds(
            step, (state.params, state.batch_stats, x0), n_loop=20, trials=2
        )
        per_image_time = sec / x0.shape[0]

        throughput_ips = None
        if throughput_batch and throughput_batch > 0:
            if self.sharded_data and self.mesh is not None:
                # sample-sharded dataset: gather the timing batch shard-
                # locally (an unconstrained global jnp.take would make
                # GSPMD all-gather the dataset and leave xb's sharding
                # unspecified — the timed path must be the batch-sharded
                # serving path, ADVICE r4)
                from coastline.parallel.mesh import (
                    batch_sharding, data_axis_size, local_batch_gather,
                )

                k = data_axis_size(self.mesh)
                n_stored = int(test_ds.images.shape[0])
                shard = n_stored // k
                per = -(-throughput_batch // k)  # ceil: keep >= requested
                throughput_batch = per * k
                lidx = jnp.asarray(
                    np.tile(np.arange(per) % max(1, min(shard, len(test_ds))),
                            k).astype(np.int32))
                xb_u8 = local_batch_gather(self.mesh, lidx, test_ds.images)
                xb = jax.device_put(normalize_images(xb_u8),
                                    batch_sharding(self.mesh))
            else:
                bidx = jnp.arange(throughput_batch) % len(test_ds)
                xb = normalize_images(jnp.take(test_ds.images, bidx, axis=0))
            sec_b = device_loop_seconds(
                step, (state.params, state.batch_stats, xb), n_loop=10, trials=2
            )
            throughput_ips = throughput_batch / sec_b

        _, agg = self._run_eval_epoch(
            state.params, state.batch_stats, test_ds, idx, valid
        )
        results = {k: float(v) for k, v in agg.items()}
        results["avg_inference_time"] = per_image_time
        # avg_inference_time is per-image AT THIS batch size — record it so
        # artifacts/figures quoting the number are unambiguous (the
        # reference also timed at its own loader batch, Main_Final.py:644).
        results["inference_batch_size"] = int(x0.shape[0])
        if throughput_ips is not None:
            results["throughput_images_per_sec"] = float(throughput_ips)
            results["throughput_batch_size"] = int(throughput_batch)
        results["total_samples"] = int(len(test_ds))
        return results
