"""Checkpoint/resume tests — the capability the reference lacks entirely
(save-only torch.save, SURVEY.md §5.4). Full-state resume must be
bit-exact: training N epochs straight == training k, restoring, training
N-k more."""

import numpy as np
import jax
import jax.numpy as jnp


def _setup():
    from coastline.data.synthetic import synthetic_device_dataset
    from coastline.models.fastscnn import FastSCNN
    from coastline.train.loop import TrainConfig, batch_indices, create_train_state, make_train_epoch

    model = FastSCNN()
    cfg = TrainConfig(epochs=4, batch_size=4, lr=1e-3)
    ds = synthetic_device_dataset(4, size=32, seed=0)
    epoch_fn = make_train_epoch(model, cfg)
    idx, valid = batch_indices(4, 4, shuffle=False, rng=np.random.default_rng(0))
    return model, cfg, ds, epoch_fn, jnp.asarray(idx), jnp.asarray(valid)


def test_full_state_resume_is_bit_exact(tmp_path):
    from coastline.train.checkpoint import CheckpointManager
    from coastline.train.loop import create_train_state

    model, cfg, ds, epoch_fn, idx, valid = _setup()

    # straight-through: 4 epochs
    state = create_train_state(model, cfg, (1, 32, 32, 3))
    losses_straight = []
    for _ in range(4):
        state, loss = epoch_fn(state, ds.images, ds.masks, idx, valid)
        losses_straight.append(float(loss))

    # 2 epochs -> save -> restore -> 2 more
    state = create_train_state(model, cfg, (1, 32, 32, 3))
    for _ in range(2):
        state, loss = epoch_fn(state, ds.images, ds.masks, idx, valid)
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(2, state)
    ckpt.close()

    ckpt2 = CheckpointManager(str(tmp_path / "ck"))
    template = create_train_state(model, cfg, (1, 32, 32, 3))
    assert ckpt2.latest_step() == 2
    restored = ckpt2.restore(template)
    ckpt2.close()

    losses_resumed = []
    for _ in range(2):
        restored, loss = epoch_fn(restored, ds.images, ds.masks, idx, valid)
        losses_resumed.append(float(loss))

    np.testing.assert_allclose(losses_resumed, losses_straight[2:], rtol=1e-6)


def test_best_checkpoint_policy(tmp_path):
    from coastline.train.checkpoint import CheckpointManager
    from coastline.train.loop import create_train_state

    model, cfg, ds, epoch_fn, idx, valid = _setup()
    state = create_train_state(model, cfg, (1, 32, 32, 3))
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    assert ckpt.maybe_save_best(0, state, 0.5)
    assert not ckpt.maybe_save_best(1, state, 0.4)  # worse -> not saved
    assert ckpt.maybe_save_best(2, state, 0.6)
    payload = ckpt.restore_best(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    ckpt.close()
    assert payload is not None
    chex_equal = jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.all(a == b)), payload["params"], state.params)
    )
    assert chex_equal
