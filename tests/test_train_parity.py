"""Step-level training parity vs the reference torch stack.

Forward parity (tests/test_torch_import.py) pins the models; the protocol
parity artifact pins end-to-end convergence. This file pins the TRAINING
MACHINERY at the single-update level: starting from torch's exact initial
weights, two optimization steps on identical batches must move every
parameter and BatchNorm running statistic to the same place as
`torch.optim.Adam` + `CrossEntropyLoss` (`train_water_segmentation.py`
protocol) — certifying gradient numerics, the coupled-L2 Adam wiring
(`train/loop.py:make_optimizer`), bias correction, and the BN
momentum-0.1/unbiased-var update rule in one assertion.

Uses the plain UNet (the one dropout-free architecture, so no RNG stream
has to agree across frameworks) at an exaggerated weight_decay=0.1: a
decoupled-AdamW mis-wiring or a wrong BN update would diverge at ~1e-4
per step, two orders above the tolerance.
"""

import numpy as np
import pytest

from tests.test_torch_import import _load_reference_module, _load_reference_unet_class


def test_unet_two_step_adam_parity():
    import jax
    import jax.numpy as jnp
    import torch

    from coastline.models.unet import UNet
    from coastline.train.loop import TrainConfig, create_train_state, make_train_epoch
    from coastline.utils.torch_import import import_reference_unet

    UNetTorch = _load_reference_unet_class()
    torch.manual_seed(0)
    tm = UNetTorch(n_channels=3, n_classes=2).train()

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    masks = (rng.random((4, 32, 32)) > 0.5).astype(np.int32)
    lr, wd = 1e-4, 0.1

    # --- torch side: two Adam steps under the reference protocol wiring ---
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xt = (images.astype(np.float32) / 255.0 - mean) / std
    xt = torch.from_numpy(xt.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(masks.astype(np.int64))
    opt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd)
    crit = torch.nn.CrossEntropyLoss()
    torch_losses = []
    for step in range(2):
        sl = slice(2 * step, 2 * step + 2)
        opt.zero_grad()
        loss = crit(tm(xt[sl]), yt[sl])
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))
    expected = import_reference_unet(tm.state_dict())

    # --- coastline side: same init, same batches, the production epoch ---
    torch.manual_seed(0)
    init = import_reference_unet(UNetTorch(3, 2).state_dict())
    model = UNet(n_classes=2)
    config = TrainConfig(lr=lr, weight_decay=wd, loss="ce", batch_size=2)
    state = create_train_state(model, config, sample_shape=(1, 32, 32, 3))
    state = state.replace(
        params=jax.tree.map(jnp.asarray, init["params"]),
        batch_stats=jax.tree.map(jnp.asarray, init["batch_stats"]),
    )
    epoch = make_train_epoch(model, config)
    idx = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    valid = jnp.ones((2, 2), bool)
    state, mean_loss = epoch(state, jnp.asarray(images), jnp.asarray(masks), idx, valid)

    # losses agree (CE mean over equal-sized images == torch's global mean)
    np.testing.assert_allclose(
        float(mean_loss), np.mean(torch_losses), atol=1e-5, rtol=1e-5
    )

    # every parameter lands where torch's Adam put it
    flat_mine = jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))[0]
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(expected["params"])[0]
    )
    assert len(flat_mine) == len(flat_ref)
    for path, mine in flat_mine:
        np.testing.assert_allclose(
            np.asarray(mine), flat_ref[jax.tree_util.keystr(path)],
            atol=3e-5, rtol=1e-4, err_msg=jax.tree_util.keystr(path),
        )

    # BN running statistics follow torch's momentum-0.1 / unbiased-var rule.
    # This gate caught the missing N/(N-1) correction in _FastBatchNorm's
    # running-var update (drift exactly (1-m)*var/(N-1) per layer); the
    # remaining tolerance covers torch-vs-XLA f32 variance formulation noise.
    flat_stats = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state.batch_stats))[0]
    ref_stats = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(expected["batch_stats"])[0]
    )
    assert len(flat_stats) == len(ref_stats)
    for path, mine in flat_stats:
        np.testing.assert_allclose(
            np.asarray(mine), ref_stats[jax.tree_util.keystr(path)],
            atol=2e-5, rtol=2e-4, err_msg=jax.tree_util.keystr(path),
        )


def _assert_tree_close(mine_tree, ref_tree, atol, rtol):
    import jax

    flat_mine = jax.tree_util.tree_flatten_with_path(jax.device_get(mine_tree))[0]
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    )
    assert len(flat_mine) == len(flat_ref)
    for path, mine in flat_mine:
        np.testing.assert_allclose(
            np.asarray(mine), flat_ref[jax.tree_util.keystr(path)],
            atol=atol, rtol=rtol, err_msg=jax.tree_util.keystr(path),
        )


def test_deeplab_two_step_adam_parity_bce():
    """Same two-step certification for the BCE family: the reference trains
    its sigmoid-output models with `BCELoss(model(x), target)`
    (`Main_Final.py:552-584`); coastline trains on logits with the fused
    sigmoid-BCE (`train/loop.py:_compute_loss`). Mathematically identical
    gradients -- asserted here through torch's Adam on DeepLabV3Plus, the
    dropout-free sigmoid-head architecture."""
    import jax
    import jax.numpy as jnp
    import torch

    from coastline.models.deeplabv3p import DeepLabV3Plus
    from coastline.train.loop import TrainConfig, create_train_state, make_train_epoch
    from coastline.utils.torch_import import import_reference_deeplabv3plus

    mf = _load_reference_module("Main_Final")
    torch.manual_seed(0)
    tm = mf.DeepLabV3Plus(n_classes=1).train()

    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    masks = (rng.random((4, 32, 32)) > 0.5).astype(np.int32)
    lr, wd = 1e-4, 0.1

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xt = (images.astype(np.float32) / 255.0 - mean) / std
    xt = torch.from_numpy(xt.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(masks.astype(np.float32))[:, None]
    opt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd)
    crit = torch.nn.BCELoss()
    torch_losses = []
    for step in range(2):
        sl = slice(2 * step, 2 * step + 2)
        opt.zero_grad()
        loss = crit(tm(xt[sl]), yt[sl])
        loss.backward()
        opt.step()
        torch_losses.append(loss.item())
    expected = import_reference_deeplabv3plus(tm.state_dict())

    torch.manual_seed(0)
    init = import_reference_deeplabv3plus(mf.DeepLabV3Plus(n_classes=1).state_dict())
    model = DeepLabV3Plus(n_classes=1)
    config = TrainConfig(lr=lr, weight_decay=wd, loss="bce", batch_size=2)
    state = create_train_state(model, config, sample_shape=(1, 32, 32, 3))
    state = state.replace(
        params=jax.tree.map(jnp.asarray, init["params"]),
        batch_stats=jax.tree.map(jnp.asarray, init["batch_stats"]),
    )
    epoch = make_train_epoch(model, config)
    idx = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    valid = jnp.ones((2, 2), bool)
    state, mean_loss = epoch(state, jnp.asarray(images), jnp.asarray(masks), idx, valid)

    np.testing.assert_allclose(
        float(mean_loss), np.mean(torch_losses), atol=2e-5, rtol=1e-5
    )
    # atol 5e-5: for a near-zero gradient Adam's g/(|g|+eps) normalization
    # amplifies f32 conv-grad noise up to the full lr-scale step; the 2-step
    # update bound is 2e-4, so real wiring bugs still miss by 4x+.
    _assert_tree_close(state.params, expected["params"], atol=5e-5, rtol=1e-4)
    _assert_tree_close(
        state.batch_stats, expected["batch_stats"], atol=2e-5, rtol=2e-4
    )
