"""Model zoo parity tests.

Parameter counts are pinned to the reference implementations, measured once
by instantiating each torch model from `/root/reference` (stored in
`baselines/reference_param_counts.json`; see SURVEY.md §2.3). Any drift in
an architecture definition shows up here immediately.
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import pytest

from coastline.models.registry import available_models, create_model

REPO = pathlib.Path(__file__).resolve().parents[1]
REF_COUNTS = json.loads((REPO / "baselines" / "reference_param_counts.json").read_text())

DISPLAY_TO_REF = {
    "Robust UNet": "RobustUNet",
    "DeepLabV3+": "DeepLabV3Plus",
    "YOLO-SEG": "YOLOSeg",
    "SegNet": "SegNet",
    "PSPNet": "PSPNet",
    "Fast-SCNN": "FastSCNN",
    "ENet": "ENet",
    "WaterNet": "WaterNet",
    "MSWNet": "MSWNet",
    "HRNet-Water": "HRNetWater",
    "SegFormer-Lite": "SegFormerLite",
    "UNet": "UNet",
}


def param_count(model, x):
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    return sum(int(jnp.prod(jnp.asarray(p.shape))) for p in jax.tree.leaves(shapes["params"]))


def test_registry_is_complete():
    assert set(available_models()) == set(DISPLAY_TO_REF)


@pytest.mark.parametrize("name", sorted(DISPLAY_TO_REF))
def test_param_count_parity(name):
    x = jnp.zeros((1, 64, 64, 3))
    assert param_count(create_model(name), x) == REF_COUNTS[DISPLAY_TO_REF[name]]


@pytest.mark.parametrize("name", sorted(DISPLAY_TO_REF))
def test_output_shapes(name):
    """Every model maps (N,H,W,3) -> (N,H,W,classes) at any /32-divisible size."""
    x = jnp.zeros((2, 64, 64, 3))
    model = create_model(name)
    out = jax.eval_shape(
        lambda: model.init_with_output(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
        )[0]
    )
    classes = 2 if name == "UNet" else 1
    assert out.shape == (2, 64, 64, classes)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("name", ["Fast-SCNN", "ENet"])
def test_small_models_forward_probabilities(name):
    """Actually execute the two lightest models end-to-end: outputs finite,
    in (0,1) after sigmoid."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    model = create_model(name)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert jnp.all(jnp.isfinite(out))
    assert jnp.all((out >= 0) & (out <= 1))


def test_robust_unet_train_mode_mutates_batch_stats():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    model = create_model("Fast-SCNN")
    variables = model.init(jax.random.PRNGKey(0), x)
    out, updates = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert "batch_stats" in updates
    leaves_before = jax.tree.leaves(variables["batch_stats"])
    leaves_after = jax.tree.leaves(updates["batch_stats"])
    assert any(
        not jnp.allclose(a, b) for a, b in zip(leaves_before, leaves_after)
    )


def test_robust_unet_remat_flavors_identical():
    """All remat flavors (False / True / "conv") must share one checkpoint
    layout (explicit module names pin the variable paths) and produce
    bit-identical loss and gradients — remat is a memory/scheduling choice,
    never a numerics or compatibility choice."""
    from coastline.models.robust_unet import RobustUNet

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    y = (jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1)) > 0.5).astype(
        jnp.float32
    )
    v = RobustUNet(remat=False).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )

    results = {}
    for mode in (False, True, "conv"):
        model = RobustUNet(remat=mode)

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x,
                train=True,
                return_logits=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            z = out.astype(jnp.float32)
            return (
                jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
            ).mean()

        # Same param tree applies to every flavor = checkpoint compatibility.
        results[mode] = jax.jit(jax.value_and_grad(loss_fn))(v["params"])

    l0, g0 = results[False]
    for mode in (True, "conv"):
        l1, g1 = results[mode]
        assert float(jnp.abs(l0 - l1)) == 0.0, mode
        deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
        assert max(jax.tree.leaves(deltas)) == 0.0, mode
