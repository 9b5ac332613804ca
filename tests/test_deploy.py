"""Deployment artifacts (coastline/infer/deploy.py): quantized .npz
round-trip and AOT jax.export serving artifacts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coastline.infer import deploy, quant
from coastline.models.robust_unet import RobustUNet


@pytest.fixture(scope="module")
def qmodel():
    m = RobustUNet(dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    v = m.init({"params": rng, "dropout": rng}, x)
    qm = quant.QuantizedModel.from_variables(v, x, batch_size=2,
                                             arch="robust_unet")
    return qm, x


def test_quantized_npz_roundtrip(qmodel, tmp_path):
    qm, x = qmodel
    ref = np.asarray(qm(x))
    path = tmp_path / "weights.npz"
    deploy.save_quantized(path, qm)
    back = deploy.load_quantized(path)
    assert back.arch == qm.arch
    # codes and steps must round-trip bit-exactly -> identical outputs
    np.testing.assert_array_equal(ref, np.asarray(back(x)))


def test_roundtrip_preserves_dtypes_and_nones(qmodel, tmp_path):
    qm, _ = qmodel
    path = tmp_path / "weights.npz"
    deploy.save_quantized(path, qm)
    back = deploy.load_quantized(path)
    # rb4 (bottleneck, 512->512) is the zoo's one identity shortcut
    assert back.qparams["rb4"]["short"] is None
    assert back.qparams["rb0"]["c1"]["wq"].dtype == np.int8
    assert back.qparams["rb0"]["c1"]["wstep"].dtype == np.float32
    # scale dict survives with float values
    assert all(isinstance(v, float) for v in back.scales.values())


def test_slim_artifact_smaller_and_exact(qmodel, tmp_path):
    qm, x = qmodel
    ref = np.asarray(qm(x))
    slim, full = tmp_path / "slim.npz", tmp_path / "full.npz"
    deploy.save_quantized(slim, qm, slim=True)
    deploy.save_quantized(full, qm, slim=False)
    assert slim.stat().st_size < 0.6 * full.stat().st_size
    back = deploy.load_quantized(slim)
    # default policy never reads the dropped f32 weights -> bit-exact
    np.testing.assert_array_equal(ref, np.asarray(back(x)))
    # reconstructed w is the dequantized codes (policy-change fallback)
    w = back.qparams["rb4"]["c1"]["w"]
    wq = back.qparams["rb4"]["c1"]["wq"].astype(np.float32)
    step = back.qparams["rb4"]["c1"]["wstep"]
    np.testing.assert_allclose(w, wq * step[None, None, None, :], rtol=1e-6)


def test_serving_export_roundtrip(qmodel, tmp_path):
    qm, x = qmodel
    ref = np.asarray(qm(x))
    data = deploy.export_serving(qm, batch_size=2, image_size=64)
    assert isinstance(data, bytes) and len(data) > 0
    fn = deploy.load_serving(data)
    out = np.asarray(fn(qm.qparams, np.asarray(x)))
    np.testing.assert_allclose(ref, out, atol=1e-6)


def test_serving_bundle(qmodel, tmp_path):
    qm, x = qmodel
    ref = np.asarray(qm(x))
    d = tmp_path / "bundle"
    deploy.save_serving_bundle(d, qm, batch_size=2, image_size=64)
    fn, back = deploy.load_serving_bundle(d)
    np.testing.assert_allclose(ref, np.asarray(fn(np.asarray(x))), atol=1e-6)
    assert back.arch == "robust_unet"


def test_serving_bundle_weights_live_on_device(qmodel, tmp_path):
    """The bundle's serving fn must close over DEVICE-resident weights:
    np.load gives host numpy, and handing that tree to the jitted export
    re-uploads every weight through the tunnel on every call (the
    QuantizedModel bug class, CLAUDE.md round-3 post-mortem)."""
    import jax

    qm, x = qmodel
    d = tmp_path / "bundle"
    deploy.save_serving_bundle(d, qm, batch_size=2, image_size=64)
    fn, _ = deploy.load_serving_bundle(d)
    cells = dict(zip(fn.__code__.co_freevars, fn.__closure__))
    tree = cells["qparams_dev"].cell_contents
    leaves = jax.tree_util.tree_leaves(tree)
    assert leaves and all(isinstance(l, jax.Array) for l in leaves)


def test_export_rejects_wrong_shape(qmodel):
    qm, x = qmodel
    data = deploy.export_serving(qm, batch_size=2, image_size=64)
    fn = deploy.load_serving(data)
    bad = np.zeros((3, 64, 64, 3), np.float32)  # batch 3 != exported 2
    with pytest.raises(Exception):
        np.asarray(fn(qm.qparams, bad))


def test_extractor_from_quantized(tmp_path):
    """quantize(save_to=...) -> from_quantized serves identical masks
    without the float checkpoint (the deployment-host path)."""
    from coastline.data.synthetic import make_scene
    from coastline.infer.extract import CoastlineExtractor

    rng = np.random.default_rng(3)
    imgs = np.stack([make_scene(rng, 64)[0] for _ in range(2)])
    npz = tmp_path / "unet_int8.npz"

    ex = CoastlineExtractor(image_size=64)  # random weights
    ex.quantize(imgs, save_to=str(npz))
    ref = ex.predict_masks_batch(imgs)

    served = CoastlineExtractor.from_quantized(str(npz), image_size=64)
    np.testing.assert_array_equal(ref, served.predict_masks_batch(imgs))


def test_extractor_from_quantized_rejects_wrong_arch(qmodel, tmp_path):
    from coastline.infer.extract import CoastlineExtractor

    qm, _ = qmodel  # robust_unet, not the extractor's unet
    path = tmp_path / "wrong.npz"
    deploy.save_quantized(path, qm)
    with pytest.raises(ValueError, match="robust_unet"):
        CoastlineExtractor.from_quantized(str(path), image_size=64)


def test_export_cli_quantized_out(tmp_path):
    """Orbax checkpoint -> `cli.export --quantized-out` -> .npz served by
    the extractor: the one-command deployment-artifact path."""
    import jax
    import jax.numpy as jnp

    from coastline.cli.export import main as export_main
    from coastline.infer.extract import CoastlineExtractor
    from coastline.models.unet import UNet
    from coastline.train.checkpoint import CheckpointManager

    model = UNet(n_classes=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )

    class _State:
        params = variables["params"]
        batch_stats = variables["batch_stats"]

    ckpt_dir = tmp_path / "models"
    mgr = CheckpointManager(str(ckpt_dir))
    assert mgr.maybe_save_best(1, _State, iou=0.9)
    mgr.close()

    npz = tmp_path / "unet_int8.npz"
    export_main(["--checkpoint-dir", str(ckpt_dir), "--quantized-out",
                 str(npz), "--image-size", "64"])
    ex = CoastlineExtractor.from_quantized(str(npz), image_size=64)
    rng = np.random.default_rng(0)
    masks = ex.predict_masks_batch(
        rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    assert masks.shape == (2, 64, 64) and set(np.unique(masks)) <= {0, 1}


def test_export_cli_quantized_rejects_unsupported_arch(tmp_path):
    """All 12 zoo archs fold now; the fail-fast gate still guards truly
    unknown arch names before any checkpoint IO."""
    from coastline.cli.export import main as export_main

    with pytest.raises(SystemExit, match="no int8 fold"):
        export_main(["--checkpoint-dir", str(tmp_path), "--quantized-out",
                     str(tmp_path / "x.npz"), "--arch", "NoSuchNet",
                     "--image-size", "64"])


@pytest.mark.parametrize("arch,mod,cls", [
    ("fastscnn", "coastline.models.fastscnn", "FastSCNN"),
    ("enet", "coastline.models.enet", "ENet"),
])
def test_new_arch_npz_roundtrip(arch, mod, cls, tmp_path):
    """The round-3 zoo completions introduce new folded-tree node shapes —
    FastSCNN's depthwise 'dw' entries (kept f32 by slimming: grouped convs
    always read w) and ENet's raw 'pool_inv'/'pool_shift' affine arrays —
    all of which must survive the slim .npz round-trip bit-exactly."""
    M = getattr(__import__(mod, fromlist=[cls]), cls)
    m = M(dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    v = m.init({"params": rng, "dropout": rng}, x)
    qm = quant.QuantizedModel.from_variables(v, x, batch_size=2, arch=arch)
    ref = np.asarray(qm(x))
    path = tmp_path / "w.npz"
    deploy.save_quantized(path, qm)
    back = deploy.load_quantized(path)
    assert back.arch == arch
    np.testing.assert_array_equal(ref, np.asarray(back(x)))
    if arch == "enet":
        np.testing.assert_array_equal(back.qparams["init"]["pool_inv"],
                                      np.asarray(qm.qparams["init"]["pool_inv"]))
    else:
        assert "w" in back.qparams["ds9"]["dw"]  # grouped conv keeps f32 w


def test_slim_respects_convT_policy(qmodel, tmp_path):
    """With convT_int8=False the float path of the transposed convs reads
    entry['w']; slimming must keep those weights so the saved policy stays
    bit-exact (it used to drop them and silently serve the dequantized
    approximation)."""
    qm, x = qmodel
    qm_f = quant.QuantizedModel(
        jax.tree_util.tree_map(np.asarray, qm.qparams), qm.scales,
        arch=qm.arch, policy={"convT_int8": False})
    ref = np.asarray(qm_f(x))
    path = tmp_path / "noconvt.npz"
    deploy.save_quantized(path, qm_f, slim=True)
    back = deploy.load_quantized(path)
    for i in range(4):  # the up* f32 weights survived slimming
        assert "w" in back.qparams[f"up{i}"]
    np.testing.assert_array_equal(ref, np.asarray(back(x)))
