"""Int8 PTQ engine tests (coastline/infer/quant.py).

Three layers of evidence, smallest-first:
  1. BN-folding + rewritten forward are EXACT: the f32 float path matches
     `RobustUNet.apply` to float tolerance (the engine re-implements the
     architecture; this pins every fold/epilogue/gate against the model).
  2. The int8 graph runs and its weight quantization round-trips within the
     per-channel step bound.
  3. End-to-end int8-vs-float mask agreement on a TRAINED model is gated by
     scripts/eval_quant_accuracy.py on-chip (artifacts/quant_accuracy.json,
     asserted by test_quant_accuracy_artifact below when present).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coastline.infer import quant
from coastline.models.robust_unet import RobustUNet


@pytest.fixture(scope="module")
def small_model():
    m = RobustUNet(dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    v = m.init({"params": rng, "dropout": rng}, x)
    # Non-trivial running stats: one train-mode pass updates them.
    _, upd = m.apply(v, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": rng})
    return m, {"params": v["params"], "batch_stats": upd["batch_stats"]}, x


def test_folded_float_forward_matches_apply(small_model):
    m, v, x = small_model
    ref = m.apply(v, x, train=False)
    folded = quant.fold_robust_unet(v)
    got = jax.jit(lambda f, xx: quant.float_forward(f, xx, dtype=jnp.float32))(
        folded, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4)


def test_folded_float_logits_match(small_model):
    m, v, x = small_model
    ref = m.apply(v, x, train=False, return_logits=True)
    folded = quant.fold_robust_unet(v)
    got = jax.jit(lambda f, xx: quant.float_forward(
        f, xx, return_logits=True, dtype=jnp.float32))(folded, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-3)


def test_weight_quantization_roundtrip(small_model):
    _, v, _ = small_model
    folded = quant.fold_robust_unet(v)
    qp = quant.quantize_folded(folded)
    w, _ = folded["rb2"]["c2"]
    entry = qp["rb2"]["c2"]
    err = np.abs(w - entry["wq"].astype(np.float32) * entry["wstep"])
    # symmetric rounding: error bounded by half a step per channel
    assert (err <= 0.5 * entry["wstep"][None, None, None, :] + 1e-8).all()


def test_int8_forward_runs_and_agrees(small_model):
    m, v, x = small_model
    ref = m.apply(v, x, train=False)
    folded = quant.fold_robust_unet(v)
    scales = quant.calibrate(folded, x, batch_size=2)
    qp = quant.quantize_folded(folded)
    got = jax.jit(lambda p, xx: quant.int8_forward(p, scales, xx))(qp, x)
    assert got.shape == ref.shape and got.dtype == jnp.float32
    # Random-init nets are the PTQ worst case (probs pile up at the sigmoid's
    # steepest point); still demand high mask agreement + bounded prob error.
    agree = float((np.asarray(ref > 0.5) == np.asarray(got > 0.5)).mean())
    assert agree > 0.93
    assert float(jnp.abs(ref - got).mean()) < 0.05


def test_policy_variants_agree(small_model):
    """The per-op policy changes WHICH engine executes each conv, never the
    math: int8-storage-only (all-bf16 convs) must closely match the default
    mixed policy, and both must track the float path."""
    m, v, x = small_model
    folded = quant.fold_robust_unet(v)
    scales = quant.calibrate(folded, x, batch_size=2)
    qp = quant.quantize_folded(folded)
    default = jax.jit(lambda p, xx: quant.int8_forward(p, scales, xx))(qp, x)
    a8only = jax.jit(lambda p, xx: quant.int8_forward(
        p, scales, xx, policy={"conv_min_ch": 10**9, "convT_int8": False}))(
            qp, x)
    # same quantization sites, different conv engines: tiny numeric drift
    assert float(jnp.abs(default - a8only).mean()) < 0.02
    agree = float((np.asarray(default > .5) == np.asarray(a8only > .5)).mean())
    assert agree > 0.97


def test_round4_experiment_policies_agree(small_model):
    """The round-4 experiment paths (gated_int8 sites, split_cat two-conv
    decoder) stay correct even though both are policy-off by default as
    measured negatives (docs/QUANT.md): with the policy forced on, the
    forward must closely track the default graph — the split path drops
    the cat-site requant, so agreement is close, not bitwise."""
    m, v, x = small_model
    folded = quant.fold_robust_unet(v)
    scales = quant.calibrate(folded, x, batch_size=2)
    assert "rb5.gated" in scales and "cat0" in scales  # both site families
    qp = quant.quantize_folded(folded)
    default = jax.jit(lambda p, xx: quant.int8_forward(p, scales, xx))(qp, x)
    for policy in ({"gated_int8": True}, {"split_cat": True},
                   {"gated_int8": True, "split_cat": True}):
        got = jax.jit(lambda p, xx, pol=policy: quant.int8_forward(
            p, scales, xx, policy=pol))(qp, x)
        assert float(jnp.abs(default - got).mean()) < 0.02, policy
        agree = float((np.asarray(default > .5) == np.asarray(got > .5)).mean())
        assert agree > 0.97, policy


def test_calibration_sites_cover_every_scale_lookup(small_model):
    _, v, x = small_model
    folded = quant.fold_robust_unet(v)
    sites = quant.calibration_sites(folded, x)
    scales = quant.calibrate(folded, x[:2], batch_size=2)
    assert sorted(scales) == sites
    assert all(s > 0 for s in scales.values())


def test_quantized_wrapper(small_model):
    _, v, x = small_model
    q = quant.QuantizedRobustUNet.from_variables(v, x, batch_size=2)
    y = q(x)
    assert y.shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(y)).all()


@pytest.fixture(scope="module")
def small_unet():
    from coastline.models.unet import UNet

    m = UNet(n_classes=2, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    v = m.init({"params": rng, "dropout": rng}, x)
    _, upd = m.apply(v, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": rng})
    return m, {"params": v["params"], "batch_stats": upd["batch_stats"]}, x


def test_unet_folded_float_forward_matches_apply(small_unet):
    m, v, x = small_unet
    ref = m.apply(v, x, train=False)  # logits (2-class CE head)
    folded = quant.fold_unet(v)
    got = jax.jit(lambda f, xx: quant.float_forward(
        f, xx, dtype=jnp.float32, arch="unet"))(folded, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-3)


def test_unet_int8_argmax_agrees(small_unet):
    m, v, x = small_unet
    ref = np.argmax(np.asarray(m.apply(v, x, train=False)), axis=-1)
    q = quant.QuantizedModel.from_variables(v, x, batch_size=2, arch="unet")
    got = np.argmax(np.asarray(q(x)), axis=-1)
    assert (ref == got).mean() > 0.93  # random-init worst case


def test_extractor_quantize_mode(tmp_path):
    """CoastlineExtractor.quantize() keeps the whole artifact pipeline
    working on the int8 predict path."""
    from PIL import Image

    from coastline.data.synthetic import make_scene
    from coastline.infer.extract import CoastlineExtractor

    rng = np.random.default_rng(0)
    img, _, _ = make_scene(rng, 64)
    path = tmp_path / "scene.png"
    Image.fromarray(img).save(path)

    ex = CoastlineExtractor(image_size=64)  # random weights are fine here
    ex.quantize(np.stack([img]))
    res = ex.extract_coastline_from_image(str(path), str(tmp_path))
    assert res is not None
    assert res["water_mask"].shape == (64, 64)
    assert (tmp_path / "scene_water_mask.png").exists()
    # batched path shares the swapped predict fn
    masks = ex.predict_masks_batch(np.stack([img, img]))
    assert masks.shape == (2, 64, 64) and set(np.unique(masks)) <= {0, 1}


def test_int8_forward_under_data_mesh(small_model):
    """The int8 graph composes with GSPMD: batch-sharded over a 4-device
    'data' mesh it must produce the single-device output (quantization is
    elementwise + convs — partitioning cannot change the codes)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coastline.parallel.mesh import make_mesh

    _, v, x = small_model
    folded = quant.fold_robust_unet(v)
    scales = quant.calibrate(folded, x, batch_size=2)
    qp = quant.quantize_folded(folded)
    xb = jnp.concatenate([x, x[::-1]], axis=0)  # batch 4

    single = jax.jit(lambda p, xx: quant.int8_forward(p, scales, xx))(qp, xb)

    mesh = make_mesh(4, space=1)
    xsh = NamedSharding(mesh, P("data"))

    @jax.jit
    def sharded(p, xx):
        xx = jax.lax.with_sharding_constraint(xx, xsh)
        return quant.int8_forward(p, scales, xx)

    out = sharded(jax.device_put(qp, NamedSharding(mesh, P())),
                  jax.device_put(xb, xsh))
    np.testing.assert_allclose(np.asarray(single), np.asarray(out),
                               atol=2e-3)


def test_int8_segformer_under_data_mesh():
    """The attention-bearing arch composes with GSPMD too: SegFormer's
    spatial-reduction einsum + f32 softmax over int8-read inputs must be
    batch-partitionable without changing the output (attention never
    mixes batch elements, so sharding 'data' is embarrassingly parallel
    — this pins that XLA agrees once quant sites are in the graph)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coastline.models.segformer_lite import SegFormerLite
    from coastline.parallel.mesh import make_mesh

    m = SegFormerLite(dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    v = m.init({"params": rng, "dropout": rng}, x)
    folded = quant.fold_segformer_lite(v)
    scales = quant.calibrate(folded, x, batch_size=2, arch="segformer_lite")
    qp = quant.quantize_folded(folded)
    xb = jnp.concatenate([x, x[::-1]], axis=0)  # batch 4

    single = jax.jit(lambda p, xx: quant.int8_forward(
        p, scales, xx, arch="segformer_lite"))(qp, xb)

    mesh = make_mesh(4, space=1)
    xsh = NamedSharding(mesh, P("data"))

    @jax.jit
    def sharded(p, xx):
        xx = jax.lax.with_sharding_constraint(xx, xsh)
        return quant.int8_forward(p, scales, xx, arch="segformer_lite")

    out = sharded(jax.device_put(qp, NamedSharding(mesh, P())),
                  jax.device_put(xb, xsh))
    np.testing.assert_allclose(np.asarray(single), np.asarray(out),
                               atol=2e-3)


def test_server_on_quantized_extractor():
    """The micro-batching server runs unchanged on the int8 predict path."""
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=64)
    rng = np.random.default_rng(1)
    images = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
              for _ in range(4)]
    ex.quantize(np.stack(images))
    direct = ex.predict_masks_batch(np.stack(images))
    with ex.serve(batch_size=4) as srv:
        masks = srv.predict_many(images)
    for i in range(4):
        np.testing.assert_array_equal(masks[i], direct[i])


@pytest.mark.parametrize("arch,model_fn", [
    ("segnet", lambda: __import__("coastline.models.segnet",
                                  fromlist=["SegNet"]).SegNet(dtype=jnp.float32)),
    ("deeplabv3p", lambda: __import__("coastline.models.deeplabv3p",
                                      fromlist=["DeepLabV3Plus"]
                                      ).DeepLabV3Plus(dtype=jnp.float32)),
    ("mswnet", lambda: __import__("coastline.models.mswnet",
                                  fromlist=["MSWNet"]).MSWNet(dtype=jnp.float32)),
    ("waternet", lambda: __import__("coastline.models.waternet",
                                    fromlist=["WaterNet"]
                                    ).WaterNet(dtype=jnp.float32)),
    ("pspnet", lambda: __import__("coastline.models.pspnet",
                                  fromlist=["PSPNet"]).PSPNet(dtype=jnp.float32)),
    ("yoloseg", lambda: __import__("coastline.models.yoloseg",
                                   fromlist=["YOLOSeg"]
                                   ).YOLOSeg(dtype=jnp.float32)),
    ("hrnet_water", lambda: __import__("coastline.models.hrnet_water",
                                       fromlist=["HRNetWater"]
                                       ).HRNetWater(dtype=jnp.float32)),
    ("fastscnn", lambda: __import__("coastline.models.fastscnn",
                                    fromlist=["FastSCNN"]
                                    ).FastSCNN(dtype=jnp.float32)),
    ("enet", lambda: __import__("coastline.models.enet",
                                fromlist=["ENet"]).ENet(dtype=jnp.float32)),
    ("segformer_lite", lambda: __import__(
        "coastline.models.segformer_lite",
        fromlist=["SegFormerLite"]).SegFormerLite(dtype=jnp.float32)),
])
def test_more_archs_fold_and_int8(arch, model_fn):
    """Every remaining zoo architecture: f32 anchor vs apply, then the
    int8 path runs and agrees. Covers SegNet (indexed unpool on codes),
    DeepLabV3+ (strided stem, ASPP global-pool broadcast, ConvT+BN fold),
    MSWNet (multi-scale branches, 1024-ch bridge), WaterNet/PSPNet, plus
    YOLOSeg (leaky), HRNet-Water (branch fusion), Fast-SCNN (depthwise
    grouped + pyramid), ENet (split-BN initial block, asymmetric/dilated
    bottlenecks), SegFormer-Lite (spatial-reduction attention, Mix-FFN)."""
    m = model_fn()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    v = m.init({"params": rng, "dropout": rng}, x)
    _, upd = m.apply(v, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": rng})
    v = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    ref = m.apply(v, x, train=False)
    folded = quant.ARCHS[arch][0](v)
    got = jax.jit(lambda f, xx: quant.float_forward(
        f, xx, dtype=jnp.float32, arch=arch))(folded, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4)

    q = quant.QuantizedModel.from_variables(v, x, batch_size=2, arch=arch)
    got8 = np.asarray(q(x))
    agree = float((np.asarray(ref > .5) == (got8 > .5)).mean())
    assert agree > 0.93
    assert float(np.abs(np.asarray(ref) - got8).mean()) < 0.05


ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "quant_accuracy.json")


@pytest.mark.skipif(not os.path.exists(ART), reason="on-chip artifact absent")
def test_quant_accuracy_artifact():
    """Gate the committed on-chip accuracy artifact: a TRAINED model must
    keep IoU-vs-labels within 0.002 of the bf16 path and the int8/bf16 mask
    agreement IoU above 0.995."""
    with open(ART) as f:
        art = json.load(f)
    assert art["iou_drop"] <= 0.002, art
    assert art["mask_agreement_iou"] >= 0.995, art


def test_quant_accuracy_zoo_artifact():
    """Gate the committed FULL-ZOO on-chip accuracy artifact (round 4):
    all 12 architectures, trained at the reference per-model epochs on the
    512^2 synthetic protocol, must each keep their int8 IoU within the
    recorded gates (scripts/eval_quant_accuracy_zoo.py)."""
    path = os.path.join(os.path.dirname(ART), "quant_accuracy_zoo.json")
    with open(path) as f:
        art = json.load(f)
    # provenance: the committed artifact must be the full 512^2 protocol,
    # never a --quick smoke (which writes to its own _quick tree anyway)
    assert art["protocol"]["size"] == 512 and not art.get("quick"), \
        art["protocol"]
    assert art["n_archs"] == 12, sorted(art["archs"])
    gates = art["gates"]
    # "really trained" floors are derived from the reference's PUBLISHED
    # per-arch IoU variance (mean - 2*std, capped at 0.93; e.g. ENet
    # 0.7843 +/- 0.1166 -> 0.551) — the rule is recorded in the artifact
    # and pinned against baselines/reference_published_iou.json here.
    floors = art["trained_floors"]
    assert art["trained_floor_rule"].startswith("min(0.93,")
    import json as _json
    pub = _json.load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "baselines", "reference_published_iou.json")))
    for arch, row in art["archs"].items():
        assert row["iou_drop"] <= gates["iou_drop"], (arch, row)
        assert row["mask_agreement_iou"] >= gates["mask_agreement_iou"], (
            arch, row)
        expected_floor = 0.93
        if arch in pub:
            expected_floor = min(0.93, pub[arch]["mean"] - 2 * pub[arch]["std"])
        assert abs(floors[arch] - expected_floor) < 1e-3, (arch, floors)
        assert row["train_best_iou"] > floors[arch], (arch, row)
    # flagship holds the tighter round-3 gate
    rb = art["archs"]["robust_unet"]
    assert rb["iou_drop"] <= gates["flagship_iou_drop"]
    assert rb["mask_agreement_iou"] >= gates["flagship_agreement"]
    assert art["all_gated"] is True

@pytest.mark.xfail(
    reason="XLA SPMD partitioner bug: the halo-exchange path pads the "
           "all-gathered s8 conv operand with a mismatched-dtype constant "
           "('element types of the operands to Pad do not match', observed "
           "jax 0.9.0) — int8 serving shards over 'data' (tested above); "
           "spatial partitioning requires bf16 until XLA fixes s8 halos",
    strict=False)
def test_int8_forward_under_space_mesh(small_model):
    """Spatial sharding (image rows over a 'space' axis) composes with the
    int8 graph: GSPMD must halo-exchange the padded int8 convs and
    reproduce the single-device output (scene-scale serving layout)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coastline.parallel.mesh import make_mesh

    _, v, x = small_model
    folded = quant.fold_robust_unet(v)
    scales = quant.calibrate(folded, x, batch_size=2)
    qp = quant.quantize_folded(folded)

    single = jax.jit(lambda p, xx: quant.int8_forward(p, scales, xx))(qp, x)

    mesh = make_mesh(4, space=2)
    xsh = NamedSharding(mesh, P("data", "space"))

    @jax.jit
    def sharded(p, xx):
        xx = jax.lax.with_sharding_constraint(xx, xsh)
        return quant.int8_forward(p, scales, xx)

    out = sharded(jax.device_put(qp, NamedSharding(mesh, P())),
                  jax.device_put(x, xsh))
    np.testing.assert_allclose(np.asarray(single), np.asarray(out),
                               atol=2e-3)


def test_int8_space_mesh_float_conv_workaround(small_model):
    """Until XLA fixes the s8 halo-pad bug (xfail above), spatial sharding
    DOES compose with the int8 graph when every conv takes the float path:
    dequantization is elementwise-local, so GSPMD halo-exchanges bf16/f32
    conv operands while activations still live at int8 sites (the HBM
    bandwidth win survives; only the s8xs8 MXU matmuls are given up).

    Equality is mask-level, not elementwise: partitioning changes the
    backend's conv accumulation order by ulps, and each requantization
    round()s those ulps across code boundaries — measured MAE ~0.013 on
    an UNTRAINED model whose probs hover near 0.5 (the worst case for
    threshold flips; a trained model's saturated outputs agree far
    tighter). The test pins that the graph compiles and serves
    mask-equivalently under the space mesh (docs/QUANT.md)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coastline.parallel.mesh import make_mesh

    _, v, x = small_model
    folded = quant.fold_robust_unet(v)
    scales = quant.calibrate(folded, x, batch_size=2)
    qp = quant.quantize_folded(folded)
    policy = {"conv_min_ch": 1 << 30, "convT_int8": False}

    single = jax.jit(lambda p, xx: quant.int8_forward(
        p, scales, xx, policy=policy))(qp, x)

    mesh = make_mesh(4, space=2)
    xsh = NamedSharding(mesh, P("data", "space"))

    @jax.jit
    def sharded(p, xx):
        xx = jax.lax.with_sharding_constraint(xx, xsh)
        return quant.int8_forward(p, scales, xx, policy=policy)

    out = sharded(jax.device_put(qp, NamedSharding(mesh, P())),
                  jax.device_put(x, xsh))
    single, out = np.asarray(single), np.asarray(out)
    assert float(np.abs(single - out).mean()) < 0.03
    assert float(((single > .5) == (out > .5)).mean()) > 0.95


def test_quant_arch_for_resolves_every_registry_name():
    """The export CLI resolves quant arch keys through quant_arch_for —
    derived from the model registry's alias table, so there is no parallel
    display-name map to drift when an architecture is added or renamed."""
    from coastline.infer.quant import ARCHS, quant_arch_for
    from coastline.models.registry import available_models

    for name in available_models():
        key = quant_arch_for(name)
        assert key in ARCHS, f"{name!r} resolved to {key!r}"
    assert quant_arch_for("Robust UNet") == "robust_unet"
    assert quant_arch_for("deeplab") == "deeplabv3p"
    assert quant_arch_for("segformer_lite") == "segformer_lite"
    assert quant_arch_for("not_a_model") is None


def test_quant_floor_artifact():
    """The int8 byte-floor artifact (VERDICT r4 item 4): measured HBM
    traffic vs the minimum-traffic floor (weights once + every conv
    interface once-out/once-in at serving dtype). The recorded ratio must
    stay under the 1.3x action threshold — the bytes-level proof that the
    265 img/s headline is this design's ceiling (scripts/quant_floor.py)."""
    path = os.path.join(os.path.dirname(ART), "quant_floor.json")
    with open(path) as f:
        art = json.load(f)
    assert art["n_sites"] >= 50 and art["n_s8_sites"] >= 50
    # sane floor decomposition: sites dominate, weights are the slim tree
    assert art["weight_bytes"] < 60 * 2**20
    assert art["site_bytes_per_image"] > 200 * 2**20
    assert art["measured"]["total_per_image"] > 0
    assert art["measured_over_floor"] <= 1.3
    assert art["measured_over_floor_no_cat"] <= 1.3
