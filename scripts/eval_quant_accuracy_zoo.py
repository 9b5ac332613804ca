"""Per-architecture int8 PTQ accuracy gates on TRAINED weights.

VERDICT r3 item 4: the round-3 artifact covered RobustUNet only; the other
11 architectures were latency-proven but accuracy-assumed. This script
measures every ARCHS entry under the Main_Final synthetic protocol
(512^2, 50 scenes, 40/10 sequential split, the reference per-model epochs
`Main_Final.py:862-865` / `comne.py:978-983`, batch 2, lr 1e-4 — the
`bench_all --synthetic` checkpoint flow):

  per arch: train bf16 (cached to artifacts/quant_accuracy_zoo/), fold +
  calibrate on 8 train images, then on the 10 held-out scenes compare
  IoU-vs-labels (bf16 vs int8), int8/bf16 mask agreement, mean |dprob|.

Incremental: each arch writes its own row JSON, so an interrupted run
resumes where it stopped. Aggregate lands in
artifacts/quant_accuracy_zoo.json and is gated by
tests/test_quant.py::test_quant_accuracy_zoo_artifact and surfaced by
bench.py (int8_zoo_gated).

Usage:
  python scripts/eval_quant_accuracy_zoo.py                 # full zoo
  python scripts/eval_quant_accuracy_zoo.py --archs enet    # one arch
  python scripts/eval_quant_accuracy_zoo.py --quick         # CPU smoke
"""

import argparse
import glob
import json
import os
import pickle
import sys
import time

import numpy as np

ART = "artifacts/quant_accuracy_zoo.json"
ART_DIR = "artifacts/quant_accuracy_zoo"
# --quick (size-64 CPU smoke) must never touch the committed 512^2
# artifacts or reuse/poison their trained checkpoints — it gets its own
# tree, and checkpoint filenames carry the protocol size + epochs.
QUICK_ART = "artifacts/quant_accuracy_zoo_quick.json"
QUICK_DIR = "artifacts/quant_accuracy_zoo_quick"

# ARCHS key -> (model-registry display name, loss). Epochs come from the
# reference protocol via cli.bench_all.model_train_config; the 2-class
# production UNet is not in the comparison scripts — it trains CE, 20 ep.
ZOO = {
    "robust_unet": ("Robust UNet", "bce"),
    "unet": ("UNet", "ce"),
    "deeplabv3p": ("DeepLabV3+", "bce"),
    "yoloseg": ("YOLO-SEG", "bce"),
    "segnet": ("SegNet", "bce"),
    "pspnet": ("PSPNet", "bce"),
    "fastscnn": ("Fast-SCNN", "bce"),
    "enet": ("ENet", "bce"),
    "waternet": ("WaterNet", "bce"),
    "mswnet": ("MSWNet", "bce"),
    "hrnet_water": ("HRNet-Water", "bce"),
    "segformer_lite": ("SegFormer-Lite", "bce"),
}

# Gates (recorded into the artifact so the test and bench read ONE source):
# flagship keeps the round-3 gate; the rest allow a slightly wider drop —
# per-tensor activation scales cost more on wobblier architectures (the
# reference's own ENet IoU std is 0.12, BASELINE.md).
GATES = {"iou_drop": 0.005, "mask_agreement_iou": 0.99,
         "flagship_iou_drop": 0.002, "flagship_agreement": 0.995}

# "Really trained" floors for train_best_iou, derived from the reference's
# PUBLISHED per-arch variance (BASELINE.md / README.md:10-18): floor =
# published mean - 2*std, capped at the generic 0.93 the well-behaved archs
# all clear by a wide margin. Archs the reference never published (the
# 2-class production UNet, WaterNet, MSWNet) get the cap. This replaces the
# round-4 hand-eased uniform 0.9 (VERDICT r4 weak #5) with a rule tied to
# the published data — e.g. ENet 0.7843-2*0.1166 = 0.551.
FLOOR_RULE = "min(0.93, published_mean - 2*published_std); 0.93 if unpublished"
FLOOR_CAP = 0.93


def trained_floors():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "baselines", "reference_published_iou.json")
    with open(path) as f:
        pub = json.load(f)
    return {arch: (round(min(FLOOR_CAP, pub[arch]["mean"] - 2 * pub[arch]["std"]), 4)
                   if arch in pub else FLOOR_CAP)
            for arch in ZOO}


def get_trained_variables(arch, display, loss, images, masks, n_train,
                          epochs, batch, lr, seed):
    import jax
    import jax.numpy as jnp

    size = int(images.shape[1])
    # legacy name == the committed 512^2 reference-epochs protocol; any
    # other size/epochs combo gets its own cache key so protocols never
    # cross-contaminate (round-4 review finding)
    if size == 512 and epochs is None:
        ckpt = os.path.join(ART_DIR, f"trained_{arch}_s{seed}.pkl")
    else:
        ckpt = os.path.join(
            ART_DIR, f"trained_{arch}_s{seed}_{size}px_{epochs}ep.pkl")
    if os.path.exists(ckpt):
        with open(ckpt, "rb") as f:
            print(f"{arch}: cached checkpoint {ckpt}", file=sys.stderr)
            return pickle.load(f)

    from coastline.cli.bench_all import model_train_config
    from coastline.data.pipeline import DeviceDataset
    from coastline.models.registry import create_model
    from coastline.train.loop import Evaluator, TrainConfig

    train_ds = DeviceDataset.from_numpy(images[:n_train], masks[:n_train])
    val_ds = DeviceDataset.from_numpy(images[n_train:], masks[n_train:])
    model = create_model(display, dtype=jnp.bfloat16)
    if loss == "ce":
        cfg = TrainConfig(epochs=epochs or 20, lr=lr, batch_size=batch,
                          eval_batch_size=batch, loss="ce",
                          plateau_on="val", plateau_patience=10, seed=seed)
    else:
        cfg = model_train_config(display, epochs=epochs, lr=lr,
                                 batch_size=batch, seed=seed)
    ev = Evaluator(model, cfg)
    t0 = time.time()
    tr = ev.train_model(train_ds, val_ds, verbose=False)
    print(f"{arch}: trained {cfg.epochs} ep, best_iou={tr['best_iou']:.5f} "
          f"in {time.time() - t0:.0f}s", file=sys.stderr)
    variables = jax.device_get(
        {"params": ev.state.params, "batch_stats": ev.state.batch_stats})
    variables["_best_iou"] = float(tr["best_iou"])
    os.makedirs(ART_DIR, exist_ok=True)
    with open(ckpt, "wb") as f:
        pickle.dump(variables, f)
    return variables


def eval_arch(arch, images, masks, n_train, size, epochs, seed, quick):
    import jax
    import jax.numpy as jnp

    from coastline.infer import quant
    from coastline.models.registry import create_model
    from coastline.train.loop import normalize_images
    from coastline.train.metrics import binary_iou

    display, loss = ZOO[arch]
    v = get_trained_variables(arch, display, loss, images, masks, n_train,
                              epochs, batch=2, lr=1e-4, seed=seed)
    best_iou = v.pop("_best_iou", None)

    model = create_model(display, dtype=jnp.bfloat16)
    folded = quant.ARCHS[arch][0](v)
    calib = normalize_images(jnp.asarray(images[:8]))
    scales = quant.calibrate(folded, calib, batch_size=2, arch=arch)
    qp = quant.quantize_folded(folded)

    two_class = loss == "ce"
    bf16_fn = jax.jit(lambda p, s, x: model.apply(
        {"params": p, "batch_stats": s}, x, train=False))
    int8_fn = jax.jit(
        lambda p, x: quant.int8_forward(p, scales, x, arch=arch))

    val_x = normalize_images(jnp.asarray(images[n_train:]))
    val_y = masks[n_train:].astype(bool)

    ious_bf16, ious_int8, agree, dprob = [], [], [], []
    n_val = val_x.shape[0]
    for i in range(0, n_val, 2):
        xb = val_x[i:i + 2]
        pb = np.asarray(bf16_fn(v["params"], v["batch_stats"], xb),
                        np.float32)
        pq = np.asarray(int8_fn(qp, xb), np.float32)
        if two_class:  # 2-class logits -> water prob = softmax class 1
            pb = _softmax1(pb)
            pq = _softmax1(pq)
        else:
            pb, pq = pb[..., 0], pq[..., 0]
        for j in range(xb.shape[0]):
            y = val_y[i + j]
            ious_bf16.append(float(binary_iou(pb[j] > .5, y)))
            ious_int8.append(float(binary_iou(pq[j] > .5, y)))
            agree.append(float(binary_iou(pq[j] > .5, pb[j] > .5)))
            dprob.append(float(np.abs(pb[j] - pq[j]).mean()))

    row = {
        "arch": arch,
        "seed": seed,
        # protocol key: rows from a --size/--epochs override can never be
        # merged into (or overwrite) the committed 512^2 reference-epoch
        # aggregate (ADVICE r4 medium — mirrors the checkpoint cache-key fix)
        "size": size,
        "epochs": epochs,
        "train_best_iou": best_iou,
        "bf16_iou_mean": float(np.mean(ious_bf16)),
        "int8_iou_mean": float(np.mean(ious_int8)),
        "iou_drop": float(np.mean(ious_bf16) - np.mean(ious_int8)),
        "mask_agreement_iou": float(np.mean(agree)),
        "mean_abs_prob_diff": float(np.mean(dprob)),
    }
    os.makedirs(ART_DIR, exist_ok=True)
    with open(os.path.join(ART_DIR, _row_name(arch, seed, size, epochs)),
              "w") as f:
        json.dump(row, f, indent=2)
    print(f"{arch}: bf16 {row['bf16_iou_mean']:.4f} int8 "
          f"{row['int8_iou_mean']:.4f} drop {row['iou_drop']:.2e} "
          f"agree {row['mask_agreement_iou']:.4f}", file=sys.stderr)
    return row


def _row_name(arch, seed, size, epochs):
    """Legacy name == the committed 512^2 reference-epochs protocol; any
    override gets a protocol-suffixed filename (so the committed rows are
    never overwritten by an experimental run)."""
    if size == 512 and epochs is None:
        return f"arch_{arch}_s{seed}.json"
    return f"arch_{arch}_s{seed}_{size}px_{epochs}ep.json"


def _row_matches_protocol(row, size, epochs):
    """Legacy rows carry no size/epochs fields and mean 512^2/reference."""
    return (row.get("size", 512) == size
            and row.get("epochs", None) == epochs)


def _softmax1(logits):
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    return (e / e.sum(axis=-1, keepdims=True))[..., 1]


def aggregate(size, n, n_train, seed, quick, epochs=None):
    """Merge every recorded seed per arch, keeping the WORST values as the
    gate numbers (mirrors eval_quant_accuracy.py's conservative policy).
    Only rows matching THIS invocation's protocol (size/epochs) are merged —
    the stamped protocol block is guaranteed to describe every row
    (ADVICE r4 medium)."""
    import jax

    by_arch = {}
    n_skipped = 0
    for path in sorted(glob.glob(os.path.join(ART_DIR, "arch_*_s*.json"))):
        with open(path) as f:
            r = json.load(f)
        if not _row_matches_protocol(r, size, epochs):
            n_skipped += 1
            continue
        by_arch.setdefault(r["arch"], []).append(r)
    if n_skipped:
        print(f"aggregate: skipped {n_skipped} row(s) from other protocols",
              file=sys.stderr)
    rows = []
    for arch, seeds in sorted(by_arch.items()):
        worst = dict(max(seeds, key=lambda r: r["iou_drop"]))
        worst["iou_drop"] = max(r["iou_drop"] for r in seeds)
        worst["mask_agreement_iou"] = min(r["mask_agreement_iou"]
                                          for r in seeds)
        worst["mean_abs_prob_diff"] = max(r["mean_abs_prob_diff"]
                                          for r in seeds)
        worst["train_best_iou"] = min(r["train_best_iou"] or 0.0
                                      for r in seeds)
        worst["n_seeds"] = len(seeds)
        rows.append(worst)
    assert rows, "no per-arch rows to aggregate"
    floors = trained_floors()
    out = {
        "protocol": {"size": size, "n": n, "n_train": n_train,
                     "epochs": ("reference per-model" if epochs is None
                                else epochs),
                     "batch": 2, "lr": 1e-4,
                     "calib_images": 8, "seed": seed,
                     "weight_quant": "per-channel symmetric int8",
                     "act_quant": "per-tensor symmetric int8 (absmax)"},
        "platform": jax.default_backend(),
        "quick": bool(quick),
        "gates": GATES,
        "trained_floor_rule": FLOOR_RULE,
        "trained_floors": floors,
        "archs": {r["arch"]: r for r in rows},
        "n_archs": len(rows),
        "worst_iou_drop": max(r["iou_drop"] for r in rows),
        "worst_agreement": min(r["mask_agreement_iou"] for r in rows),
        "all_gated": all(
            r["iou_drop"] <= GATES["iou_drop"]
            and r["mask_agreement_iou"] >= GATES["mask_agreement_iou"]
            and r["train_best_iou"] > floors[r["arch"]]
            for r in rows),
    }
    with open(ART, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("n_archs", "worst_iou_drop", "worst_agreement",
                       "all_gated")}, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--archs", default=",".join(ZOO))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the reference per-model epochs")
    ap.add_argument("--quick", action="store_true",
                    help="tiny CPU smoke: size 64, n 10, 2 epochs")
    ap.add_argument("--aggregate-only", action="store_true")
    args = ap.parse_args()

    from coastline.utils.platform import apply_platform_override, enable_compile_cache

    apply_platform_override()
    enable_compile_cache()

    if args.quick:
        global ART, ART_DIR
        ART, ART_DIR = QUICK_ART, QUICK_DIR
        args.size, args.n = 64, 10
        args.epochs = args.epochs or 2
    n_train = int(args.n * 0.8)

    if args.aggregate_only:
        aggregate(args.size, args.n, n_train, args.seed, args.quick,
                  epochs=args.epochs)
        return

    from coastline.data.synthetic import make_scene

    rng = np.random.default_rng(0)  # dataset pinned across archs/seeds
    pairs = [make_scene(rng, args.size) for _ in range(args.n)]
    images = np.stack([p[0] for p in pairs])
    masks = np.stack([(p[1] > 0).astype(np.uint8) for p in pairs])

    for arch in [a.strip() for a in args.archs.split(",") if a.strip()]:
        eval_arch(arch, images, masks, n_train, args.size, args.epochs,
                  args.seed, args.quick)
    aggregate(args.size, args.n, n_train, args.seed, args.quick,
              epochs=args.epochs)


if __name__ == "__main__":
    main()
