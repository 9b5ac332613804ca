"""Accuracy gate for the int8 PTQ path, measured on TRAINED models on-chip.

Protocol: the Main_Final synthetic parity setup (512^2, 50 scenes, 40/10
sequential split, 20 epochs, batch 2, lr 1e-4 — `Main_Final.py:862-865`).
Per seed: trains the production bf16 RobustUNet (cached to
artifacts/quant_accuracy/trained_s{seed}.pkl so reruns skip the ~5-15 min
train), calibrates int8 scales on 8 train images, then compares on the 10
held-out scenes:

  * IoU vs ground-truth labels: bf16 path vs int8 path
  * mask-agreement IoU between the two predictions
  * mean |prob| difference

Each seed's result lands in artifacts/quant_accuracy/seed_{N}.json; the
aggregate artifact artifacts/quant_accuracy.json reports the WORST seed
(max iou_drop, min agreement) as its top-level gate numbers, so the gate
asserted by tests/test_quant.py::test_quant_accuracy_artifact is
conservative. Run with --seed N to add seeds.
"""

import argparse
import glob
import json
import os
import pickle
import sys
import time

import numpy as np

ART = "artifacts/quant_accuracy.json"
ART_DIR = "artifacts/quant_accuracy"


def get_trained_variables(images, masks, n_train, epochs, batch, lr, seed):
    import jax

    ckpt = os.path.join(ART_DIR, f"trained_s{seed}.pkl")
    legacy = os.path.join(ART_DIR, "trained.pkl")
    if seed == 0 and not os.path.exists(ckpt) and os.path.exists(legacy):
        ckpt = legacy
    if os.path.exists(ckpt):
        with open(ckpt, "rb") as f:
            print(f"using cached trained checkpoint {ckpt}", file=sys.stderr)
            return pickle.load(f)

    import jax.numpy as jnp

    from coastline.data.pipeline import DeviceDataset
    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import Evaluator, TrainConfig

    train_ds = DeviceDataset.from_numpy(images[:n_train], masks[:n_train])
    val_ds = DeviceDataset.from_numpy(images[n_train:], masks[n_train:])
    model = RobustUNet(dtype=jnp.bfloat16)
    cfg = TrainConfig(epochs=epochs, lr=lr, batch_size=batch,
                      eval_batch_size=batch, loss="bce",
                      plateau_on="train", plateau_patience=5, seed=seed)
    ev = Evaluator(model, cfg)
    t0 = time.time()
    tr = ev.train_model(train_ds, val_ds, verbose=True)
    print(f"trained seed {seed}: best_iou={tr['best_iou']:.5f} "
          f"in {time.time() - t0:.0f}s", file=sys.stderr)
    variables = jax.device_get(
        {"params": ev.state.params, "batch_stats": ev.state.batch_stats})
    os.makedirs(ART_DIR, exist_ok=True)
    with open(ckpt, "wb") as f:
        pickle.dump(variables, f)
    return variables


def aggregate():
    seeds = []
    for path in sorted(glob.glob(os.path.join(ART_DIR, "seed_*.json"))):
        with open(path) as f:
            seeds.append(json.load(f))
    assert seeds, "no per-seed results to aggregate"
    out = dict(seeds[0])  # protocol/platform from the first
    out.pop("per_image_bf16", None)
    out.pop("per_image_int8", None)
    out["seeds"] = [{k: s[k] for k in
                     ("seed", "bf16_iou_mean", "int8_iou_mean", "iou_drop",
                      "mask_agreement_iou", "mean_abs_prob_diff")}
                    for s in seeds]
    out["n_seeds"] = len(seeds)
    # conservative gate numbers: the WORST seed
    out["iou_drop"] = max(s["iou_drop"] for s in seeds)
    out["mask_agreement_iou"] = min(s["mask_agreement_iou"] for s in seeds)
    out["mean_abs_prob_diff"] = max(s["mean_abs_prob_diff"] for s in seeds)
    out["bf16_iou_mean"] = float(np.mean([s["bf16_iou_mean"] for s in seeds]))
    out["int8_iou_mean"] = float(np.mean([s["int8_iou_mean"] for s in seeds]))
    with open(ART, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("n_seeds", "bf16_iou_mean", "int8_iou_mean",
                       "iou_drop", "mask_agreement_iou")}, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--aggregate-only", action="store_true")
    args = ap.parse_args()
    if args.aggregate_only:
        aggregate()
        return

    from coastline.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from coastline.data.synthetic import make_scene
    from coastline.infer import quant
    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import normalize_images
    from coastline.train.metrics import binary_iou

    rng = np.random.default_rng(0)  # dataset pinned across seeds
    size, n, n_train = 512, 50, 40
    pairs = [make_scene(rng, size) for _ in range(n)]
    images = np.stack([p[0] for p in pairs])
    masks = np.stack([(p[1] > 0).astype(np.uint8) for p in pairs])

    v = get_trained_variables(images, masks, n_train, epochs=20, batch=2,
                              lr=1e-4, seed=args.seed)

    model = RobustUNet(dtype=jnp.bfloat16)
    folded = quant.fold_robust_unet(v)
    calib = normalize_images(jnp.asarray(images[:8]))
    scales = quant.calibrate(folded, calib, batch_size=2)
    qp = quant.quantize_folded(folded)

    bf16_fn = jax.jit(lambda p, s, x: model.apply(
        {"params": p, "batch_stats": s}, x, train=False))
    int8_fn = jax.jit(lambda p, x: quant.int8_forward(p, scales, x))

    val_x = normalize_images(jnp.asarray(images[n_train:]))
    val_y = masks[n_train:].astype(bool)

    ious_bf16, ious_int8, agree, dprob = [], [], [], []
    for i in range(0, n - n_train, 2):
        xb = val_x[i:i + 2]
        pb = np.asarray(bf16_fn(v["params"], v["batch_stats"], xb))[..., 0]
        pq = np.asarray(int8_fn(qp, xb))[..., 0]
        for j in range(xb.shape[0]):
            y = val_y[i + j]
            ious_bf16.append(float(binary_iou(pb[j] > .5, y)))
            ious_int8.append(float(binary_iou(pq[j] > .5, y)))
            agree.append(float(binary_iou(pq[j] > .5, pb[j] > .5)))
            dprob.append(float(np.abs(pb[j] - pq[j]).mean()))

    out = {
        "protocol": {"size": size, "n": n, "n_train": n_train, "epochs": 20,
                     "batch": 2, "lr": 1e-4, "calib_images": 8,
                     "weight_quant": "per-channel symmetric int8",
                     "act_quant": "per-tensor symmetric int8 (absmax)"},
        "platform": jax.default_backend(),
        "seed": args.seed,
        "bf16_iou_mean": float(np.mean(ious_bf16)),
        "int8_iou_mean": float(np.mean(ious_int8)),
        "iou_drop": float(np.mean(ious_bf16) - np.mean(ious_int8)),
        "mask_agreement_iou": float(np.mean(agree)),
        "mean_abs_prob_diff": float(np.mean(dprob)),
        "per_image_bf16": ious_bf16,
        "per_image_int8": ious_int8,
    }
    os.makedirs(ART_DIR, exist_ok=True)
    with open(os.path.join(ART_DIR, f"seed_{args.seed}.json"), "w") as f:
        json.dump(out, f, indent=2)
    aggregate()


if __name__ == "__main__":
    main()
