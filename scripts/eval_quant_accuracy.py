"""Accuracy gate for the int8 PTQ path, measured on a TRAINED model on-chip.

Protocol: the Main_Final synthetic parity setup (512^2, 50 scenes, 40/10
sequential split, 20 epochs, batch 2, lr 1e-4 — `Main_Final.py:862-865`).
Trains the production bf16 RobustUNet (cached to
artifacts/quant_accuracy/trained.npz so reruns skip the ~5-15 min train),
calibrates int8 scales on the train images, then compares on the 10 held-out
scenes:

  * IoU vs ground-truth labels: bf16 path vs int8 path (the gate:
    iou_drop <= 0.002)
  * mask-agreement IoU between the two predictions (gate: >= 0.995)
  * mean |prob| difference

Writes artifacts/quant_accuracy.json (asserted by
tests/test_quant.py::test_quant_accuracy_artifact).
"""

import json
import os
import pickle
import sys
import time

import numpy as np

ART = "artifacts/quant_accuracy.json"
CKPT = "artifacts/quant_accuracy/trained.pkl"


def get_trained_variables(images, masks, n_train, epochs, batch, lr):
    import jax

    if os.path.exists(CKPT):
        with open(CKPT, "rb") as f:
            print("using cached trained checkpoint", file=sys.stderr)
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
                      plateau_on="train", plateau_patience=5, seed=0)
    ev = Evaluator(model, cfg)
    t0 = time.time()
    tr = ev.train_model(train_ds, val_ds, verbose=True)
    print(f"trained: best_iou={tr['best_iou']:.5f} "
          f"in {time.time() - t0:.0f}s", file=sys.stderr)
    variables = jax.device_get(
        {"params": ev.state.params, "batch_stats": ev.state.batch_stats})
    os.makedirs(os.path.dirname(CKPT), exist_ok=True)
    with open(CKPT, "wb") as f:
        pickle.dump(variables, f)
    return variables


def main():
    from coastline.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from coastline.data.synthetic import make_scene
    from coastline.infer import quant
    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import normalize_images
    from coastline.train.metrics import binary_iou

    rng = np.random.default_rng(0)
    size, n, n_train = 512, 50, 40
    pairs = [make_scene(rng, size) for _ in range(n)]
    images = np.stack([p[0] for p in pairs])
    masks = np.stack([(p[1] > 0).astype(np.uint8) for p in pairs])

    v = get_trained_variables(images, masks, n_train, epochs=20, batch=2,
                              lr=1e-4)

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
        "bf16_iou_mean": float(np.mean(ious_bf16)),
        "int8_iou_mean": float(np.mean(ious_int8)),
        "iou_drop": float(np.mean(ious_bf16) - np.mean(ious_int8)),
        "mask_agreement_iou": float(np.mean(agree)),
        "mean_abs_prob_diff": float(np.mean(dprob)),
        "per_image_bf16": ious_bf16,
        "per_image_int8": ious_int8,
    }
    with open(ART, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items()
                      if not k.startswith("per_image")}, indent=2))


if __name__ == "__main__":
    main()
