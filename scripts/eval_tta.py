"""Measure the D4 TTA ensemble on trained RobustUNets, on-chip.

Protocol: the Main_Final synthetic parity setup (512^2, 50 scenes, 40/10
sequential split — the SAME pinned dataset and cached trained checkpoints
as scripts/eval_quant_accuracy.py, so no training happens here). Per seed
it compares plain vs TTA (infer.extract._make_predict_fn's 8-term
flip/transpose group, here applied to the flagship's sigmoid head):

  * IoU on the 10 held-out scenes, clean
  * IoU under input corruption (additive Gaussian pixel noise at two
    sigmas, pinned rng) — the regime where averaging over the symmetry
    group CAN buy robustness (measured seed-dependent: +0.13 IoU on one
    noise-degraded seed, -0.01 on the other); clean IoU is ~0.9996 and
    saturated, where TTA measures neutral-to-slightly-negative
  * device throughput at the extractor batch (img/s, plain vs TTA) —
    the honest cost of the 8 forwards

Writes artifacts/tta_eval.json (worst-seed clean delta as the gate
number, gated by tests/test_infer.py::test_tta_eval_artifact).
"""

import json
import os
import sys
import time

import numpy as np

ART = "artifacts/tta_eval.json"
TRAINED = {0: "artifacts/quant_accuracy/trained.pkl",
           1: "artifacts/quant_accuracy/trained_s1.pkl"}


def main():
    from coastline.utils.platform import enable_compile_cache

    enable_compile_cache()
    import pickle

    import jax
    import jax.numpy as jnp

    from coastline.data.synthetic import make_scene
    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import normalize_images
    from coastline.train.metrics import binary_iou
    from coastline.utils.profiling import (device_loop_seconds,
                                           measure_dispatch_rtt)

    rng = np.random.default_rng(0)  # dataset pinned (same as quant eval)
    size, n, n_train = 512, 50, 40
    pairs = [make_scene(rng, size) for _ in range(n)]
    images = np.stack([p[0] for p in pairs])
    masks = np.stack([(p[1] > 0).astype(np.uint8) for p in pairs])
    val_u8 = images[n_train:]
    val_y = masks[n_train:].astype(bool)

    model = RobustUNet(dtype=jnp.bfloat16)

    def probs_plain(p, s, x):
        return model.apply({"params": p, "batch_stats": s}, x,
                           train=False)[..., 0].astype(jnp.float32)

    def probs_tta(p, s, x):
        def f(xi):
            return model.apply({"params": p, "batch_stats": s}, xi,
                               train=False).astype(jnp.float32)

        acc = f(x)
        for axes in ((1,), (2,), (1, 2)):
            acc = acc + jnp.flip(f(jnp.flip(x, axes)), axes)
        xt = jnp.swapaxes(x, 1, 2)
        acc = acc + jnp.swapaxes(f(xt), 1, 2)
        for axes in ((1,), (2,), (1, 2)):
            acc = acc + jnp.swapaxes(jnp.flip(f(jnp.flip(xt, axes)), axes),
                                     1, 2)
        return acc[..., 0] / 8.0

    fns = {"plain": jax.jit(probs_plain), "tta": jax.jit(probs_tta)}

    noise_rng = np.random.default_rng(7)
    conditions = {"clean": val_u8}
    for sigma in (16, 32):  # uint8-scale additive Gaussian pixel noise
        noisy = val_u8.astype(np.float32) + noise_rng.normal(
            0.0, sigma, val_u8.shape)
        conditions[f"noise{sigma}"] = np.clip(noisy, 0, 255).astype(np.uint8)

    seeds_out = []
    for seed, ckpt in TRAINED.items():
        if not os.path.exists(ckpt):
            print(f"skip seed {seed}: {ckpt} missing", file=sys.stderr)
            continue
        with open(ckpt, "rb") as f:
            v = pickle.load(f)
        p = jax.device_put(v["params"])
        s = jax.device_put(v["batch_stats"])
        row = {"seed": seed}
        for cond, u8 in conditions.items():
            x = normalize_images(jnp.asarray(u8))
            for name, fn in fns.items():
                ious = []
                for i in range(0, x.shape[0], 2):
                    pr = np.asarray(fn(p, s, x[i:i + 2]))
                    for j in range(pr.shape[0]):
                        ious.append(float(binary_iou(pr[j] > .5,
                                                     val_y[i + j])))
                row[f"{cond}_{name}_iou"] = float(np.mean(ious))
            row[f"{cond}_delta"] = (row[f"{cond}_tta_iou"]
                                    - row[f"{cond}_plain_iou"])
            print(f"seed {seed} {cond}: plain {row[f'{cond}_plain_iou']:.5f}"
                  f" tta {row[f'{cond}_tta_iou']:.5f}"
                  f" delta {row[f'{cond}_delta']:+.5f}", file=sys.stderr)
        seeds_out.append(row)

    assert seeds_out, "no trained checkpoints found (run eval_quant_accuracy)"

    # throughput cost at the extractor batch, one seed (cost is weight-free)
    rtt = measure_dispatch_rtt()
    xb = normalize_images(jnp.asarray(val_u8[:8]))
    cost = {}
    for name in ("plain", "tta"):
        def step(c, p_, s_, x_):
            xi = x_ * (1.0 + c * 1e-20).astype(x_.dtype)
            y = fns[name](p_, s_, xi)
            return c + y.mean().astype(jnp.float32)

        sec = device_loop_seconds(step, (p, s, xb), n_loop=10, rtt=rtt)
        cost[f"{name}_images_per_sec_b8"] = 8.0 / sec
        print(f"{name}: {8.0 / sec:.1f} img/s @ B=8", file=sys.stderr)

    out = {
        "protocol": {"size": size, "n": n, "n_train": n_train,
                     "group": "D4 (4 flips + 4 transpose-flips)",
                     "average": "f32 sigmoid probs",
                     "noise": "additive Gaussian on uint8 pixels"},
        "platform": __import__("jax").default_backend(),
        "seeds": seeds_out,
        # worst-seed gate: TTA must not lose on clean data
        "clean_delta_worst": min(r["clean_delta"] for r in seeds_out),
        "noise16_delta_worst": min(r["noise16_delta"] for r in seeds_out),
        "noise32_delta_worst": min(r["noise32_delta"] for r in seeds_out),
        "cost": cost,
        "tta_cost_factor": cost["plain_images_per_sec_b8"]
        / cost["tta_images_per_sec_b8"],
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(ART, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("clean_delta_worst", "noise16_delta_worst",
                       "noise32_delta_worst", "tta_cost_factor")}, indent=2))


if __name__ == "__main__":
    main()
