"""Inference roofline for RobustUNet eval mode on the real chip.

Pairs measured batch-32/64 throughput with XLA cost-analysis flops/bytes
to place inference on the v5e roofline the same way
scripts/bench_train_decompose.py does for training (docs/TRAIN_ROOFLINE.md).
Also answers whether batch 64 beats the bench.py best (32).
"""

import json
import sys

import jax
import jax.numpy as jnp

from coastline.models.robust_unet import RobustUNet
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt


def main():
    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    model = RobustUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (1, 512, 512, 3), jnp.float32)
    v = model.init({"params": rng, "dropout": rng}, x1)
    params, stats = v["params"], v["batch_stats"]

    def infer(p, s, xx):
        return model.apply({"params": p, "batch_stats": s}, xx, train=False)

    out = {"rtt_ms": round(rtt * 1e3, 1)}
    for B in (32, 64):
        xb = jax.random.normal(rng, (B, 512, 512, 3), jnp.float32)

        def step(c, p, s, xx):
            y = infer(p, s, xx * (1.0 + c * 1e-20))
            return c + y.mean().astype(jnp.float32)

        sec = device_loop_seconds(step, (params, stats, xb), n_loop=20,
                                  trials=3, rtt=rtt)
        entry = {"ms": round(sec * 1e3, 2), "images_per_sec": round(B / sec, 2)}
        try:
            ca = jax.jit(infer).lower(params, stats, xb).compile().cost_analysis()
            gf, gb = float(ca["flops"]) / 1e9, float(ca["bytes accessed"]) / 1e9
            entry.update(
                gflops=round(gf, 1), gbytes=round(gb, 2),
                bw_gbps=round(gb / sec, 1), tflops_per_s=round(gf / sec / 1e3, 1),
                sol_images_per_sec_bw=round(B / (gb / 819.0), 1),
                sol_images_per_sec_mxu=round(B / (gf / 197e3), 1),
            )
        except Exception as e:
            entry["cost_error"] = str(e)[:120]
        out[f"batch{B}"] = entry
        print(f"batch{B}", entry, file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
