"""End-to-end throughput of the int8 PTQ RobustUNet vs the bf16 production
path on the real chip (one v5e, 512^2, the bench.py protocol).

Mock scales (calibrated on random data) are fine for timing — the graph is
identical regardless of scale values. Accuracy is gated separately
(tests/test_quant.py + scripts/eval_quant_accuracy.py).
"""

import json
import sys

from coastline.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from coastline.infer import quant
from coastline.models.robust_unet import RobustUNet
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt


def main():
    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    model = RobustUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (1, 512, 512, 3), jnp.float32)
    v = model.init({"params": rng, "dropout": rng}, x1)

    folded = quant.fold_robust_unet(v)
    calib = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 512, 3),
                              jnp.float32)
    scales = quant.calibrate(folded, calib, batch_size=2)
    qp = quant.quantize_folded(folded)

    out = {"rtt_ms": round(rtt * 1e3, 1)}
    for B in (8, 16, 32, 64):
        xb = jax.random.normal(rng, (B, 512, 512, 3), jnp.float32)

        # production bf16 path
        def bf16_step(c, p, s, xx):
            y = model.apply({"params": p, "batch_stats": s},
                            xx * (1.0 + c * 1e-20), train=False)
            return c + y.mean().astype(jnp.float32)

        sec = device_loop_seconds(
            bf16_step, (v["params"], v["batch_stats"], xb), n_loop=10,
            trials=3, rtt=rtt)
        out[f"bf16_b{B}"] = {"ms": round(sec * 1e3, 2),
                             "images_per_sec": round(B / sec, 2)}
        print(f"bf16_b{B}", out[f"bf16_b{B}"], file=sys.stderr)

        # int8 path
        def int8_step(c, p, xx):
            y = quant.int8_forward(p, scales, xx * (1.0 + c * 1e-20))
            return c + y.mean().astype(jnp.float32)

        sec = device_loop_seconds(int8_step, (qp, xb), n_loop=10,
                                  trials=3, rtt=rtt)
        entry = {"ms": round(sec * 1e3, 2), "images_per_sec": round(B / sec, 2)}
        try:
            ca = (jax.jit(lambda p, xx: quant.int8_forward(p, scales, xx))
                  .lower(qp, xb).compile().cost_analysis())
            entry["gbytes"] = round(float(ca["bytes accessed"]) / 1e9, 2)
            entry["gflops"] = round(float(ca["flops"]) / 1e9, 1)
        except Exception as e:
            entry["cost_error"] = str(e)[:120]
        out[f"int8_b{B}"] = entry
        print(f"int8_b{B}", entry, file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
