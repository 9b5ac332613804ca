"""Roofline placement for the int8 PTQ inference path on the real chip.

The bf16 eval graph moves 2.8 GB/image and runs at 57% of HBM peak
(docs/TRAIN_ROOFLINE.md). Int8 activations should halve that traffic —
if the measured 265 img/s (B=80) is far below the int8 bytes-based
speed-of-light, there is recoverable headroom; this script measures
where the int8 graph actually sits (XLA cost-analysis bytes + measured
throughput) and what the residual big-buffer traffic is.
"""

import json
import sys

import jax
import jax.numpy as jnp

from coastline.utils.platform import enable_compile_cache

enable_compile_cache()

from coastline.infer import quant
from coastline.models.robust_unet import RobustUNet
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

HBM_GBPS = 819.0  # v5e
MXU_INT8_TOPS = 394e3  # GOPS


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
    qp = jax.device_put(quant.quantize_folded(folded))

    fn = jax.jit(lambda p, xx: quant.int8_forward(p, scales, xx))

    def step(c, p, xx):
        y = quant.int8_forward(p, scales, xx * (1.0 + c * 1e-20))
        return c + y.mean().astype(jnp.float32)

    out = {"rtt_ms": round(rtt * 1e3, 1)}
    for B in (64, 80):
        xb = jax.random.normal(rng, (B, 512, 512, 3), jnp.float32)
        sec = device_loop_seconds(step, (qp, xb), n_loop=20, trials=3, rtt=rtt)
        entry = {"ms": round(sec * 1e3, 2), "images_per_sec": round(B / sec, 2)}
        try:
            ca = fn.lower(qp, xb).compile().cost_analysis()
            gf = float(ca["flops"]) / 1e9
            gb = float(ca["bytes accessed"]) / 1e9
            entry.update(
                gflops=round(gf, 1), gbytes=round(gb, 2),
                gbytes_per_image=round(gb / B, 3),
                bw_gbps=round(gb / sec, 1),
                pct_hbm_peak=round(100 * gb / sec / HBM_GBPS, 1),
                sol_images_per_sec_bw=round(B / (gb / HBM_GBPS), 1),
            )
        except Exception as e:
            entry["cost_error"] = str(e)[:120]
        out[f"batch{B}"] = entry
        print(f"batch{B}", entry, file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
