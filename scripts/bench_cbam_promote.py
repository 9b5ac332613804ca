"""Promotion gate for the fused CBAM tail: end-to-end RobustUNet numbers.

Measures eval-mode RobustUNet throughput on the real chip with the
module path vs the Pallas fused tail (COASTLINE_PALLAS_CBAM), asserts
full-model output parity between the two, and records the verdict in
artifacts/bench_cbam.json — the same promotion protocol the dilation
kernel went through (win -> default-on; loss -> committed negative
result). VERDICT r2 item 4.

Usage: PYTHONPATH=... python scripts/bench_cbam_promote.py [--batch 32]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("COASTLINE_PALLAS_CBAM", "1")  # before coastline import

import jax
import jax.numpy as jnp
import numpy as np

from coastline.models.robust_unet import RobustUNet
from coastline.utils.platform import enable_compile_cache
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt


def main(argv=None):
    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args(argv)

    assert os.environ.get("COASTLINE_PALLAS_CBAM") not in ("0", "", "false")
    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)

    model = RobustUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (1, args.size, args.size, 3), jnp.float32)
    v = model.init({"params": rng, "dropout": rng}, x1)
    params, stats = v["params"], v["batch_stats"]
    xb = jax.random.normal(rng, (args.batch, args.size, args.size, 3), jnp.float32)

    def infer_fused(p_, s_, xx):
        return model.apply({"params": p_, "batch_stats": s_}, xx, train=False)

    def infer_module(p_, s_, xx):
        os.environ["COASTLINE_PALLAS_CBAM"] = "0"
        try:
            return model.apply({"params": p_, "batch_stats": s_}, xx, train=False)
        finally:
            os.environ["COASTLINE_PALLAS_CBAM"] = "1"

    # full-model parity: same params, both paths, probs must agree to
    # bf16 forward noise
    ref = jax.jit(infer_module)(params, stats, xb[:2])
    got = jax.jit(infer_fused)(params, stats, xb[:2])
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"full-model parity max|dprob| = {err:.5f}", file=sys.stderr)
    assert err < 0.05, err

    def step(kind):
        infer = infer_fused if kind == "fused" else infer_module

        def f(carry, p_, s_, xx):
            y = infer(p_, s_, xx * (1.0 + carry * 1e-20).astype(xx.dtype))
            return carry + y.mean().astype(jnp.float32)

        return f

    sec_mod = device_loop_seconds(step("module"), (params, stats, xb),
                                  n_loop=20, rtt=rtt)
    sec_fused = device_loop_seconds(step("fused"), (params, stats, xb),
                                    n_loop=20, rtt=rtt)
    out = {
        "batch": args.batch,
        "size": args.size,
        "parity_max_abs_dprob": round(err, 5),
        "module_ms": round(sec_mod * 1e3, 2),
        "fused_ms": round(sec_fused * 1e3, 2),
        "module_images_per_sec": round(args.batch / sec_mod, 1),
        "fused_images_per_sec": round(args.batch / sec_fused, 1),
        "speedup": round(sec_mod / sec_fused, 3),
    }
    with open("artifacts/bench_cbam.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
