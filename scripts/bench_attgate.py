"""Measure the AttentionGate eval path against its bandwidth ideal.

Companion to scripts/bench_epilogue.py (which covers the CBAM residual
tail): RobustUNet's decoder applies four attention gates
(`coastline/ops/blocks.py` AttentionGate, parity
`/root/reference/Main_Final.py:120-148`):

    psi = sigmoid(BN(1x1(relu(BN(1x1 g) + BN(1x1 x))))); out = x * psi

The 1x1 convs are MXU matmuls whose BN epilogues XLA fuses; the open
question is how many extra passes the add/relu/sigmoid/mul glue costs.
Minimum traffic (F_int = C/2): read g + read x for the two 1x1 convs
(2 big passes) + write/read the two (B,H,W,C/2) intermediates if not
fused (<= 2 passes equivalent) + read x again for the final gate multiply
+ write out (2 passes). Records measured vs ideal; a fused kernel is only
worth attempting if the gap is material (the CBAM tail's was 4x).

Writes artifacts/bench_attgate.json (per-shape incremental).
"""

import json
import sys

import jax
import jax.numpy as jnp

from coastline.ops.blocks import AttentionGate
from coastline.utils.platform import enable_compile_cache
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

HBM_GBPS = 819.0

# decoder gate call sites: (B, H, W, C_g==C_x, F_int) — robust_unet.py:92-108
SHAPES = ((8, 512, 512, 64, 32), (8, 256, 256, 128, 64), (8, 128, 128, 256, 128))
ART = "artifacts/bench_attgate.json"


def bench_shape(b, h, w, c, fint, rtt):
    mod = AttentionGate(fint, conv_init="kaiming_out", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    g = jax.random.normal(rng, (b, h, w, c), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c), jnp.bfloat16)
    params = mod.init(rng, g, x)

    def apply(p, gg, xx):
        return mod.apply(p, gg, xx)

    def step(carry, p, gg, xx):
        o = apply(p, gg * (1.0 + carry * 1e-20).astype(gg.dtype), xx)
        return carry + o.mean().astype(jnp.float32)

    sec = device_loop_seconds(step, (params, g, x), n_loop=50, rtt=rtt)
    ca = jax.jit(apply).lower(params, g, x).compile().cost_analysis()
    big = b * h * w * c * 2
    half = b * h * w * fint * 2
    # read g, read x (convs) + x again + write out = 4 big passes; the two
    # F_int intermediates at worst write+read once each
    ideal_bytes = 4 * big + 4 * half
    ideal_s = ideal_bytes / (HBM_GBPS * 1e9)
    gb = float(ca["bytes accessed"]) / 1e9
    return {
        "shape": [b, h, w, c], "f_int": fint,
        "ms": round(sec * 1e3, 3),
        "xla_gbytes": round(gb, 3),
        "sustained_gbps": round(gb / sec, 1),
        "ideal_gbytes": round(ideal_bytes / 1e9, 3),
        "ideal_ms": round(ideal_s * 1e3, 3),
        "efficiency_vs_ideal": round(ideal_s / sec, 3),
        "xla_passes_over_big_tensor": round(float(ca["bytes accessed"]) / big, 2),
    }


def main(argv=None):
    import argparse
    import os

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--redo", action="store_true")
    args = p.parse_args(argv)

    out = {"shapes": []}
    if os.path.exists(ART) and not args.redo:
        out = json.load(open(ART))
    done = {tuple(r["shape"]) for r in out["shapes"]}

    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    out["rtt_ms"] = round(rtt * 1e3, 1)
    for shp in SHAPES:
        if shp[:4] in done:
            continue
        r = bench_shape(*shp, rtt)
        print(json.dumps(r), file=sys.stderr)
        out["shapes"].append(r)
        with open(ART, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
