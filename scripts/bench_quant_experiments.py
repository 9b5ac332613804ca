"""Int8 serving roofline attack — policy experiments on the real chip
(VERDICT r3 item 2: 265.9 img/s measured vs 488 bytes-SoL; target >=320).

Variants (cumulative where sensible), each guarded by a tiny-shape compile
probe before any 512^2 program reaches the chip (tunnel-wedge rule,
CLAUDE.md):

  r3_baseline     gated_int8=False — the round-3 graph, re-measured
  gated_int8      CBAM gated tensors cross HBM as int8 (new .gated sites)
  min_ch_32       + attention-gate L0 1x1 convs (64->32) take the s8 path
  min_ch_16       + every conv with min(Cin,Cout)>=16

Writes artifacts/quant_experiments.json (appends per-variant, so an
interrupted run resumes) and prints a summary.
"""

import argparse
import json
import pathlib
import sys

from coastline.utils.platform import apply_platform_override, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "quant_experiments.json")

VARIANTS = {
    # round-3 graph re-measured (policies pinned to what actually ran)
    "r3_baseline": {"gated_int8": False, "split_cat": False},
    # measured NEGATIVE: requant of the CBAM gated tensor adds a pass
    "gated_int8": {"gated_int8": True, "split_cat": False},
    "min_ch_32": {"gated_int8": True, "split_cat": False, "conv_min_ch": 32},
    "min_ch_16": {"gated_int8": True, "split_cat": False, "conv_min_ch": 16},
    # round-4: decoder concats split into per-operand s8 convs
    "split_cat": {"gated_int8": False, "split_cat": True},
    "split_cat_min32": {"gated_int8": False, "split_cat": True,
                        "conv_min_ch": 32},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--batches", default="64,80")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()
    if args.cpu:
        import os

        os.environ["COASTLINE_PLATFORM"] = "cpu"
    apply_platform_override()  # honor COASTLINE_PLATFORM with or without --cpu

    from coastline.infer import quant
    from coastline.models.robust_unet import RobustUNet
    from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

    rtt = 0.0 if args.cpu else measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)

    model = RobustUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (1, args.size, args.size, 3), jnp.float32)
    v = model.init({"params": rng, "dropout": rng}, x1)
    folded = quant.fold_robust_unet(v)
    calib = jax.random.normal(jax.random.PRNGKey(1),
                              (2, args.size, args.size, 3), jnp.float32)
    scales = quant.calibrate(folded, calib, batch_size=2)
    qp = jax.device_put(quant.quantize_folded(folded))

    out = {}
    if OUT.exists():
        out = json.loads(OUT.read_text())
    out["rtt_ms"] = round(rtt * 1e3, 1)
    out["size"] = args.size

    batches = [int(b) for b in args.batches.split(",")]
    for name in [s.strip() for s in args.variants.split(",") if s.strip()]:
        policy = VARIANTS[name]
        entry = out.get(name, {})

        def step(c, p, xx, policy=policy):
            y = quant.int8_forward(p, scales, xx * (1.0 + c * 1e-20),
                                   policy=policy)
            return c + y.mean().astype(jnp.float32)

        fn = jax.jit(lambda p, xx, policy=policy: quant.int8_forward(
            p, scales, xx, policy=policy))

        # tiny-shape probe: validate the novel HLO pattern off-chip-scale
        st = quant.calibrate(folded, jax.random.normal(
            jax.random.PRNGKey(2), (2, 64, 64, 3), jnp.float32), batch_size=2)
        jax.jit(lambda p, xx: quant.int8_forward(p, st, xx, policy=policy))(
            qp, jax.random.normal(rng, (2, 64, 64, 3), jnp.float32)
        ).block_until_ready()
        print(f"{name}: tiny-shape compile OK", file=sys.stderr)

        for B in batches:
            key = f"batch{B}"
            if key in entry:
                continue
            xb = jax.random.normal(rng, (B, args.size, args.size, 3),
                                   jnp.float32)
            compiled = fn.lower(qp, xb).compile()
            ma = compiled.memory_analysis()
            tot = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                   + ma.output_size_in_bytes) / 1e9
            if tot > 14.0:
                entry[key] = {"skipped": f"{tot:.1f} GB > 14 GB HBM guard"}
                print(f"{name} B={B}: skipped ({tot:.1f} GB)", file=sys.stderr)
                continue
            ca = compiled.cost_analysis() or {}
            sec = device_loop_seconds(step, (qp, xb), n_loop=20, trials=3,
                                      rtt=rtt)
            gb = float(ca.get("bytes accessed", 0)) / 1e9
            entry[key] = {
                "ms": round(sec * 1e3, 2),
                "images_per_sec": round(B / sec, 2),
                "gbytes": round(gb, 2),
                "gbytes_per_image": round(gb / B, 3),
                "bw_gbps": round(gb / sec, 1),
                "pct_hbm_peak": round(100 * gb / sec / 819.0, 1),
                "hbm_gb": round(tot, 2),
            }
            print(f"{name} B={B}: {entry[key]['images_per_sec']} img/s "
                  f"({entry[key]['gbytes_per_image']} GB/img, "
                  f"{entry[key]['pct_hbm_peak']}% peak)", file=sys.stderr)
            out[name] = entry
            OUT.parent.mkdir(exist_ok=True)
            OUT.write_text(json.dumps(out, indent=2))
        out[name] = entry
    OUT.write_text(json.dumps(out, indent=2))
    print(json.dumps({k: {b: e.get("images_per_sec")
                          for b, e in v.items() if isinstance(e, dict)}
                      for k, v in out.items() if k in VARIANTS}, indent=2))


if __name__ == "__main__":
    main()
