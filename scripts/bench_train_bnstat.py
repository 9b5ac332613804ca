"""Train-step BN-statistics cost experiment (VERDICT r3 item 3).

docs/TRAIN_ROOFLINE.md names the one untried lever behind the flat
36 img/s: "BN's train-mode statistics keep a second f32 pass over each
conv output alive". This measures exactly that, on the real chip, by
compiling the production train step twice:

  A. production: BN batch statistics computed + running stats updated
  B. frozen: every BN normalizes with running statistics
     (ops.primitives.set_bn_frozen(True) at trace time) — the stat
     reduction passes, the running-stat updates, AND the batch-stat
     terms of BN backward all disappear from the graph; everything else
     (dropout, loss, Adam, donation) is identical.

The A-B delta is an upper bound on what ANY fused/cheaper stat scheme
could recover (a real scheme still needs >= 1 read for the stats).
Cost-analysis bytes for both compiles quantify the traffic delta
independently of wall time. Writes artifacts/train_bnstat.json.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_train_bnstat.py [--cpu --size 64]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

from coastline.utils.platform import apply_platform_override, enable_compile_cache

enable_compile_cache()

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "train_bnstat.json")


def measure_epoch(epoch, state, images, masks, idx, valid, rtt, trials=3):
    # warm/compile; the donated state is consumed each call, so each trial
    # feeds the previous call's returned state (same shapes/placement)
    st, loss = epoch(state, images, masks, idx, valid)
    float(loss)
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        st, loss = epoch(st, images, masks, idx, valid)
        float(loss)
        times.append(time.perf_counter() - t0)
    return min(times) - rtt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-batches", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        import os

        os.environ["COASTLINE_PLATFORM"] = "cpu"
    apply_platform_override()

    import jax
    import jax.numpy as jnp

    from coastline.models.robust_unet import RobustUNet
    from coastline.ops import primitives
    from coastline.train.loop import (
        TrainConfig, create_train_state, make_train_epoch,
    )
    from coastline.utils.profiling import measure_dispatch_rtt

    rtt = 0.0 if args.cpu else measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)

    B, S, NB = args.batch, args.size, args.n_batches
    model = RobustUNet(dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=B)
    host = np.random.default_rng(0)
    images = jnp.asarray(host.integers(0, 255, (B * 2, S, S, 3), dtype=np.uint8))
    masks = jnp.asarray(host.integers(0, 2, (B * 2, S, S), dtype=np.uint8))
    idx = jnp.asarray(host.integers(0, B * 2, (NB, B), dtype=np.int32))
    valid = jnp.ones((NB, B), jnp.float32)

    out = {"batch": B, "size": S, "n_batches": NB,
           "rtt_ms": round(rtt * 1e3, 1),
           "platform": jax.default_backend()}
    for tag, frozen in (("production", False), ("bn_frozen", True)):
        with primitives.bn_frozen(frozen):
            epoch = make_train_epoch(model, cfg)
            state = create_train_state(model, cfg, (1, S, S, 3))
            compiled = epoch.lower(state, images, masks, idx, valid).compile()
            cost = compiled.cost_analysis() or {}
            sec = measure_epoch(epoch, state, images, masks, idx, valid, rtt)
            ips = B * NB / sec
            out[tag] = {
                "sec": sec,
                "images_per_sec": round(ips, 2),
                "cost_gbytes": round((cost.get("bytes accessed") or 0) / 1e9, 2),
                "cost_gflops": round((cost.get("flops") or 0) / 1e9, 1),
            }
            print(f"{tag}: {ips:.2f} img/s, "
                  f"{out[tag]['cost_gbytes']} GB, "
                  f"{out[tag]['cost_gflops']} GF", file=sys.stderr)

    a, b = out["production"], out["bn_frozen"]
    out["stat_pass_pct_bytes"] = round(
        100 * (a["cost_gbytes"] - b["cost_gbytes"]) / max(a["cost_gbytes"], 1e-9), 2)
    out["stat_pass_pct_time"] = round(
        100 * (a["sec"] - b["sec"]) / max(a["sec"], 1e-9), 2)
    out["speedup_if_free"] = round(b["images_per_sec"] / a["images_per_sec"], 3)
    print(f"BN stat machinery: {out['stat_pass_pct_bytes']}% of step bytes, "
          f"{out['stat_pass_pct_time']}% of step time "
          f"(x{out['speedup_if_free']} if free)", file=sys.stderr)

    OUT.parent.mkdir(exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
