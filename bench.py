#!/usr/bin/env python
"""Benchmark: Robust U-Net 512x512 on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: single-chip inference throughput (images/sec) for the flagship
Robust U-Net at the reference's 512x512 eval resolution, bfloat16 compute.
vs_baseline compares against the PyTorch-CPU reference implementation
measured in THIS container (baselines/torch_cpu_baseline.json — the
published numbers came from an i7-12700KF, `README.md:20`; this container
has 1 vCPU, so the torch side was measured here for a like-for-like host).

Timing methodology: the transport in this environment does not honor
`block_until_ready` as a true sync, so every measurement chains a scalar
data dependency through all iterations and fetches it to host at the end —
the device cannot skip or overlap-hide any iteration's compute.
"""

import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = pathlib.Path(__file__).resolve().parent

# Persistent compilation cache: heavyweight train-step compiles happen once
# per machine, not once per bench run.
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_seconds_per_call(fn, *args, iters=10, warmup=2):
    """Average s/call with a forced data dependency across iterations."""
    acc = None
    for _ in range(warmup):
        acc = fn(*args)
    _ = float(jnp.asarray(acc).ravel()[0])  # sync warmup

    t0 = time.perf_counter()
    carry = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        out = fn(*args)
        carry = carry + jnp.asarray(out).ravel()[0].astype(jnp.float32)
    _ = float(carry)  # host fetch forces the whole chain
    return (time.perf_counter() - t0) / iters


def main():
    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import (
        TrainConfig, batch_indices, create_train_state, make_train_epoch,
    )

    dev = jax.devices()[0]
    log(f"device: {dev}, platform: {dev.platform}")

    model = RobustUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (1, 512, 512, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x1)
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    infer = jax.jit(
        lambda p, s, x: model.apply({"params": p, "batch_stats": s}, x, train=False)
    )

    # FLOPs (per image) from XLA's cost model, for a speed-of-light reference
    flops_per_img = None
    try:
        lowered = infer.lower(params, batch_stats, x1)
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            flops_per_img = float(cost["flops"])
            log(f"XLA flops/image: {flops_per_img / 1e9:.1f} GF")
    except Exception as e:  # cost analysis is best-effort
        log("cost_analysis unavailable:", e)

    # Batch-1 latency (the predict_coastline per-tile path)
    lat = chained_seconds_per_call(infer, params, batch_stats, x1, iters=5)
    p50_ms = lat * 1e3
    log(f"batch-1 latency (chained avg): {p50_ms:.2f}ms")

    # Throughput at batch 8
    B = 8
    xb = jax.random.normal(rng, (B, 512, 512, 3), jnp.float32)
    sec = chained_seconds_per_call(infer, params, batch_stats, xb, iters=5)
    infer_ips = B / sec
    log(f"batch-{B} inference: {infer_ips:.1f} images/sec")
    if flops_per_img:
        log(f"achieved: {flops_per_img * infer_ips / 1e12:.1f} TFLOP/s")

    # Train-step throughput (batch 8, BCE, full Adam update)
    cfg = TrainConfig(batch_size=B, lr=1e-4)
    state = create_train_state(model, cfg, (1, 512, 512, 3))
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 512, 512, 3), dtype=np.uint8)
    )
    masks = jnp.asarray(
        np.random.default_rng(1).integers(0, 2, (B, 512, 512), dtype=np.uint8)
    )
    idx, valid = batch_indices(B, B, shuffle=False, rng=np.random.default_rng(0))
    idx, valid = jnp.asarray(idx), jnp.asarray(valid)
    epoch = make_train_epoch(model, cfg)

    state, loss = epoch(state, images, masks, idx, valid)  # compile + warmup
    _ = float(loss)
    iters = 3
    t0 = time.perf_counter()
    carry = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        state, loss = epoch(state, images, masks, idx, valid)
        carry = carry + loss
    _ = float(carry)
    train_ips = B / ((time.perf_counter() - t0) / iters)
    log(f"train step: {train_ips:.2f} images/sec")

    baseline_path = REPO / "baselines" / "torch_cpu_baseline.json"
    vs = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        vs = infer_ips / base["robust_unet_infer_images_per_sec"]

    out = {
        "metric": "robust_unet_512_bf16_infer_images_per_sec_per_chip",
        "value": round(infer_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 1) if vs else None,
        "p50_tile_latency_ms": round(p50_ms, 2),
        "train_images_per_sec_per_chip": round(train_ips, 2),
        "platform": dev.platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
