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

Timing methodology: this environment reaches the TPU through a tunnel whose
per-call RTT (~25ms) and completion signaling are unreliable, so every
measurement loops the computation N times INSIDE one jitted lax.scan with a
scalar data dependency between iterations (no CSE, no overlap tricks), does
one host fetch, and subtracts a separately-measured trivial-dispatch RTT.
"""

import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = pathlib.Path(__file__).resolve().parent

# Persistent compilation cache: heavyweight compiles happen once per machine.
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _require_device():
    """Fail fast (and retryably) if the TPU tunnel is wedged.

    Heavy use or a failed remote compile can wedge this container's TPU
    tunnel for minutes (CLAUDE.md); backend init failure inside jax is
    sticky for the process, so the retry must re-exec. Returns the device
    or raises after printing a clear marker.
    """
    import os
    import subprocess

    # observed wedge duration is ~50 min: 6x10-min backoffs bridge it
    attempts = int(os.environ.get("COASTLINE_BENCH_ATTEMPTS", "6"))
    probe = ("import jax; d=jax.devices(); print(d[0].platform)")
    for i in range(attempts):
        try:
            p = subprocess.run([sys.executable, "-c", probe], timeout=300,
                               capture_output=True, text=True)
            if p.returncode == 0:
                return jax.devices()[0]
            log(f"device probe failed (attempt {i + 1}/{attempts}): "
                f"{p.stderr.strip().splitlines()[-1] if p.stderr else '?'}")
        except subprocess.TimeoutExpired:
            log(f"device probe timed out (attempt {i + 1}/{attempts})")
        if i + 1 < attempts:
            wait = 600
            log(f"tunnel unavailable; backing off {wait}s")
            time.sleep(wait)
    return jax.devices()[0]  # raise the real error in-process


def main():
    from coastline.models.robust_unet import RobustUNet
    from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt
    from coastline.train.loop import (
        TrainConfig, create_train_state, make_train_epoch,
    )

    dev = _require_device()
    log(f"device: {dev}, platform: {dev.platform}")
    rtt = measure_dispatch_rtt()
    log(f"dispatch RTT: {rtt * 1000:.1f} ms")

    model = RobustUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (1, 512, 512, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x1)
    params, batch_stats = variables["params"], variables["batch_stats"]

    # FLOPs from XLA's cost model for a speed-of-light reference
    flops_per_img = None
    try:
        infer1 = jax.jit(
            lambda p, s, x: model.apply({"params": p, "batch_stats": s}, x, train=False)
        )
        cost = infer1.lower(params, batch_stats, x1).compile().cost_analysis()
        if cost and "flops" in cost:
            flops_per_img = float(cost["flops"])
            log(f"XLA flops/image: {flops_per_img / 1e9:.1f} GF")
    except Exception as e:
        log("cost_analysis unavailable:", e)

    def infer_step(c, p, s, x):
        xi = x * (1.0 + c * 1e-20)  # defeat CSE across loop iterations
        y = model.apply({"params": p, "batch_stats": s}, xi, train=False)
        return c + y.mean().astype(jnp.float32)

    # Batch-1 latency (the predict_coastline per-tile path)
    lat = device_loop_seconds(infer_step, (params, batch_stats, x1), n_loop=20, rtt=rtt)
    p50_ms = lat * 1e3
    log(f"single-tile latency: {p50_ms:.2f} ms")

    best_ips, best_b = 0.0, 1
    for B in (8, 16, 32, 64):
        xb = jax.random.normal(rng, (B, 512, 512, 3), jnp.float32)
        sec = device_loop_seconds(infer_step, (params, batch_stats, xb), n_loop=20, rtt=rtt)
        ips = B / sec
        log(f"batch-{B} inference: {ips:.1f} images/sec")
        if ips > best_ips:
            best_ips, best_b = ips, B
    if flops_per_img:
        log(f"achieved: {flops_per_img * best_ips / 1e12:.1f} TFLOP/s")

    # Int8 PTQ path (coastline/infer/quant.py): the deployment speed mode.
    # Headline-eligible only when the committed trained-model accuracy
    # artifact passes its gates (iou_drop <= 0.002, agreement >= 0.995).
    int8_ips, int8_b, int8_p50_ms = 0.0, None, None
    try:
        from coastline.infer import quant

        folded = quant.fold_robust_unet(variables)
        calib = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 512, 3),
                                  jnp.float32)
        scales = quant.calibrate(folded, calib, batch_size=2)
        qp = jax.device_put(quant.quantize_folded(folded))

        def int8_step(c, p, x):
            y = quant.int8_forward(p, scales, x * (1.0 + c * 1e-20))
            return c + y.mean().astype(jnp.float32)

        int8_fn = jax.jit(lambda p, x: quant.int8_forward(p, scales, x))
        # int8 single-tile latency beside the bf16 one: the headline metric
        # is int8, so the parsed line must carry its own p50 (VERDICT r4)
        lat_q = device_loop_seconds(int8_step, (qp, x1), n_loop=20, rtt=rtt)
        int8_p50_ms = lat_q * 1e3
        log(f"int8 single-tile latency: {int8_p50_ms:.2f} ms")
        for B in (8, 16, 32, 48, 64, 80):
            xb = jax.random.normal(rng, (B, 512, 512, 3), jnp.float32)
            if B >= 48:  # HBM guard: never launch a program that can't fit
                ma = int8_fn.lower(qp, xb).compile().memory_analysis()
                tot = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                       + ma.output_size_in_bytes) / 1e9
                if tot > 14.0:
                    log(f"batch-{B} int8 skipped: {tot:.1f} GB")
                    continue
            sec = device_loop_seconds(int8_step, (qp, xb), n_loop=20, rtt=rtt)
            ips = B / sec
            log(f"batch-{B} int8 inference: {ips:.1f} images/sec")
            if ips > int8_ips:
                int8_ips, int8_b = ips, B
    except Exception as e:
        log("int8 path unavailable:", e)

    int8_ok = False
    acc_path = REPO / "artifacts" / "quant_accuracy.json"
    if int8_b is not None and acc_path.exists():
        acc = json.loads(acc_path.read_text())
        int8_ok = (acc.get("iou_drop", 1.0) <= 0.002
                   and acc.get("mask_agreement_iou", 0.0) >= 0.995)
    # Full-zoo trained-weights accuracy gate (12 archs, reference
    # per-model epochs — scripts/eval_quant_accuracy_zoo.py, round 4)
    int8_zoo_ok = False
    zoo_path = REPO / "artifacts" / "quant_accuracy_zoo.json"
    if zoo_path.exists():
        zoo = json.loads(zoo_path.read_text())
        int8_zoo_ok = (bool(zoo.get("all_gated"))
                       and zoo.get("n_archs", 0) >= 12
                       and zoo.get("protocol", {}).get("size") == 512
                       and not zoo.get("quick"))

    # Train-step throughput (batch 8, BCE, full Adam update). The epoch scan
    # already loops on device; give it 10 batches and subtract the RTT.
    B = 8
    n_batches = 10
    cfg = TrainConfig(batch_size=B, lr=1e-4)
    state = create_train_state(model, cfg, (1, 512, 512, 3))
    host = np.random.default_rng(0)
    images = jnp.asarray(host.integers(0, 255, (B * 2, 512, 512, 3), dtype=np.uint8))
    masks = jnp.asarray(host.integers(0, 2, (B * 2, 512, 512), dtype=np.uint8))
    idx = jnp.asarray(host.integers(0, B * 2, (n_batches, B), dtype=np.int32))
    valid = jnp.ones((n_batches, B), jnp.float32)
    epoch = make_train_epoch(model, cfg)

    state, loss = epoch(state, images, masks, idx, valid)
    float(loss)  # compile + warm (donated state consumed; rebuild below)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = epoch(state, images, masks, idx, valid)
        float(loss)
        times.append(time.perf_counter() - t0)
    train_ips = (B * n_batches) / max(1e-9, min(times) - rtt)
    log(f"train: {train_ips:.2f} images/sec")

    headline_int8 = int8_ok and int8_ips > best_ips
    value = int8_ips if headline_int8 else best_ips

    baseline_path = REPO / "baselines" / "torch_cpu_baseline.json"
    vs = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        vs = value / base["robust_unet_infer_images_per_sec"]
    out = {
        "metric": ("robust_unet_512_int8_infer_images_per_sec_per_chip"
                   if headline_int8 else
                   "robust_unet_512_bf16_infer_images_per_sec_per_chip"),
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 1) if vs else None,
        "best_batch": int8_b if headline_int8 else best_b,
        "bf16_images_per_sec": round(best_ips, 2),
        "int8_images_per_sec": round(int8_ips, 2) if int8_b else None,
        "int8_accuracy_gated": int8_ok,
        "int8_zoo_accuracy_gated": int8_zoo_ok,
        "p50_tile_latency_ms": round(p50_ms, 2),
        "int8_p50_tile_latency_ms": (round(int8_p50_ms, 2)
                                     if int8_p50_ms else None),
        "train_images_per_sec_per_chip": round(train_ips, 2),
        "platform": dev.platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
