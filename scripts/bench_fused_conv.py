"""Measure the fused conv3x3+BN+ReLU Mosaic kernel vs XLA's fusion
(VERDICT r4 item 5 — the last untried single-chip lever).

Shape under test: the C=64 full-resolution 3x3 conv+BN+ReLU that
dominates the bf16 RobustUNet graph (B=8, 512^2, bf16).

Safety protocol (CLAUDE.md wedge taxonomy):
  1. interpret-mode parity (tests/test_pallas.py) — done before this runs
  2. CHIPLESS AOT topology compile of the kernel (tiny + full shape):
     runs the full Mosaic pipeline with no chips attached, so a Mosaic
     rejection (lane-concat layout, VMEM OOM) costs nothing — a failed
     ON-CHIP compile would wedge the tunnel ~50 min
  3. only then: real-chip compile, on-chip parity check, timing via the
     dependency-chained device loop

Writes artifacts/bench_fused_conv.json (win or negative — either closes
docs/STATUS.md's "custom fused conv kernels remain the only untried
lever").

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_fused_conv.py
"""

import json
import pathlib
import sys
import time

import numpy as np

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "bench_fused_conv.json")


def xla_ref_fn(model_dtype):
    import jax.numpy as jnp
    from jax import lax

    def f(x, w, scale, bias):
        y = lax.conv_general_dilated(
            x, w.astype(model_dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y * scale + bias, 0).astype(model_dtype)

    return f


def main():
    sys.path.insert(0, "/root/.axon_site")
    import jax
    import jax.numpy as jnp

    from coastline.pallas.fused_conv import fused_conv3x3_bn_relu
    from coastline.utils.profiling import (
        device_loop_seconds, measure_dispatch_rtt,
    )

    result = {"shape": "B=8 512x512 C64->C64 conv3x3+BN+ReLU bf16",
              "kernel": "pallas K=576 patch-packed (pallas/fused_conv.py)"}

    # ---- stage 2: chipless Mosaic validation via topology compile ----
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    tmesh = Mesh(np.asarray(topo.devices)[:1].reshape(1), ("d",))
    rep = NamedSharding(tmesh, P())
    sds = jax.ShapeDtypeStruct
    for tag, (b, h, w) in (("aot_probe_tiny", (1, 16, 128)),
                           ("aot_probe_full", (8, 512, 512))):
        t0 = time.perf_counter()
        try:
            jax.jit(fused_conv3x3_bn_relu).lower(
                sds((b, h, w, 64), jnp.bfloat16, sharding=rep),
                sds((3, 3, 64, 64), jnp.float32, sharding=rep),
                sds((64,), jnp.float32, sharding=rep),
                sds((64,), jnp.float32, sharding=rep),
            ).compile()
            result[tag] = {"ok": True,
                           "compile_s": round(time.perf_counter() - t0, 1)}
            print(f"{tag}: Mosaic OK "
                  f"({result[tag]['compile_s']}s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — the failure IS the result
            result[tag] = {"ok": False,
                           "error": f"{type(e).__name__}: {str(e)[:1500]}"}
            print(f"{tag}: Mosaic REJECTED: {str(e)[:300]}", file=sys.stderr)
            result["outcome"] = (
                "negative: Mosaic rejects the kernel at the "
                f"{tag.replace('aot_probe_', '')} shape (chipless AOT "
                "probe; no tunnel wedge)")
            OUT.write_text(json.dumps(result, indent=1) + "\n")
            print(json.dumps({"ok": False, "stage": tag}))
            return

    # ---- stage 3: real chip — parity then timing ----
    dev = jax.devices()[0]
    result["platform"] = dev.platform
    rtt = measure_dispatch_rtt()
    rng = np.random.default_rng(0)
    B, H, W, C = 8, 512, 512, 64
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)

    ref_f = jax.jit(xla_ref_fn(jnp.bfloat16))
    ker_f = jax.jit(fused_conv3x3_bn_relu)

    ref = np.asarray(ref_f(x, w, scale, bias), np.float32)
    got = np.asarray(ker_f(x, w, scale, bias), np.float32)
    err = np.abs(ref - got)
    result["onchip_max_abs_err"] = float(err.max())
    result["onchip_mean_abs_err"] = float(err.mean())
    print(f"on-chip parity: max {err.max():.4f} mean {err.mean():.2e}",
          file=sys.stderr)
    if err.max() > 0.25:
        result["outcome"] = "negative: on-chip parity failure"
        OUT.write_text(json.dumps(result, indent=1) + "\n")
        print(json.dumps({"ok": False, "stage": "parity"}))
        return

    def step_ref(c, x, w, s, b):
        y = xla_ref_fn(jnp.bfloat16)(x * (1 + c * 1e-20).astype(x.dtype),
                                     w, s, b)
        return c + y.mean().astype(jnp.float32)

    def step_ker(c, x, w, s, b):
        y = fused_conv3x3_bn_relu(x * (1 + c * 1e-20).astype(x.dtype),
                                  w, s, b)
        return c + y.mean().astype(jnp.float32)

    t_ref = device_loop_seconds(step_ref, (x, w, scale, bias), n_loop=30,
                                rtt=rtt)
    t_ker = device_loop_seconds(step_ker, (x, w, scale, bias), n_loop=30,
                                rtt=rtt)
    flops = 2 * B * H * W * 9 * C * C
    result["xla_ms"] = round(t_ref * 1e3, 3)
    result["pallas_ms"] = round(t_ker * 1e3, 3)
    result["speedup"] = round(t_ref / t_ker, 3)
    result["xla_tflops"] = round(flops / t_ref / 1e12, 1)
    result["pallas_tflops"] = round(flops / t_ker / 1e12, 1)
    hbm = B * H * W * C * 2 * 2  # read x + write y, bf16
    result["xla_hbm_gbs_min_traffic"] = round(hbm / t_ref / 1e9, 1)
    result["pallas_hbm_gbs_min_traffic"] = round(hbm / t_ker / 1e9, 1)
    win = result["speedup"] > 1.05
    result["outcome"] = (
        ("WIN: wire behind COASTLINE_PALLAS_CONV" if win else
         "negative: XLA's conv+epilogue fusion is faster at the target "
         "shape — the last untried single-chip lever is now measured"))
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({"ok": True, "speedup": result["speedup"],
                      "xla_ms": result["xla_ms"],
                      "pallas_ms": result["pallas_ms"]}))


if __name__ == "__main__":
    main()
