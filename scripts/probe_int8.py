"""Probe: does int8 pay on this v5e for the bandwidth-bound inference path?

Three formulations of the RobustUNet hot conv (8,512,512,64)->64 k3 and the
deep conv (8,64,64,512)->512 k3, measured with the dependency-chained
on-device loop (CLAUDE.md: never trust per-call wall timing through the
tunnel):

  bf16      — production today: bf16 in / bf16 weights / bf16 out.
  w8a8      — int8 in / int8 weights, conv accumulates int32
              (preferred_element_type), epilogue rescale + clamp, int8 out.
              MXU int8 peak is 394 TOPS (2x bf16) and HBM traffic halves.
  a8-store  — int8 storage only: int8 in, dequant->bf16 fused into the conv
              read, bf16 weights, requant->int8 fused into the write. Tests
              whether the bandwidth half alone is recoverable when int8
              matmuls don't lower well.

Tiny-shape compiles run first: a failed remote compile wedges the tunnel
for ~50 min (CLAUDE.md), so each novel HLO pattern is probed at (1,8,8,128)
before any production-shape compile is sent.
"""

import json
import sys

import jax
import jax.numpy as jnp
from jax import lax

from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt


def conv_bf16(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_w8a8(xq, wq, sx, sw, b):
    acc = lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw) + b  # per-out-channel scale
    y = jnp.clip(jnp.round(y * 127.0), -127, 127)
    return y.astype(jnp.int8)


def conv_a8store(xq, w, sx, b):
    x = xq.astype(jnp.bfloat16) * jnp.bfloat16(sx)
    y = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = (y + b.astype(jnp.bfloat16)).astype(jnp.float32)
    y = jnp.clip(jnp.round(y * 127.0), -127, 127)
    return y.astype(jnp.int8)


def dep_int8(x, c):
    # carry dependency for int8 inputs: adds a 0 that XLA can't fold away
    return x + (c * 1e-20).astype(jnp.int8)


def dep_f(x, c):
    return x * (1.0 + c * 1e-20).astype(x.dtype)


def bench(name, fn, args, int8_input, rtt, out):
    def step(c, *a):
        first = dep_int8(a[0], c) if int8_input else dep_f(a[0], c)
        y = fn(first, *a[1:])
        return c + y.astype(jnp.float32).mean()

    try:
        sec = device_loop_seconds(step, args, n_loop=20, trials=3, rtt=rtt)
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        gb = float(ca["bytes accessed"]) / 1e9
        gf = float(ca["flops"]) / 1e9
        out[name] = {
            "ms": round(sec * 1e3, 3),
            "gbytes": round(gb, 3),
            "bw_gbps": round(gb / sec, 1),
            "tflops": round(gf / sec / 1e3, 1),
        }
        print(name, out[name], file=sys.stderr)
    except Exception as e:
        out[name] = {"error": str(e)[:300]}
        print(name, "FAILED", str(e)[:200], file=sys.stderr)


def main():
    rng = jax.random.PRNGKey(0)
    out = {"device": str(jax.devices()[0])}

    # --- tiny-shape compile probes (never send a speculative big compile) ---
    for name, mk in [
        ("tiny_w8a8", lambda: conv_w8a8(
            jnp.ones((1, 8, 8, 128), jnp.int8), jnp.ones((3, 3, 128, 128), jnp.int8),
            jnp.float32(0.01), jnp.ones((128,), jnp.float32) * 0.02,
            jnp.zeros((128,), jnp.float32))),
        ("tiny_a8store", lambda: conv_a8store(
            jnp.ones((1, 8, 8, 128), jnp.int8), jnp.ones((3, 3, 128, 128), jnp.bfloat16),
            jnp.float32(0.01), jnp.zeros((128,), jnp.float32))),
    ]:
        try:
            y = jax.jit(mk)()
            y.block_until_ready()
            out[name] = {"ok": True, "dtype": str(y.dtype)}
            print(name, "ok", file=sys.stderr)
        except Exception as e:
            out[name] = {"ok": False, "error": str(e)[:300]}
            print(name, "FAILED", str(e)[:200], file=sys.stderr)
            print(json.dumps(out))
            return

    rtt = measure_dispatch_rtt()
    out["rtt_ms"] = round(rtt * 1e3, 1)
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)

    for tag, (B, H, W, C, K) in {
        "hot_512x64": (8, 512, 512, 64, 64),
        "deep_64x512": (8, 64, 64, 512, 512),
    }.items():
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        xq = jax.random.randint(k1, (B, H, W, C), -127, 128, jnp.int8)
        wq = jax.random.randint(k2, (3, 3, C, K), -127, 128, jnp.int8)
        xb = xq.astype(jnp.bfloat16) * jnp.bfloat16(0.01)
        wb = wq.astype(jnp.bfloat16) * jnp.bfloat16(0.01)
        sw = jnp.full((K,), 0.02, jnp.float32)
        bias = jnp.zeros((K,), jnp.float32)

        bench(f"{tag}_bf16", conv_bf16, (xb, wb), False, rtt, out)
        bench(f"{tag}_w8a8", conv_w8a8, (xq, wq, jnp.float32(0.01), sw, bias),
              True, rtt, out)
        bench(f"{tag}_a8store", conv_a8store, (xq, wb, jnp.float32(0.01), bias),
              True, rtt, out)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
