"""Per-op int8-vs-bf16 timings on the real chip: bisect the end-to-end
int8 slowdown seen by scripts/bench_quant.py (151 ms vs 64 ms at B=8).

Each RobustUNet op class at its production shape, int8 formulation vs the
bf16 one, dependency-chained timing (CLAUDE.md).
"""

import json
import sys

import jax
import jax.numpy as jnp
from jax import lax

from coastline.utils.platform import enable_compile_cache
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

enable_compile_cache()


def dep_i(x, c):
    return x + (c * 1e-20).astype(x.dtype) if x.dtype == jnp.int8 else \
        x * (1.0 + c * 1e-20).astype(x.dtype)


def bench(name, fn, args, rtt, out):
    def step(c, *a):
        y = fn(dep_i(a[0], c), *a[1:])
        return c + y.astype(jnp.float32).mean()

    try:
        sec = device_loop_seconds(step, args, n_loop=20, trials=3, rtt=rtt)
        out[name] = round(sec * 1e3, 3)
        print(name, out[name], "ms", file=sys.stderr)
    except Exception as e:
        out[name] = {"error": str(e)[:200]}
        print(name, "FAILED", str(e)[:160], file=sys.stderr)


def main():
    rng = jax.random.PRNGKey(0)
    rtt = measure_dispatch_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 1)}
    k = jax.random.split(rng, 8)

    def mk(shape, dtype):
        if dtype == jnp.int8:
            return jax.random.randint(k[0], shape, -127, 128, jnp.int8)
        return jax.random.normal(k[1], shape, dtype)

    # ---- tiny compile probes for novel patterns (never speculate big) ----
    tiny_ok = True
    for nm, f in [
        ("tiny_convT_i8", lambda: lax.conv_general_dilated(
            mk((1, 8, 8, 128), jnp.int8), mk((2, 2, 128, 128), jnp.int8),
            (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)),
        ("tiny_requant", lambda: jnp.clip(jnp.round(
            mk((1, 8, 8, 128), jnp.int8).astype(jnp.float32) * 0.01 / 0.02),
            -127, 127).astype(jnp.int8)),
    ]:
        try:
            jax.jit(f)().block_until_ready()
            print(nm, "ok", file=sys.stderr)
        except Exception as e:
            print(nm, "FAILED", str(e)[:160], file=sys.stderr)
            tiny_ok = False
    if not tiny_ok:
        print(json.dumps(out))
        return

    dn = ("NHWC", "HWIO", "NHWC")

    # ---- 1. decoder ConvTranspose k2/s2 (up0: 32^2 C1024 -> 64^2 C512) ----
    for tag, (H, CI, CO) in {"up0": (32, 1024, 512), "up3": (256, 128, 64)}.items():
        xi = mk((8, H, H, CI), jnp.int8)
        wi = mk((2, 2, CI, CO), jnp.int8)
        xb, wb = xi.astype(jnp.bfloat16), wi.astype(jnp.bfloat16)
        bench(f"convT_{tag}_bf16", lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
            dimension_numbers=dn), (xb, wb), rtt, out)
        bench(f"convT_{tag}_w8a8", lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
            dimension_numbers=dn, preferred_element_type=jnp.int32),
            (xi, wi), rtt, out)

    # ---- 2. max pool 2x2/s2 at the big shape ----
    xi = mk((8, 512, 512, 64), jnp.int8)
    xb = xi.astype(jnp.bfloat16)
    bench("pool_bf16", lambda x: lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0),) * 4), (xb,), rtt, out)
    bench("pool_int8", lambda x: lax.reduce_window(
        x, jnp.int8(-128), lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0),) * 4), (xi,), rtt, out)

    # ---- 3. dilated 3x3 at bottleneck (32^2 C512 -> 256, d=4) ----
    xi = mk((8, 32, 32, 512), jnp.int8)
    wi = mk((3, 3, 512, 256), jnp.int8)
    bench("dil4_bf16", lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), ((4, 4), (4, 4)), rhs_dilation=(4, 4),
        dimension_numbers=dn),
        (xi.astype(jnp.bfloat16), wi.astype(jnp.bfloat16)), rtt, out)
    bench("dil4_w8a8", lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), ((4, 4), (4, 4)), rhs_dilation=(4, 4),
        dimension_numbers=dn, preferred_element_type=jnp.int32),
        (xi, wi), rtt, out)

    # ---- 4. 1x1 conv (attention gates, 64^2 C512 -> 256) ----
    xi = mk((8, 64, 64, 512), jnp.int8)
    wi = mk((1, 1, 512, 256), jnp.int8)
    bench("c1x1_bf16", lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn),
        (xi.astype(jnp.bfloat16), wi.astype(jnp.bfloat16)), rtt, out)
    bench("c1x1_w8a8", lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn,
        preferred_element_type=jnp.int32), (xi, wi), rtt, out)

    # ---- 5. pure requant pass at the big shape (int8->f32 math->int8) ----
    xi = mk((8, 512, 512, 64), jnp.int8)
    bench("requant_big", lambda x: jnp.clip(jnp.round(
        x.astype(jnp.float32) * 0.013 / 0.021), -127, 127).astype(jnp.int8),
        (xi,), rtt, out)
    xb = xi.astype(jnp.bfloat16)
    bench("copy_bf16_big", lambda x: x * jnp.bfloat16(1.01), (xb,), rtt, out)

    # ---- 6. the hot 3x3 conv WITH fused requant epilogue, both ways ----
    xi = mk((8, 512, 512, 64), jnp.int8)
    wi = mk((3, 3, 64, 64), jnp.int8)
    sw = jnp.full((64,), 0.02, jnp.float32)
    b = jnp.zeros((64,), jnp.float32)

    def w8a8_requant(x, w):
        acc = lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = jax.nn.relu(acc.astype(jnp.float32) * (0.01 * sw) + b)
        return jnp.clip(jnp.round(y / 0.02), -127, 127).astype(jnp.int8)

    def bf16_relu(x, w):
        y = lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
        return jax.nn.relu(y + b.astype(jnp.bfloat16))

    bench("hotconv_w8a8_requant", w8a8_requant, (xi, wi), rtt, out)
    bench("hotconv_bf16_relu", bf16_relu,
          (xi.astype(jnp.bfloat16), wi.astype(jnp.bfloat16)), rtt, out)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
