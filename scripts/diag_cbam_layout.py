"""Isolate WHY the fused CBAM tail loses at C=64 (artifacts/bench_epilogue.json:
0.76x at (8,512,512,64) vs 1.37x at C=256).

Two competing hypotheses:
  (a) lane padding: XLA/Mosaic pad the minormost dim to 128 lanes, so a
      C=64 tensor moves 2x its logical bytes everywhere — kernels AND
      XLA pay it, and only a packed (W/2, 128) layout streams densely;
  (b) kernel structure: the streaming kernels themselves (scratch
      accumulation, tile shape) are slow and XLA's layout is fine.

Each measurement dependency-chains through a SMALL side input (a (1,1)
scale or the (B,C) gate), so the big tensor is NOT re-materialized per
iteration and the number is the op's own traffic only:

  stage copy   — pure copy kernel GB/s at native C=64 vs packed C=128
                 blocks, vs an XLA identity (x*s) at both layouts.
  stage xla    — XLA's own avg+max reduction pair at both layouts.
  stage kern   — the package kernels: avg_max at native / packed-born
                 input, gated_spatial_stats (unpacked) — each isolated.
  stage probe  — tiny-shape Mosaic AOT probe of the lane-slice group
                 reduce (z[:, :, g*c:(g+1)*c] -> sum/max) that a
                 Mosaic-safe packed gated-stats kernel needs (the
                 reshape-based one fails: 'unsupported shape cast',
                 /tmp/staged_bench3.log 12:10).

GB/s are LOGICAL bytes moved / time; a dense pass sustains ~700 GB/s on
v5e (819 peak), so ~350 GB/s on a C=64 tensor is the padding signature.
Appends one JSON line per measurement to artifacts/diag_cbam_layout.jsonl.
"""

import argparse
import functools
import json
import sys

from coastline.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coastline.pallas.cbam import _pick_tile_h
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

OUT = "artifacts/diag_cbam_layout.jsonl"


def emit(rec):
    rec = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


# --- scaled copy kernel: out = x * s, s tiny so dep-chain rides on it ---


def _copy_kernel(s_ref, x_ref, o_ref):
    # s is f32: Mosaic only supports 32-bit scalar extracts from VMEM
    o_ref[0] = x_ref[0] * s_ref[0, 0].astype(x_ref.dtype)


def scaled_copy(x, s, interpret=False):
    b, h, w, c = x.shape
    th = _pick_tile_h(h, w, c, x.dtype.itemsize)
    return pl.pallas_call(
        _copy_kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(s, x)


# --- scaled avg_max: package kernel + in-register scale on the small input ---


def _avg_max_kernel_s(s_ref, x_ref, avg_ref, max_ref, sum_s, max_s, *, hw):
    h_idx = pl.program_id(1)

    @pl.when(h_idx == 0)
    def _():
        sum_s[:] = jnp.zeros_like(sum_s)
        max_s[:] = jnp.full_like(max_s, -jnp.inf)

    x = (x_ref[0] * s_ref[0, 0].astype(x_ref.dtype)).astype(jnp.float32)
    sum_s[:] = sum_s[:] + jnp.sum(x, axis=0)
    max_s[:] = jnp.maximum(max_s[:], jnp.max(x, axis=0))

    @pl.when(h_idx == pl.num_programs(1) - 1)
    def _():
        avg_ref[0, 0] = (jnp.sum(sum_s[:], axis=0) * (1.0 / hw)).astype(avg_ref.dtype)
        max_ref[0, 0] = jnp.max(max_s[:], axis=0).astype(max_ref.dtype)


def scaled_avg_max(x, s, interpret=False):
    b, h, w, c = x.shape
    th = _pick_tile_h(h, w, c, x.dtype.itemsize)
    avg, mx = pl.pallas_call(
        functools.partial(_avg_max_kernel_s, hw=float(h * w)),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((w, c), jnp.float32),
            pltpu.VMEM((w, c), jnp.float32),
        ],
        interpret=interpret,
    )(s, x)
    return avg[:, 0], mx[:, 0]


def timed(name, f, args, rtt, n_loop, logical_gb, extra=None):
    sec = device_loop_seconds(f, args, n_loop=n_loop, rtt=rtt)
    rec = {"name": name, "ms": sec * 1e3, "logical_gb": logical_gb,
           "gbps": logical_gb / sec}
    if extra:
        rec.update(extra)
    emit(rec)
    return sec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", required=True,
                   choices=["copy", "xla", "kern", "probe"])
    p.add_argument("--loops", type=int, default=30)
    p.add_argument("--interpret", action="store_true",
                   help="CPU interpret-mode correctness pass (no timings)")
    args = p.parse_args(argv)

    key = jax.random.PRNGKey(0)
    if args.interpret:
        # correctness only: tiny shapes, interpret kernels, no timing
        x = jax.random.normal(key, (2, 16, 32, 64), jnp.bfloat16)
        s = jnp.full((1, 1), 1.5, jnp.float32)
        got = scaled_copy(x, s, interpret=True)
        err = float(jnp.max(jnp.abs((got - x * 1.5).astype(jnp.float32))))
        assert err < 0.05, err
        a, m = scaled_avg_max(x, s, interpret=True)
        xf = (x.astype(jnp.float32) * 1.5)
        e2 = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - xf.mean((1, 2))))),
                 float(jnp.max(jnp.abs(m.astype(jnp.float32) - xf.max((1, 2))))))
        assert e2 < 0.02, e2
        run_probe(key, interpret=True)
        print(f"interpret ok: copy err {err:.4f}, avg_max err {e2:.4f}")
        return

    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    nat = jax.random.normal(key, (8, 512, 512, 64), jnp.bfloat16)
    pkd = jax.random.normal(key, (8, 512, 256, 128), jnp.bfloat16)
    gb1 = nat.size * 2 / 1e9  # one logical pass over either view

    def dep(carry):  # tiny carry-dependent scale, f32 (1,1) (Mosaic
        # requires 32-bit scalar extracts; kernels cast after extracting)
        return (1.0 + carry * 1e-20).reshape(1, 1)

    if args.stage == "copy":
        for name, x in [("copy_native_c64", nat), ("copy_packed_c128", pkd)]:
            f = lambda cr, xx: cr + scaled_copy(xx, dep(cr))[0, 0, 0, 0].astype(jnp.float32)
            timed(name, f, (x,), rtt, args.loops, 2 * gb1,
                  {"shape": list(x.shape)})
        for name, x in [("xla_identity_native_c64", nat),
                        ("xla_identity_packed_c128", pkd)]:
            f = lambda cr, xx: cr + (xx * dep(cr)[0, 0].astype(xx.dtype))[0, 0, 0, 0].astype(jnp.float32)
            timed(name, f, (x,), rtt, args.loops, 2 * gb1,
                  {"shape": list(x.shape)})
    elif args.stage == "xla":
        # the ChannelAttention reduction pair as XLA compiles it
        def pair(cr, xx):
            z = xx * dep(cr)[0, 0].astype(xx.dtype)
            a = jnp.mean(z.astype(jnp.float32), axis=(1, 2))
            m = jnp.max(z, axis=(1, 2)).astype(jnp.float32)
            return cr + a.sum() + m.sum()
        for name, x in [("xla_avgmax_native_c64", nat),
                        ("xla_avgmax_packed_c128", pkd)]:
            timed(name, pair, (x,), rtt, args.loops, 2 * gb1,
                  {"shape": list(x.shape), "note": "2 reduce passes if unfused"})
    elif args.stage == "kern":
        for name, x in [("kern_avgmax_native_c64", nat),
                        ("kern_avgmax_packedborn_c128", pkd)]:
            f = lambda cr, xx: cr + sum(
                o.sum().astype(jnp.float32) for o in scaled_avg_max(xx, dep(cr)))
            timed(name, f, (x,), rtt, args.loops, gb1, {"shape": list(x.shape)})
        from coastline.pallas.cbam import gated_spatial_stats
        gate = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(1), (8, 64)))
        def g64(cr, xx, gg):
            gdep = (gg * (1.0 + cr * 1e-20)).astype(jnp.bfloat16)
            return cr + gated_spatial_stats(xx, gdep).sum().astype(jnp.float32)
        # logical traffic: read y once + write (B,2,H,W) = (1 + 2/64) passes
        timed("kern_gatedstats_unpacked_c64", g64, (nat, gate), rtt, args.loops,
              gb1 * (1 + 2 / 64), {"shape": list(nat.shape)})
    elif args.stage == "probe":
        run_probe(key)


def run_probe(key, interpret=False):
    """Tiny-shape Mosaic probe: lane-slice group reduce (the Mosaic-safe
    packed gated-stats formulation). (1,16,64,128) packed = k=2, c=64."""
    c, k = 64, 2

    def _slice_kernel(x_ref, o_ref):
        z = x_ref[0]
        zf = z.astype(jnp.float32)
        for g in range(k):
            zg = zf[:, :, g * c:(g + 1) * c]
            o_ref[0, 0, g] = (jnp.sum(zg, -1) * (1.0 / c)).astype(o_ref.dtype)
            o_ref[0, 1, g] = jnp.max(z[:, :, g * c:(g + 1) * c], -1).astype(o_ref.dtype)

    x = jax.random.normal(key, (1, 16, 64, 128), jnp.bfloat16)
    out = pl.pallas_call(
        _slice_kernel,
        grid=(1, 1),
        in_specs=[pl.BlockSpec((1, 16, 64, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, k, 16, 64), lambda i, j: (i, 0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2, k, 16, 64), jnp.bfloat16),
        interpret=interpret,
    )(x)
    zf = x.astype(jnp.float32)
    # reference: out[0,0,g,i,j] = mean over lanes g*c..(g+1)*c of x[0,i,j,:]
    rm = jnp.stack([zf[0, :, :, g * c:(g + 1) * c].mean(-1) for g in range(k)])
    rx = jnp.stack([zf[0, :, :, g * c:(g + 1) * c].max(-1) for g in range(k)])
    err = max(float(jnp.max(jnp.abs(out[0, 0].astype(jnp.float32) - rm))),
              float(jnp.max(jnp.abs(out[0, 1].astype(jnp.float32) - rx))))
    emit({"name": "probe_lane_slice_group_reduce", "interpret": interpret,
          "max_abs_err": err, "ok": err < 0.02})
    assert err < 0.02, err


if __name__ == "__main__":
    main()
