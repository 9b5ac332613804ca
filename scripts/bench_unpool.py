"""v5e benchmark: Pallas indexed pool/unpool vs the XLA one-hot
formulation at SegNet's five production shapes (512^2 bf16, batch 8).

Round 1's Mosaic could not lower these kernels; current Mosaic can, so
this decides whether SegNet switches off the XLA formulation. Also
asserts exact on-chip agreement. Writes artifacts/bench_unpool.json.
"""

import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

from coastline.ops.primitives import max_pool_with_indices, max_unpool
from coastline.pallas.unpool import max_pool_with_indices_pallas, max_unpool_pallas
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

OUT = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / "bench_unpool.json"

SHAPES = [  # SegNet encoder stages at 512^2
    (8, 512, 512, 64),
    (8, 256, 256, 128),
    (8, 128, 128, 256),
    (8, 64, 64, 512),
    (8, 32, 32, 512),
]


def main():
    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    results = {}
    for shape in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        key = "x".join(map(str, shape))

        # correctness on-chip (Mosaic cannot lower the unpool's w-axis
        # interleave merge when C < 128 lanes — record and skip)
        v_x, i_x = max_pool_with_indices(x)
        v_p, i_p = max_pool_with_indices_pallas(x)
        assert np.array_equal(np.asarray(v_p), np.asarray(v_x)), shape
        assert np.array_equal(np.asarray(i_p), np.asarray(i_x)), shape
        u_x = max_unpool(v_x, i_x)
        try:
            u_p = max_unpool_pallas(v_p, i_p)
            assert np.array_equal(np.asarray(u_p), np.asarray(u_x)), shape
            unpool_ok = True
        except Exception as e:
            results[key] = {"unpool_pallas": f"unsupported: {str(e)[:80]}"}
            print(key, results[key], file=sys.stderr)
            unpool_ok = False

        def pool_xla(c, xx):
            v, i = max_pool_with_indices(xx * (1.0 + c * 1e-20).astype(xx.dtype))
            return c + v.astype(jnp.float32).mean() + i.sum().astype(jnp.float32) * 0

        def pool_pal(c, xx):
            v, i = max_pool_with_indices_pallas(xx * (1.0 + c * 1e-20).astype(xx.dtype))
            return c + v.astype(jnp.float32).mean() + i.sum().astype(jnp.float32) * 0

        def unpool_xla(c, vv, ii):
            u = max_unpool(vv * (1.0 + c * 1e-20).astype(vv.dtype), ii)
            return c + u.astype(jnp.float32).mean()

        def unpool_pal(c, vv, ii):
            u = max_unpool_pallas(vv * (1.0 + c * 1e-20).astype(vv.dtype), ii)
            return c + u.astype(jnp.float32).mean()

        entry = results.get(key, {})
        entry["pool_xla_ms"] = round(device_loop_seconds(pool_xla, (x,), rtt=rtt) * 1e3, 3)
        entry["pool_pallas_ms"] = round(device_loop_seconds(pool_pal, (x,), rtt=rtt) * 1e3, 3)
        entry["pool_speedup"] = round(entry["pool_xla_ms"] / entry["pool_pallas_ms"], 2)
        entry["unpool_xla_ms"] = round(device_loop_seconds(unpool_xla, (v_x, i_x), rtt=rtt) * 1e3, 3)
        if unpool_ok:
            entry["unpool_pallas_ms"] = round(
                device_loop_seconds(unpool_pal, (v_p, i_p), rtt=rtt) * 1e3, 3)
            entry["unpool_speedup"] = round(
                entry["unpool_xla_ms"] / entry["unpool_pallas_ms"], 2)
        results[key] = entry
        print(key, entry, file=sys.stderr)
    OUT.write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
