"""TPU micro-benchmark: Pallas shift-max dilation vs XLA convolution.

Produces the numbers quoted in coastline/pallas/morphology.py's header.
Run on the real chip (no platform override).
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from coastline.infer.morphology import _dilate_jit, elliptical_kernel
from coastline.pallas.morphology import dilate_disk
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt


def main():
    sizes = tuple(int(a) for a in sys.argv[1:]) or (5, 20)
    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    rng = np.random.default_rng(0)
    results = {}
    for size in sizes:
        ker = elliptical_kernel(size)
        kj = jnp.asarray(ker)
        for batch in (1, 8):
            mask = jnp.asarray(
                (rng.random((batch, 512, 512)) < 0.05).astype(np.float32)
            )

            def xla_step(c, m):
                mm = m + c * 1e-20
                if batch == 1:
                    out = _dilate_jit(mm[0], kj, size)[None]
                else:
                    out = jax.vmap(lambda z: _dilate_jit(z, kj, size))(mm)
                return c + out.sum().astype(jnp.float32)

            def pallas_step(c, m):
                out = dilate_disk(m + c * 1e-20, ker)
                return c + out.sum().astype(jnp.float32)

            t_xla = device_loop_seconds(xla_step, (mask,), n_loop=20, rtt=rtt)
            t_pal = device_loop_seconds(pallas_step, (mask,), n_loop=20, rtt=rtt)

            # correctness on-chip
            a = np.asarray(dilate_disk(mask, ker))
            b = np.stack([np.asarray(_dilate_jit(mask[i], kj, size))
                          for i in range(batch)])
            assert np.array_equal(a > 0, b > 0), (size, batch)

            key = f"size{size}_batch{batch}"
            results[key] = {
                "xla_ms": round(t_xla * 1e3, 3),
                "pallas_ms": round(t_pal * 1e3, 3),
                "speedup": round(t_xla / t_pal, 1),
            }
            print(key, results[key], file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
