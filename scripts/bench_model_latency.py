"""Regenerate baselines/tpu_model_latency.json: all 12 models on the real
chip, batch-8 bf16 inference, adaptive dependency-chained device loops
(utils.profiling — no 0.00 ms artifacts possible).
"""

import json
import pathlib
import sys

import jax
import jax.numpy as jnp

from coastline.models.registry import available_models, create_model
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

OUT = pathlib.Path(__file__).resolve().parents[1] / "baselines" / "tpu_model_latency.json"


def main():
    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 512, 512, 3), jnp.float32)
    table = {}
    for name in available_models():
        model = create_model(name, dtype=jnp.bfloat16)
        v = model.init({"params": rng, "dropout": rng}, x[:1])
        params = v["params"]
        stats = v.get("batch_stats", {})

        def step(c, p, s, xx):
            xi = xx * (1.0 + c * 1e-20)
            y = model.apply({"params": p, "batch_stats": s}, xi, train=False)
            return c + y.mean().astype(jnp.float32)

        sec = device_loop_seconds(step, (params, stats, x), n_loop=20,
                                  trials=3, rtt=rtt)
        table[name] = {
            "images_per_sec_b8": round(8.0 / sec, 1),
            "ms_per_image": round(sec / 8.0 * 1e3, 3),
        }
        print(name, table[name], file=sys.stderr)
    n_models = len(table)
    table["_meta"] = {
        "config": "512x512 bf16 batch 8, one v5e chip, adaptive on-device loop timing"
    }
    OUT.write_text(json.dumps(table, indent=2) + "\n")
    print(json.dumps({"written": str(OUT), "models": n_models}))


if __name__ == "__main__":
    main()
