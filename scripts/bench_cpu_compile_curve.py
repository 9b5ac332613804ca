"""XLA-CPU compile+run scaling curve for the sharded multi-chip train
epoch (VERDICT r4 weak #1: no intermediate point between the 64^2 virtual
-mesh compiles and the 512^2 compile that blew a 4-hour budget was ever
measured).

For each size, on an 8-virtual-device CPU mesh (data=4 x space=2): lower
+ compile the production sharded-dataset train epoch (RobustUNet bf16,
batch 8) with the XLA-CPU backend, then EXECUTE one epoch — so the graph
family has compile+run evidence at every measured size, and the compile-
time-vs-shape curve contextualizes the 512^2 CPU timeout
(artifacts/multichip_512_smoke.json). The real-compiler certification of
the 512^2 shape itself is artifacts/multichip_512_aot.json (chipless AOT,
995 s) — this curve is about the XLA-CPU backend only.

Writes artifacts/cpu_compile_curve.json.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_cpu_compile_curve.py [--sizes 64,128,256]
"""

import argparse
import json
import os
import pathlib
import sys
import time

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "cpu_compile_curve.json")


def measure(size: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coastline.data.synthetic import synthetic_dataset_arrays
    from coastline.models.robust_unet import RobustUNet
    from coastline.parallel.mesh import (
        make_mesh, replicated, shard_device_dataset, sharded_epoch_indices,
    )
    from coastline.train.loop import (
        TrainConfig, create_train_state, make_train_epoch,
    )

    batch = 8
    mesh = make_mesh(8, space=2)
    model = RobustUNet(dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=batch, lr=1e-4)
    images, masks = synthetic_dataset_arrays(batch * 2, size=size, seed=0)
    ds = shard_device_dataset(mesh, images, masks)
    state = create_train_state(model, cfg, (1, size, size, 3))
    state = jax.device_put(state, replicated(mesh))
    idx, valid = sharded_epoch_indices(mesh, ds, batch, shuffle=False,
                                       rng=np.random.default_rng(0))
    epoch = make_train_epoch(model, cfg, mesh=mesh, sharded_dataset=True)

    t0 = time.perf_counter()
    lowered = epoch.lower(state, ds.images, ds.masks,
                          jnp.asarray(idx), jnp.asarray(valid))
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"  size {size}: compiled in {t_compile:.1f}s, running...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    new_state, loss = compiled(state, ds.images, ds.masks,
                               jnp.asarray(idx), jnp.asarray(valid))
    loss = float(loss)
    t_run = time.perf_counter() - t0
    assert np.isfinite(loss), loss
    return {"size": size, "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1), "run_s": round(t_run, 1),
            "loss": round(loss, 4), "ok": True}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,128,256")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # NO persistent compile cache: the point is the cold compile time
    result = {"mesh": "data=4 x space=2 (8 virtual CPU devices)",
              "program": "RobustUNet bf16 batch-8 sharded-dataset train "
                         "epoch (2 batches)",
              "backend": "XLA:CPU (1 vCPU container)",
              "jax": jax.__version__,
              "note": ("cold compiles — contextualizes the 512^2 XLA-CPU "
                       "4h timeout (multichip_512_smoke.json); the 512^2 "
                       "shape itself is certified by the real TPU "
                       "compiler in 995s (multichip_512_aot.json)"),
              "points": []}
    for s in [int(x) for x in args.sizes.split(",")]:
        print(f"size {s} ...", file=sys.stderr, flush=True)
        try:
            row = measure(s)
        except Exception as e:  # noqa: BLE001
            row = {"size": s, "ok": False,
                   "error": f"{type(e).__name__}: {str(e)[:500]}"}
        result["points"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
        OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result["points"]))


if __name__ == "__main__":
    main()
