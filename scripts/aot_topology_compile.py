"""Chipless AOT compile of the PRODUCTION-SHAPE multi-chip program with the
real TPU compiler (VERDICT r4 item 1).

The 512^2 batch-8 bf16 RobustUNet sharded-dataset train epoch over a
data=4 x space=2 v5e-8 mesh traces in the suite but had never COMPILED
anywhere: the XLA-CPU compile blew a dedicated 4-hour budget on this 1-vCPU
container (artifacts/multichip_512_smoke.json). This takes the one untried
route: `jax.experimental.topologies.get_topology_desc("v5e:2x4")` yields 8
compile-only devices, and `.lower(...).compile()` against that mesh runs
the REAL TPU compiler (through the axon compile service) with no chips
attached — certifying that the GSPMD partitioner completes on the
north-star program shape (BASELINE.json v5e-8) and recording per-chip
memory_analysis. A failed chipless AOT compile does not wedge the tunnel
(CLAUDE.md wedge taxonomy).

Flow: a 64^2 probe of the same program family first (fast; validates the
topology-compile path), then the 512^2 production shape. Writes
artifacts/multichip_512_aot.json either way — on failure the compiler
error is pinned in the artifact.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/aot_topology_compile.py
"""

import json
import pathlib
import sys
import time
import traceback

import numpy as np

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "multichip_512_aot.json")


def build_abstract_state(model, cfg, size):
    """TrainState as ShapeDtypeStructs (no real arrays — the topology has
    no addressable devices), mirroring create_train_state's structure."""
    import jax

    from coastline.train.loop import create_train_state

    return jax.eval_shape(
        lambda: create_train_state(model, cfg, (1, size, size, 3)))


def aot_compile(size, batch, n_samples, mesh, timing):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import TrainConfig, make_train_epoch

    model = RobustUNet(dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=batch, lr=1e-4)

    rep = NamedSharding(mesh, P())
    ds_shard = NamedSharding(mesh, P("data"))

    state_abs = build_abstract_state(model, cfg, size)
    state_sds = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
        state_abs)
    n_batches = n_samples // batch
    sds = jax.ShapeDtypeStruct
    images = sds((n_samples, size, size, 3), jnp.uint8, sharding=ds_shard)
    masks = sds((n_samples, size, size), jnp.uint8, sharding=ds_shard)
    idx = sds((n_batches, batch), jnp.int32, sharding=rep)
    valid = sds((n_batches, batch), jnp.float32, sharding=rep)

    epoch = make_train_epoch(model, cfg, mesh=mesh, sharded_dataset=True)

    t0 = time.perf_counter()
    lowered = epoch.lower(state_sds, images, masks, idx, valid)
    timing["lower_s"] = round(time.perf_counter() - t0, 1)
    print(f"{size}^2: lowered in {timing['lower_s']}s", file=sys.stderr,
          flush=True)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    timing["compile_s"] = round(time.perf_counter() - t0, 1)
    print(f"{size}^2: COMPILED in {timing['compile_s']}s", file=sys.stderr,
          flush=True)

    out = {"compile_s": timing["compile_s"], "lower_s": timing["lower_s"]}
    try:
        ma = compiled.memory_analysis()
        out["memory_analysis_per_chip"] = {
            "argument_size_gb": round(ma.argument_size_in_bytes / 1e9, 4),
            "output_size_gb": round(ma.output_size_in_bytes / 1e9, 4),
            "temp_size_gb": round(ma.temp_size_in_bytes / 1e9, 4),
            "generated_code_size_mb": round(
                ma.generated_code_size_in_bytes / 1e6, 2),
            "total_gb": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 1e9, 4),
        }
    except Exception as e:  # noqa: BLE001 — record, don't fail the cert
        out["memory_analysis_error"] = f"{type(e).__name__}: {e}"
    try:
        ca = compiled.cost_analysis() or {}
        out["cost_flops_g"] = round(float(ca.get("flops", 0)) / 1e9, 1)
    except Exception:
        pass
    # dataset residency: sharded u8 arrays must cost 1/k per chip, where
    # k is the DATA-axis size (4 on the data=4 x space=2 mesh — the space
    # axis shards H, not N)
    ds_global_mb = (n_samples * size * size * 4) / 1e6
    out["dataset_global_mb"] = round(ds_global_mb, 2)
    out["dataset_per_chip_expected_mb"] = round(
        ds_global_mb / int(mesh.shape["data"]), 2)
    return out


def main():
    sys.path.insert(0, "/root/.axon_site")
    import jax
    from jax.experimental import topologies

    result = {
        "program": ("RobustUNet bf16 fwd+bwd+Adam sharded-dataset train "
                    "epoch (train.loop.make_train_epoch sharded_dataset="
                    "True, lax.scan over batches)"),
        "mesh": "data=4 x space=2 over v5e:2x4 topology (compile-only)",
        "compiler": "real TPU compiler via chipless AOT topology compile",
        "jax": jax.__version__,
    }
    topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    devs = np.asarray(topo.devices)
    assert devs.size == 8, devs
    from jax.sharding import Mesh

    mesh = Mesh(devs.reshape(4, 2), ("data", "space"))

    for tag, size, batch, n in (("probe_64", 64, 8, 64),
                                ("production_512", 512, 8, 64)):
        timing = {}
        try:
            result[tag] = aot_compile(size, batch, n, mesh, timing)
            result[tag]["ok"] = True
        except Exception as e:  # noqa: BLE001 — pin the compiler error
            result[tag] = {
                "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:2000]}",
                "traceback_tail": traceback.format_exc()[-1500:],
                **timing,
            }
            print(f"{tag} FAILED: {e}", file=sys.stderr, flush=True)
    result["ok"] = bool(result.get("production_512", {}).get("ok"))
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({k: result[k] for k in ("ok",) if k in result}
                     | {t: result[t].get("ok") for t in
                        ("probe_64", "production_512") if t in result}))


if __name__ == "__main__":
    main()
