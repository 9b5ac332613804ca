"""Chipless AOT topology certification — the two remaining production
layouts (extends scripts/aot_topology_compile.py's data=4 x space=2 cert):

  * dp8_train_512: the pure-DP layout (data=8, space=1) of the same 512^2
    batch-8 sharded-dataset train epoch — the most common production mesh
    (VERDICT r4 item 8's topology, certified here at production shape
    with the real TPU compiler, not just the 32^2 virtual-CPU dryrun).
  * int8_serve_b80: the int8 serving graph at its headline batch (B=80)
    sharded over data=8 — docs/QUANT.md names tile/batch 'data' sharding
    THE int8 multi-chip route (the s8 halo-pad XLA bug only bites
    spatial partitioning); this runs the GSPMD partitioner on the real
    production program to certify it.

Writes artifacts/multichip_aot_extra.json. Failed chipless AOT compiles
do not wedge the tunnel (CLAUDE.md).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/aot_topology_extra.py
"""

import json
import pathlib
import sys
import time
import traceback

import numpy as np

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "multichip_aot_extra.json")


def mem_report(compiled):
    out = {}
    try:
        ma = compiled.memory_analysis()
        out["memory_analysis_per_chip"] = {
            "argument_size_gb": round(ma.argument_size_in_bytes / 1e9, 4),
            "output_size_gb": round(ma.output_size_in_bytes / 1e9, 4),
            "temp_size_gb": round(ma.temp_size_in_bytes / 1e9, 4),
            "total_gb": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 1e9, 4),
        }
    except Exception as e:  # noqa: BLE001
        out["memory_analysis_error"] = f"{type(e).__name__}: {e}"
    return out


def compile_dp8_train(mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import (
        TrainConfig, create_train_state, make_train_epoch,
    )

    size, batch, n_samples = 512, 8, 64
    model = RobustUNet(dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=batch, lr=1e-4)
    rep = NamedSharding(mesh, P())
    ds_shard = NamedSharding(mesh, P("data"))
    state_abs = jax.eval_shape(
        lambda: create_train_state(model, cfg, (1, size, size, 3)))
    state_sds = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
        state_abs)
    sds = jax.ShapeDtypeStruct
    nb = n_samples // batch
    epoch = make_train_epoch(model, cfg, mesh=mesh, sharded_dataset=True)
    t0 = time.perf_counter()
    compiled = epoch.lower(
        state_sds,
        sds((n_samples, size, size, 3), jnp.uint8, sharding=ds_shard),
        sds((n_samples, size, size), jnp.uint8, sharding=ds_shard),
        sds((nb, batch), jnp.int32, sharding=rep),
        sds((nb, batch), jnp.float32, sharding=rep),
    ).compile()
    out = {"compile_s": round(time.perf_counter() - t0, 1)}
    out.update(mem_report(compiled))
    return out


def compile_int8_serve(mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coastline.infer import quant
    from coastline.models.robust_unet import RobustUNet

    size, batch = 512, 80
    model = RobustUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, x1))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    folded = quant.fold_robust_unet(variables)
    qp = quant.quantize_folded(folded)
    site_names = quant.calibration_sites(folded, x1)
    scales = {k: 1.0 for k in site_names}

    rep = NamedSharding(mesh, P())
    bshard = NamedSharding(mesh, P("data"))
    qp_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype,
                                       sharding=rep), qp)
    x_sds = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32,
                                 sharding=bshard)
    fn = jax.jit(lambda p, x: quant.int8_forward(p, scales, x),
                 out_shardings=bshard)
    t0 = time.perf_counter()
    compiled = fn.lower(qp_sds, x_sds).compile()
    out = {"compile_s": round(time.perf_counter() - t0, 1)}
    out.update(mem_report(compiled))
    return out


def main():
    sys.path.insert(0, "/root/.axon_site")
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    devs = np.asarray(topo.devices)
    mesh_dp8 = Mesh(devs.reshape(8, 1), ("data", "space"))

    result = {
        "compiler": "real TPU compiler via chipless AOT topology compile "
                    "(v5e:2x4)",
        "jax": jax.__version__,
    }
    for tag, fn, mesh in (
            ("dp8_train_512", compile_dp8_train, mesh_dp8),
            ("int8_serve_b80_dp8", compile_int8_serve, mesh_dp8)):
        try:
            result[tag] = fn(mesh)
            result[tag]["ok"] = True
            print(f"{tag}: COMPILED in {result[tag]['compile_s']}s",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — pin the compiler error
            result[tag] = {"ok": False,
                           "error": f"{type(e).__name__}: {str(e)[:2000]}",
                           "traceback_tail": traceback.format_exc()[-1200:]}
            print(f"{tag} FAILED: {str(e)[:300]}", file=sys.stderr,
                  flush=True)
    result["ok"] = all(result[t].get("ok") for t in
                       ("dp8_train_512", "int8_serve_b80_dp8"))
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({t: result[t].get("ok") for t in
                      ("dp8_train_512", "int8_serve_b80_dp8")}))


if __name__ == "__main__":
    main()
