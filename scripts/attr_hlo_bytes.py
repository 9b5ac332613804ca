"""Per-site HBM byte attribution for the int8 serving graph and the bf16
train step (VERDICT r3 items 2-3: "no per-site byte attribution showing
where the float passes burn it" / "prove the stat pass is <10% of step
bytes").

Method: compile on the TPU backend (programs identical to the round-3
roofline runs, so the remote compiles are cache hits), dump the
POST-OPTIMIZATION HLO, and sum every ENTRY-level output buffer — each one
is a real HBM materialization; fusion interiors never touch HBM. Buffers
group by the jax op_name scope (utils/hlo_bytes.py). Writes
artifacts/hlo_byte_attribution.json.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/attr_hlo_bytes.py [--cpu]
"""

import argparse
import json
import pathlib
import sys

from coastline.utils.platform import apply_platform_override, enable_compile_cache

enable_compile_cache()

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "hlo_byte_attribution.json")


def analyze(tag, compiled, batch, depth=3, top=25):
    from coastline.utils.hlo_bytes import (
        attribute_by_dtype, attribute_by_scope, parameter_bytes,
        parse_entry_buffers,
    )

    hlo = compiled.as_text()
    bufs = parse_entry_buffers(hlo)
    writes = sum(b["bytes"] for b in bufs)
    params = parameter_bytes(hlo)
    cost = compiled.cost_analysis() or {}
    rows = attribute_by_scope(bufs, depth=depth, top=top)
    by_dtype = attribute_by_dtype(bufs)
    rep = {
        "entry_write_bytes": writes,
        "parameter_bytes": params,
        "write_bytes_per_item": writes / batch,
        "cost_bytes_accessed": cost.get("bytes accessed"),
        "cost_flops": cost.get("flops"),
        "by_dtype": by_dtype,
        "top_scopes": [
            {"scope": s, "bytes": b, "mb_per_item": round(b / batch / 2**20, 2),
             "n_buffers": n} for s, b, n in rows],
    }
    print(f"\n=== {tag} (batch {batch}) ===", file=sys.stderr)
    print(f"ENTRY writes {writes / 2**30:.2f} GB | params "
          f"{params / 2**30:.2f} GB | cost bytes "
          f"{(cost.get('bytes accessed') or 0) / 2**30:.2f} GB",
          file=sys.stderr)
    print(f"by dtype: "
          + ", ".join(f"{k}={v / 2**30:.2f}GB" for k, v in
                      sorted(by_dtype.items(), key=lambda kv: -kv[1])),
          file=sys.stderr)
    for r in rep["top_scopes"][:20]:
        print(f"  {r['bytes'] / 2**20:9.1f} MB  x{r['n_buffers']:<3d} "
              f"{r['scope'][:90]}", file=sys.stderr)
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="CPU-backend smoke (fusion differs from TPU; for "
                         "plumbing checks only)")
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--bf16-batch", type=int, default=32,
                    help="bf16 reference compile batch — MUST be a "
                         "known-fit config (bench.py sweeps to 64; 80 "
                         "RESOURCE_EXHAUSTs the chip — round-4 log)")
    ap.add_argument("--train-batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-int8", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import os

        os.environ["COASTLINE_PLATFORM"] = "cpu"
    apply_platform_override()

    import jax
    import jax.numpy as jnp

    from coastline.infer import quant
    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import (
        TrainConfig, create_train_state, make_train_epoch,
    )

    report = {"platform": jax.default_backend(), "size": args.size}
    model = RobustUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    v = model.init({"params": rng, "dropout": rng}, x1)

    if not args.skip_int8:
        folded = quant.fold_robust_unet(v)
        # identical calib recipe to bench_quant_roofline.py: the scales are
        # baked into the jitted graph as constants, so matching them makes
        # these compiles exact .jax_cache hits of the round-3 runs
        calib = jax.random.normal(jax.random.PRNGKey(1),
                                  (2, args.size, args.size, 3), jnp.float32)
        scales = quant.calibrate(folded, calib, batch_size=2)
        qp = quant.quantize_folded(folded)
        int8_fn = jax.jit(lambda p, x: quant.int8_forward(p, scales, x))
        xb = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
        compiled = int8_fn.lower(qp, xb).compile()
        report["int8_infer"] = analyze("int8 inference", compiled, args.batch)

        bf16_fn = jax.jit(lambda p, s, x: model.apply(
            {"params": p, "batch_stats": s}, x, train=False))
        xb16 = jnp.zeros((args.bf16_batch, args.size, args.size, 3),
                         jnp.float32)
        compiled = bf16_fn.lower(v["params"], v["batch_stats"], xb16).compile()
        report["bf16_infer"] = analyze("bf16 inference", compiled,
                                       args.bf16_batch)

    if not args.skip_train:
        B = args.train_batch
        cfg = TrainConfig(batch_size=B)
        state = create_train_state(model, cfg, (1, args.size, args.size, 3))
        epoch = make_train_epoch(model, cfg)
        # idx shape (10, B) matches bench.py's compiled epoch — cache hit
        images = jnp.zeros((B * 2, args.size, args.size, 3), jnp.uint8)
        masks = jnp.zeros((B * 2, args.size, args.size), jnp.uint8)
        idx = jnp.zeros((10, B), jnp.int32)
        valid = jnp.ones((10, B), jnp.float32)
        compiled = epoch.lower(state, images, masks, idx, valid).compile()
        # The epoch is a lax.scan: per-batch traffic lives in the while
        # body, not ENTRY — attribute the largest body too.
        rep = analyze("bf16 train step", compiled, B)
        from coastline.utils.hlo_bytes import attribute_by_scope, largest_body

        body_name, body_bufs = largest_body(compiled.as_text())
        if body_name is not None:
            rep["body_name"] = body_name
            rep["body_write_bytes"] = sum(b["bytes"] for b in body_bufs)
            rep["body_top_scopes"] = [
                {"scope": s, "bytes": b, "n_buffers": n}
                for s, b, n in attribute_by_scope(body_bufs, depth=4, top=30)]
            print(f"scan body {body_name}: "
                  f"{rep['body_write_bytes'] / 2**30:.2f} GB/iteration writes",
                  file=sys.stderr)
        report["bf16_train"] = rep

    OUT.parent.mkdir(exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nwrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
