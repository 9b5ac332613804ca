"""Unified all-model benchmark — `Main_Final.py` + `comne.py` +
`Extended_Baseline_Comparison.py` merged into one flag-driven entry point
(the reference duplicates the whole harness per script; the README's
promised `main.py` never existed — SURVEY.md §2.7).

Per-model epoch defaults match the reference exactly: DeepLabV3+ 25
(`Main_Final.py:862-865`), SegNet 15 / PSPNet 20 / Fast-SCNN 25 / ENet 20
(`comne.py:978-983`), everything else 20.

Usage:
  python -m coastline.cli.bench_all --images-dir D --labels-dir L
  python -m coastline.cli.bench_all --synthetic 20 --models "Robust UNet,SegNet"
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

REFERENCE_EPOCHS = {
    "DeepLabV3+": 25,
    "SegNet": 15,
    "PSPNet": 20,
    "Fast-SCNN": 25,
    "ENet": 20,
}
COMNE_MODELS = ("SegNet", "PSPNet", "Fast-SCNN", "ENet")
# Scheduler wiring differs per source harness: Main_Final/Extended step
# ReduceLROnPlateau on TRAIN loss with patience 5 (`Main_Final.py:555,605`),
# the comne subset steps on VAL loss with patience 3 (`comne.py:654,723`).
PROTOCOLS = {"main": ("train", 5), "comne": ("val", 3)}


def model_train_config(name, epochs=None, lr=1e-4, batch_size=2, seed=0,
                       protocol="auto"):
    """The exact TrainConfig the unified runner uses for a registry model —
    reproducing whichever reference harness benchmarked it (epochs AND
    scheduler wiring). `protocol` forces 'main'/'comne' for every model."""
    from coastline.train.loop import TrainConfig

    if protocol == "auto":
        protocol = "comne" if name in COMNE_MODELS else "main"
    plateau_on, patience = PROTOCOLS[protocol]
    return TrainConfig(
        epochs=epochs or REFERENCE_EPOCHS.get(name, 20), lr=lr,
        batch_size=batch_size, eval_batch_size=batch_size, loss="bce",
        plateau_on=plateau_on, plateau_patience=patience, seed=seed,
    )
DEFAULT_BENCH_MODELS = [
    "Robust UNet", "DeepLabV3+", "YOLO-SEG", "SegNet", "PSPNet", "Fast-SCNN",
    "ENet", "WaterNet", "MSWNet", "HRNet-Water", "SegFormer-Lite",
]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images-dir", default="./labelme_images/converted")
    p.add_argument("--labels-dir", default="./labelme_images/annotations/")
    p.add_argument("--models", default=",".join(DEFAULT_BENCH_MODELS),
                   help="comma-separated registry names")
    p.add_argument("--epochs", type=int, default=None,
                   help="override per-model reference epochs")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic scenes instead of a real dataset")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--error-maps", action="store_true",
                   help="also render per-model error maps (Extended protocol)")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard batches over N devices (0 = single chip)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="tensor-parallel factor carved out of the "
                        "--data-parallel device count (channel-sharded "
                        "params + Adam moments over a 'model' mesh axis)")
    p.add_argument("--sharded-data", action="store_true",
                   help="sample-shard the dataset over the mesh's data axis "
                        "(each chip holds 1/k of the dataset; requires "
                        "--data-parallel and batch divisible by the axis)")
    p.add_argument("--throughput-batch", type=int, default=64,
                   help="also time inference at this batch and add an img/s "
                        "column to the tables (0 = protocol timing only)")
    p.add_argument("--protocol", choices=["auto", "main", "comne"], default="auto",
                   help="scheduler wiring: auto = per-model reference protocol "
                        "(comne four step plateau on val/3, rest train/5)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from coastline.utils.platform import apply_platform_override

    apply_platform_override()

    from coastline.data.pipeline import prepare_datasets
    from coastline.data.synthetic import synthetic_device_dataset
    from coastline.models.registry import create_model
    from coastline.report.comparison import plot_comparison, plot_extended_comparison
    from coastline.report.curves import plot_training_curves
    from coastline.train.loop import Evaluator, TrainConfig
    from coastline.utils.tables import format_results_table

    if args.synthetic:
        n = args.synthetic
        train_ds = synthetic_device_dataset(int(n * 0.8), args.image_size, seed=args.seed)
        val_ds = synthetic_device_dataset(n - int(n * 0.8), args.image_size,
                                          seed=args.seed + 1)
        print(f"synthetic dataset: {len(train_ds)} train / {len(val_ds)} val "
              f"@ {args.image_size}^2")
    else:
        if not (os.path.isdir(args.images_dir) and os.path.isdir(args.labels_dir)):
            print("Dataset directories not found. Please check paths "
                  "(or pass --synthetic N).")
            return 1
        out = prepare_datasets(args.images_dir, args.labels_dir,
                               (args.image_size, args.image_size))
        if out is None:
            print("no image/label pairs found")
            return 1
        train_ds, val_ds = out
        print(f"Found {len(train_ds) + len(val_ds)} valid image-label pairs")

    mesh = None
    if args.data_parallel:
        from coastline.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel, model=args.model_parallel)
        print(f"mesh over {args.data_parallel} devices"
              + (f" (model-parallel x{args.model_parallel})"
                 if args.model_parallel > 1 else ""))

    sharded = False
    if args.sharded_data:
        from coastline.parallel.mesh import data_axis_size, shard_device_dataset
        import numpy as np

        if mesh is None:
            print("--sharded-data requires --data-parallel; ignoring")
        elif args.batch_size % data_axis_size(mesh):
            print(f"--sharded-data needs batch {args.batch_size} divisible "
                  f"by the data axis ({data_axis_size(mesh)}); falling back "
                  f"to a replicated dataset")
        else:
            train_ds = shard_device_dataset(
                mesh, np.asarray(train_ds.images), np.asarray(train_ds.masks),
                train_ds.paths)
            val_ds = shard_device_dataset(
                mesh, np.asarray(val_ds.images), np.asarray(val_ds.masks),
                val_ds.paths)
            sharded = True
            print(f"datasets sample-sharded over {data_axis_size(mesh)} "
                  f"chips (1/{data_axis_size(mesh)} per-chip HBM share)")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    names = [m.strip() for m in args.models.split(",") if m.strip()]
    results, histories, param_counts, predictions = {}, {}, {}, {}

    per_model_config = {}
    for name in names:
        model = create_model(name, dtype=dtype)
        cfg = model_train_config(
            name, epochs=args.epochs, lr=args.lr, batch_size=args.batch_size,
            seed=args.seed, protocol=args.protocol,
        )
        epochs = cfg.epochs
        per_model_config[name] = {
            "epochs": cfg.epochs, "plateau_on": cfg.plateau_on,
            "plateau_patience": cfg.plateau_patience,
        }
        shapes = jax.eval_shape(
            lambda m=model: m.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, args.image_size, args.image_size, 3)),
            )
        )
        param_counts[name] = sum(
            int(jnp.prod(jnp.asarray(x.shape))) for x in jax.tree.leaves(shapes["params"])
        )
        print(f"\n{'=' * 40}\nTraining {name}... "
              f"({param_counts[name]:,} params, {epochs} epochs)")
        ev = Evaluator(model, cfg, mesh=mesh, sharded_data=sharded)
        tr = ev.train_model(train_ds, val_ds)
        histories[name] = tr["history"]
        print(f"Best IoU during training: {tr['best_iou']:.4f}")
        res = ev.evaluate_model(val_ds, throughput_batch=args.throughput_batch)
        results[name] = res
        print(f"  IoU: {res['mean_iou']:.4f} ± {res['std_iou']:.3f}")
        print(f"  F1-Score: {res['mean_f1_score']:.4f} ± {res['std_f1_score']:.3f}")
        print(f"  Accuracy: {res['mean_accuracy']:.4f} ± {res['std_accuracy']:.3f}")
        print(f"  Inference Time: {res['avg_inference_time'] * 1000:.2f}ms "
              f"(per image, protocol batch {res['inference_batch_size']})")
        if res.get("throughput_images_per_sec") is not None:
            print(f"  Throughput: {res['throughput_images_per_sec']:.1f} "
                  f"img/s @ batch {res['throughput_batch_size']}")

        if args.error_maps:
            import numpy as np

            x = val_ds.images[:6]
            from coastline.train.loop import normalize_images

            probs = model.apply(
                {"params": ev.state.params, "batch_stats": ev.state.batch_stats},
                normalize_images(x), train=False,
            )
            predictions[name] = np.asarray(probs[..., 0])

    os.makedirs(args.out_dir, exist_ok=True)
    plot_training_curves(histories, os.path.join(args.out_dir, "training_curves.png"))
    plot_comparison(results, os.path.join(args.out_dir, "coastal_comparison.png"))
    plot_extended_comparison(results, os.path.join(args.out_dir, "extended_comparison.png"))
    # The comne script family emits its own artifact names for the
    # remote-sensing model subset (`/root/reference/comne.py:815-925`):
    comne_results = {k: v for k, v in results.items() if k in COMNE_MODELS}
    if comne_results:
        plot_training_curves(
            {k: v for k, v in histories.items() if k in COMNE_MODELS},
            os.path.join(args.out_dir, "training_curves_rs.png"),
        )
        plot_comparison(comne_results, os.path.join(args.out_dir, "rs_comparison.png"))
    if args.error_maps and predictions:
        import numpy as np

        from coastline.report.error_maps import generate_error_maps

        generate_error_maps(
            np.asarray(val_ds.images[:6]), np.asarray(val_ds.masks[:6]),
            predictions, os.path.join(args.out_dir, "error_maps"),
        )

    print("\n" + format_results_table(results, param_counts))
    with open(os.path.join(args.out_dir, "benchmark_results.json"), "w") as f:
        json.dump(
            {
                "config": {**vars(args), "per_model": per_model_config,
                           "inference_time_batch_size": args.batch_size},
                "results": results,
                "param_counts": param_counts,
                "histories": histories,
            },
            f, indent=2,
        )
    print(f"\nartifacts written to {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
