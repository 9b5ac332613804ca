"""Export a coastline checkpoint as a reference-compatible torch ``.pth``.

The reference ecosystem consumes ``best_water_segmentation_model.pth`` —
a torch state_dict of the 2-class U-Net saved by
``train_water_segmentation.py:597-606`` and loaded by
``predict_coastline.py``. This CLI converts a coastline Orbax checkpoint
(as written by ``coastline.cli.train`` / ``WaterSegmentationTrainer``)
into exactly that file, so a coastline-trained model drops back into the
reference GUI/CLI — or any torch serving stack — unchanged.

    python -m coastline.cli.export --checkpoint-dir ./models \
        --out best_water_segmentation_model.pth

Any of the 12 reference architectures exports via ``--arch`` when the
checkpoint holds that model's variables (round-trip bit-exactness per
architecture is pinned in tests/test_torch_import.py).
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint-dir", required=True,
                   help="Orbax checkpoint dir written by coastline.cli.train")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--arch", default="unet",
                   help="architecture in the checkpoint (registry name/alias)")
    p.add_argument("--image-size", type=int, default=512)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from coastline.models import create_model
    from coastline.train.checkpoint import CheckpointManager
    from coastline.utils.torch_import import save_reference_pth

    # The production trainer checkpoints the 2-class UNet; other archs come
    # from Evaluator-style checkpoints holding the same {params, batch_stats}
    # payload. The restore template is built abstractly (eval_shape) so no
    # forward pass compiles just to export.
    model = create_model(args.arch, **({"n_classes": 2} if args.arch.lower() == "unet" else {}))
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32),
        )
    )
    ckpt = CheckpointManager(args.checkpoint_dir)
    payload = ckpt.restore_best(
        {"params": template["params"], "batch_stats": template["batch_stats"]}
    )
    ckpt.close()
    if payload is None:
        raise SystemExit(f"no best checkpoint under {args.checkpoint_dir}")
    save_reference_pth(payload, args.out, arch=args.arch)
    print(f"exported {args.arch} weights -> {args.out}")


if __name__ == "__main__":
    main()
