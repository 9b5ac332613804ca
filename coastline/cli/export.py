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

``--quantized-out model.npz`` additionally (or instead of ``--out``)
writes the int8 PTQ serving artifact (infer/deploy.py): BN-fold +
calibrate + quantize in one command, servable via the predict CLI's
``--quantized`` / ``CoastlineExtractor.from_quantized`` with no float
checkpoint on the deployment host.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint-dir", required=True,
                   help="Orbax checkpoint dir written by coastline.cli.train")
    p.add_argument("--out", default=None, help="output .pth path")
    p.add_argument("--quantized-out", default=None, metavar="NPZ",
                   help="also write the int8 PTQ serving artifact "
                        "(arch must be in the quant registry)")
    p.add_argument("--calib-images", default=None,
                   help="directory of representative images for activation "
                        "calibration (default: synthetic coastal scenes)")
    p.add_argument("--arch", default="unet",
                   help="architecture in the checkpoint (registry name/alias)")
    p.add_argument("--image-size", type=int, default=512)
    args = p.parse_args(argv)
    if not (args.out or args.quantized_out):
        p.error("pass --out and/or --quantized-out")

    from coastline.utils.platform import apply_platform_override

    apply_platform_override()

    import jax
    import jax.numpy as jnp

    from coastline.models import create_model
    from coastline.train.checkpoint import CheckpointManager
    from coastline.utils.torch_import import save_reference_pth

    # The production trainer checkpoints the 2-class UNet; other archs come
    # from Evaluator-style checkpoints holding the same {params, batch_stats}
    # payload. The restore template is built abstractly (eval_shape) so no
    # forward pass compiles just to export.
    if args.quantized_out:
        # fail fast (before any checkpoint IO) if the arch has no int8 fold
        from coastline.infer.quant import ARCHS, quant_arch_for

        qarch = quant_arch_for(args.arch)
        if qarch is None:
            raise SystemExit(
                f"--quantized-out: {args.arch!r} has no int8 fold "
                f"(supported: {sorted(ARCHS)}; docs/QUANT.md is the "
                "adoption guide — small fast models should stay bf16)")

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
    if args.out:
        save_reference_pth(payload, args.out, arch=args.arch)
        print(f"exported {args.arch} weights -> {args.out}")
    if args.quantized_out:
        import numpy as np

        from coastline.data.pipeline import load_image_rgb
        from coastline.infer.deploy import save_quantized
        from coastline.infer.quant import QuantizedModel, default_calibration

        s = args.image_size
        imgs = None  # None -> default_calibration's synthetic scenes
        if args.calib_images:
            import glob as g
            import os

            paths = sorted(sum((g.glob(os.path.join(args.calib_images, e))
                                for e in ("*.png", "*.jpg", "*.tif",
                                          "*.tiff")), []))[:8]
            if not paths:
                raise SystemExit(f"no images in {args.calib_images}")
            from PIL import Image

            imgs = np.stack([
                np.asarray(load_image_rgb(pp, (s, s)).resize(
                    (s, s), Image.BILINEAR), np.uint8) for pp in paths])
        qm = QuantizedModel.from_variables(
            payload, default_calibration(s, imgs), arch=qarch)
        save_quantized(args.quantized_out, qm)
        print(f"quantized {qarch} serving artifact -> {args.quantized_out}")


if __name__ == "__main__":
    main()
