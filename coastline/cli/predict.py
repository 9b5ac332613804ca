"""Coastline extraction CLI — replaces the reference's Tkinter GUI + menu
CLI (`/root/reference/predict_coastline.py:848-1693`) with a flag-driven,
batchable entry point. (The GUI is host-side and orthogonal to TPU work —
SURVEY.md §7; this CLI covers single-image, batch-directory, and the new
full-scene tiled mode.)

Usage:
  python -m coastline.cli.predict image.png --checkpoint ./models
  python -m coastline.cli.predict dir/ --batch --output ./batch_results
  python -m coastline.cli.predict scene.tif --scene --output ./coastline_results
"""

import argparse
import glob
import os
import sys


def _extract_scene(ex, path, output_dir, dilation):
    """Native-resolution tiled extraction for one scene (CLI wrapper
    around `CoastlineExtractor.extract_scene`). Returns the polylines,
    raising on failure so the caller controls the error contract."""
    result = ex.extract_scene(path, output_dir, dilation_size=dilation)
    if result is None:
        raise RuntimeError(f"scene extraction failed for {path}")
    w, h = result["image_size"]
    print(f"scene {w}x{h}: {result['coastline_count']} coastlines "
          f"-> {output_dir}")
    return result["coastlines"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="image file or directory")
    p.add_argument("--checkpoint", default="./models",
                   help="trainer save dir with a best/ checkpoint")
    p.add_argument("--output", default="./coastline_results")
    p.add_argument("--dilation", type=int, default=20,
                   help="coastline band width (GUI default 20, "
                        "predict_coastline.py:870)")
    p.add_argument("--batch", action="store_true", help="process a directory")
    p.add_argument("--scene", action="store_true",
                   help="tile full-resolution scene instead of downscaling")
    p.add_argument("--torch-checkpoint", default=None,
                   help="import a reference-era PyTorch .pth directly")
    p.add_argument("--random-weights", action="store_true",
                   help="run without a checkpoint (smoke testing)")
    p.add_argument("--image-size", type=int, default=512,
                   help="model input resolution (must match training)")
    p.add_argument("--int8", action="store_true",
                   help="serve the int8 PTQ path (docs/QUANT.md): +24%% "
                        "throughput on a v5e, IoU drop 1e-5 at the gate")
    p.add_argument("--save-quantized", default=None, metavar="NPZ",
                   help="with --int8: also write the quantized weights as "
                        "a serving .npz (later served via --quantized)")
    p.add_argument("--quantized", default=None, metavar="NPZ",
                   help="serve directly from a quantized .npz artifact "
                        "(no checkpoint or calibration needed)")
    p.add_argument("--tta", action="store_true",
                   help="flip/transpose test-time-augmentation ensemble "
                        "(8 fused forwards, ~8.4x device cost; neutral on "
                        "clean data, can recover degraded/noisy inputs — "
                        "measured in artifacts/tta_eval.json)")
    args = p.parse_args(argv)
    if args.save_quantized and not args.int8:
        p.error("--save-quantized requires --int8 (it writes the artifact "
                "produced by that quantization pass)")
    if args.save_quantized and args.quantized:
        p.error("--save-quantized cannot be combined with --quantized "
                "(already serving from a saved artifact)")

    from coastline.utils.platform import apply_platform_override

    apply_platform_override()

    from coastline.infer.extract import CoastlineExtractor

    kwargs = {"image_size": args.image_size, "tta": args.tta}
    if args.torch_checkpoint:
        kwargs["torch_checkpoint"] = args.torch_checkpoint
    elif not args.random_weights:
        kwargs["checkpoint_dir"] = args.checkpoint
    try:
        if args.quantized:
            ex = CoastlineExtractor.from_quantized(
                args.quantized, image_size=args.image_size, tta=args.tta)
        else:
            ex = CoastlineExtractor(**kwargs)
    except FileNotFoundError as e:
        print(f"{e}\n(hint: train first with coastline.cli.train, or pass "
              f"--random-weights for a smoke run)")
        return 1
    if args.int8 and not args.quantized:
        print("quantizing to int8 (calibrating on synthetic scenes)")
        ex.quantize(save_to=args.save_quantized)

    if args.batch or os.path.isdir(args.input):
        exts = ("*.png", "*.jpg", "*.jpeg", "*.tif", "*.tiff")
        paths = sorted(
            p for pattern in exts for p in glob.glob(os.path.join(args.input, pattern))
        )
        if not paths:
            print(f"no images found in {args.input}")
            return 1
        print(f"processing {len(paths)} images -> {args.output}")
        if args.scene:
            # native-resolution tiled mode per file (the per-year workflow
            # feeding cli.change), software-pipelined: scene N+1 is in
            # flight on the device while the host traces/saves scene N
            # (extract_scenes). The compiled scene program is cached per
            # geometry, so same-sized yearly scenes compile once. Matches
            # extract_batch's per-image error contract: one bad file never
            # aborts the directory run.
            results = ex.extract_scenes(paths, args.output, args.dilation)
            ok = sum(r is not None for r in results)
        else:
            results = ex.extract_batch(paths, args.output, args.dilation)
            ok = sum(r is not None for r in results)
        print(f"done: {ok}/{len(paths)} succeeded")
        return 0 if ok else 1

    if args.scene:
        _extract_scene(ex, args.input, args.output, args.dilation)
        return 0

    result = ex.extract_coastline_from_image(args.input, args.output, args.dilation)
    if result is None:
        return 1
    print(f"extracted {result['coastline_count']} coastlines from {args.input}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
