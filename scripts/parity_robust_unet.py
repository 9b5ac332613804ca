"""Accuracy-parity experiment: reference torch RobustUNet vs coastline.

Trains the reference's ACTUAL RobustUNet + ModelEvaluator protocol
(`/root/reference/Main_Final.py:549-668`, imported at runtime from the
read-only mount) and the coastline RobustUNet on the identical synthetic
dataset, identical sequential 80/20 split, lr, batch size and epoch count,
then compares IoU trajectories and final evaluate_model() IoU. Converts the
round-1 "protocol parity argued" into "accuracy parity measured".

Runs CPU-only (torch is CPU; the coastline side is forced to CPU f32 so
both frameworks see identical arithmetic class). Writes
artifacts/parity_robust_unet/parity.json, consumed by
tests/test_parity_artifact.py.

Usage: python scripts/parity_robust_unet.py [--size 96] [--n 10] [--epochs 10]
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np


def load_reference_main_final():
    """Import the reference Main_Final module with unavailable heavy deps
    stubbed (torchvision is absent in this container; its transforms are
    only used by reference code paths this experiment does not call)."""
    import torch  # noqa: F401  (must import before stubs land)

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        for k in ["Compose", "Resize", "ToTensor", "Normalize",
                  "RandomHorizontalFlip", "RandomRotation", "ColorJitter"]:
            setattr(tvt, k, lambda *a, **kw: None)
        tv.transforms = tvt
        tv.__file__ = tvt.__file__ = "<stub>"
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import Main_Final  # noqa

    return Main_Final


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def run_torch_side(images, masks, n_train, epochs, batch_size, lr):
    import torch
    from torch.utils.data import DataLoader, Dataset

    MF = load_reference_main_final()

    class ArrayDataset(Dataset):
        """Pre-normalized tensors, bypassing the reference's file-based
        CoastalDataset but reproducing its transform output exactly
        (Resize is a no-op here: scenes are generated at target size)."""

        def __init__(self, imgs, msks):
            x = imgs.astype(np.float32) / 255.0
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
            self.x = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
            self.y = torch.from_numpy(
                msks.astype(np.float32)[:, None, :, :].copy()
            )

        def __len__(self):
            return len(self.x)

        def __getitem__(self, i):
            return self.x[i], self.y[i]

    train_loader = DataLoader(
        ArrayDataset(images[:n_train], masks[:n_train]),
        batch_size=batch_size, shuffle=True, num_workers=0,
    )
    val_loader = DataLoader(
        ArrayDataset(images[n_train:], masks[n_train:]),
        batch_size=batch_size, shuffle=False, num_workers=0,
    )

    torch.manual_seed(0)
    model = MF.RobustUNet(n_channels=3, n_classes=1).to(torch.device("cpu"))
    evaluator = MF.ModelEvaluator(torch.device("cpu"))
    t0 = time.time()
    tr = evaluator.train_model(model, train_loader, val_loader,
                               epochs=epochs, lr=lr)
    res = evaluator.evaluate_model(model, val_loader)
    return {
        "best_iou": float(tr["best_iou"]),
        "history": {k: [float(v) for v in vs] for k, vs in tr["history"].items()},
        "final_iou": float(res["mean_iou"]),
        "final_f1": float(res["mean_f1_score"]),
        "final_accuracy": float(res["mean_accuracy"]),
        "train_seconds": time.time() - t0,
    }


def run_coastline_side(images, masks, n_train, epochs, batch_size, lr):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from coastline.data.pipeline import DeviceDataset
    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import Evaluator, TrainConfig

    train_ds = DeviceDataset.from_numpy(images[:n_train], masks[:n_train])
    val_ds = DeviceDataset.from_numpy(images[n_train:], masks[n_train:])
    model = RobustUNet()  # f32 on CPU
    cfg = TrainConfig(epochs=epochs, lr=lr, batch_size=batch_size,
                      eval_batch_size=batch_size, loss="bce",
                      plateau_on="train", plateau_patience=5, seed=0)
    ev = Evaluator(model, cfg)
    t0 = time.time()
    tr = ev.train_model(train_ds, val_ds)
    res = ev.evaluate_model(val_ds)
    return {
        "best_iou": float(tr["best_iou"]),
        "history": tr["history"],
        "final_iou": float(res["mean_iou"]),
        "final_f1": float(res["mean_f1_score"]),
        "final_accuracy": float(res["mean_accuracy"]),
        "train_seconds": time.time() - t0,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=96,
                   help="square scene size (512 is the full protocol; 96 "
                        "keeps the torch CPU side tractable on 1 vCPU)")
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out", default="artifacts/parity_robust_unet/parity.json")
    p.add_argument("--side", choices=["both", "torch", "coastline"],
                   default="both",
                   help="run one side only and cache its result; 'both' "
                        "reuses cached sides with matching config (the "
                        "full run is ~2h on this 1-vCPU host, so sides "
                        "are resumable across interrupted sessions)")
    args = p.parse_args(argv)

    from coastline.data.synthetic import make_scene

    rng = np.random.default_rng(0)
    pairs = [make_scene(rng, args.size) for _ in range(args.n)]
    images = np.stack([p[0] for p in pairs])
    masks = np.stack([p[1] for p in pairs])
    n_train = int(args.n * 0.8)  # sequential split (Main_Final.py:692-694)

    print(f"parity run: {n_train} train / {args.n - n_train} val @ "
          f"{args.size}^2, {args.epochs} epochs, batch {args.batch_size}")

    run_cfg = {k: vars(args)[k]
               for k in ("size", "n", "epochs", "batch_size", "lr")}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    def cache_path(side):
        return os.path.join(os.path.dirname(args.out), f"side_{side}.json")

    def run_side(side):
        cache = cache_path(side)
        if os.path.exists(cache):
            with open(cache) as f:
                cached = json.load(f)
            if cached.get("config") == run_cfg:
                print(f"\n--- {side}: cached ({cache}) ---")
                return cached["result"]
        label = ("coastline (JAX, CPU f32)" if side == "coastline"
                 else "reference (torch, CPU)")
        print(f"\n--- {label} ---")
        fn = run_coastline_side if side == "coastline" else run_torch_side
        res = fn(images, masks, n_train, args.epochs,
                 args.batch_size, args.lr)
        print(f"final IoU {res['final_iou']:.4f} "
              f"({res['train_seconds']:.0f}s)")
        with open(cache, "w") as f:
            json.dump({"config": run_cfg, "result": res}, f, indent=2)
        return res

    if args.side != "both":
        run_side(args.side)
        return 0

    ours = run_side("coastline")
    theirs = run_side("torch")
    out = {
        "config": vars(args),
        "torch_reference": theirs,
        "coastline": ours,
        "iou_delta": abs(theirs["final_iou"] - ours["final_iou"]),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nIoU delta: {out['iou_delta']:.4f} -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
