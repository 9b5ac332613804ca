"""Accuracy-parity experiment: reference torch RobustUNet vs coastline.

Trains the reference's ACTUAL RobustUNet + ModelEvaluator protocol
(`/root/reference/Main_Final.py:549-668`, imported at runtime from the
read-only mount) and the coastline RobustUNet on the identical synthetic
dataset, identical sequential 80/20 split, lr, batch size and epoch count,
then compares final evaluate_model() IoU — multi-seed on both sides, with
per-seed caching so the ~6.5h/seed torch-CPU runs survive interrupted
sessions.

Round-3 upgrades over the round-2 (96^2/10-image) version:
  * full Main_Final protocol scale: 512^2, 50 scenes (40 train), 20 epochs,
    batch 2, lr 1e-4 (`Main_Final.py:862-865,692-694`)
  * --seeds N,M: independent seeds per side (init + shuffle + dropout; the
    dataset itself is pinned to rng(0) on both sides, like the reference's
    fixed file list)
  * --coastline-platform tpu: the production target; --coastline-dtype
    gives the f32-vs-bf16 axis
  * --init-from-torch S: ports torch seed S's saved INITIAL state_dict
    through utils.torch_import (forward-exact, tests/test_torch_import.py)
    so the coastline run starts from bit-identical weights — isolating
    optimizer/BN/data-order effects from init-draw variance
  * --aggregate writes parity.json from every cached run matching the
    protocol config: per-seed IoUs, per-side mean/std, |mean delta|.

Writes artifacts/parity_robust_unet/parity.json, consumed by
tests/test_parity_artifact.py.
"""

import argparse
import glob
import json
import os
import sys
import time
import types

import numpy as np

ART_DIR = "artifacts/parity_robust_unet"


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


def run_torch_side(images, masks, n_train, epochs, batch_size, lr, seed):
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

    torch.manual_seed(seed)
    model = MF.RobustUNet(n_channels=3, n_classes=1).to(torch.device("cpu"))
    # save the INITIAL weights so --init-from-torch can start a coastline
    # run from bit-identical parameters (available minutes into this run,
    # not after its ~hours of training)
    os.makedirs(ART_DIR, exist_ok=True)
    torch.save(model.state_dict(), os.path.join(ART_DIR, f"torch_init_s{seed}.pt"))
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


def run_coastline_side(images, masks, n_train, epochs, batch_size, lr, seed,
                       platform="cpu", dtype="float32", init_from_torch=None):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from coastline.data.pipeline import DeviceDataset
    from coastline.models.robust_unet import RobustUNet
    from coastline.train.loop import Evaluator, TrainConfig

    init_variables = None
    if init_from_torch is not None:
        import torch

        from coastline.utils.torch_import import import_reference_robust_unet

        sd = torch.load(
            os.path.join(ART_DIR, f"torch_init_s{init_from_torch}.pt"),
            map_location="cpu",
        )
        init_variables = import_reference_robust_unet(sd)
        print(f"starting from torch seed-{init_from_torch} init")

    train_ds = DeviceDataset.from_numpy(images[:n_train], masks[:n_train])
    val_ds = DeviceDataset.from_numpy(images[n_train:], masks[n_train:])
    model = RobustUNet(dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    cfg = TrainConfig(epochs=epochs, lr=lr, batch_size=batch_size,
                      eval_batch_size=batch_size, loss="bce",
                      plateau_on="train", plateau_patience=5, seed=seed)
    ev = Evaluator(model, cfg)
    t0 = time.time()
    tr = ev.train_model(train_ds, val_ds, init_variables=init_variables)
    res = ev.evaluate_model(val_ds)
    return {
        "best_iou": float(tr["best_iou"]),
        "history": tr["history"],
        "final_iou": float(res["mean_iou"]),
        "final_f1": float(res["mean_f1_score"]),
        "final_accuracy": float(res["mean_accuracy"]),
        "train_seconds": time.time() - t0,
    }


def aggregate(out_path, run_cfg):
    """Build parity.json from every cached per-seed run matching run_cfg."""
    sides = {"torch": [], "coastline": []}
    for path in sorted(glob.glob(os.path.join(ART_DIR, "side_*.json"))):
        with open(path) as f:
            cached = json.load(f)
        if {k: cached.get("config", {}).get(k) for k in run_cfg} != run_cfg:
            continue
        side = "torch" if os.path.basename(path).startswith("side_torch") else "coastline"
        sides[side].append({
            "cache": os.path.basename(path),
            "seed": cached.get("seed"),
            "variant": cached.get("variant", {}),
            "final_iou": cached["result"]["final_iou"],
            "final_f1": cached["result"]["final_f1"],
            "best_iou": cached["result"]["best_iou"],
            "train_seconds": cached["result"]["train_seconds"],
        })
    # same-init runs are a separate comparison axis, not part of the
    # independent-seed mean (they reuse a torch seed's init draw); bf16
    # runs are likewise their own axis so a seed never appears twice in
    # the primary f32 multi-seed statistic
    cl_indep = [r for r in sides["coastline"]
                if r["variant"].get("init_from_torch") is None
                and r["variant"].get("dtype", "float32") == "float32"]
    cl_bf16 = [r for r in sides["coastline"]
               if r["variant"].get("init_from_torch") is None
               and r["variant"].get("dtype") == "bfloat16"]
    cl_sameinit = [r for r in sides["coastline"]
                   if r["variant"].get("init_from_torch") is not None]
    out = {"config": run_cfg, "torch_runs": sides["torch"],
           "coastline_runs": cl_indep, "coastline_bfloat16_runs": cl_bf16,
           "coastline_sameinit_runs": cl_sameinit}

    def stats(runs):
        ious = [r["final_iou"] for r in runs]
        return {
            "n": len(ious),
            "final_iou_mean": float(np.mean(ious)) if ious else None,
            "final_iou_std": float(np.std(ious)) if ious else None,
            "final_ious": ious,
        }

    out["torch"] = stats(sides["torch"])
    out["coastline"] = stats(cl_indep)
    out["coastline_bfloat16"] = stats(cl_bf16)
    if out["torch"]["n"] and out["coastline"]["n"]:
        out["iou_delta"] = abs(
            out["torch"]["final_iou_mean"] - out["coastline"]["final_iou_mean"]
        )
    if out["torch"]["n"] and out["coastline_bfloat16"]["n"]:
        out["bfloat16_iou_delta"] = abs(
            out["torch"]["final_iou_mean"]
            - out["coastline_bfloat16"]["final_iou_mean"]
        )
    if cl_sameinit:
        by_seed = {r["seed"]: r for r in sides["torch"]}
        deltas = []
        for r in cl_sameinit:
            t = by_seed.get(r["variant"]["init_from_torch"])
            if t:
                deltas.append(abs(t["final_iou"] - r["final_iou"]))
        if deltas:
            out["sameinit_iou_delta"] = float(np.mean(deltas))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items()
                      if k in ("torch", "coastline", "coastline_bfloat16",
                               "iou_delta", "bfloat16_iou_delta",
                               "sameinit_iou_delta")}, indent=2))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=512,
                   help="square scene size (512 is the full protocol)")
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seeds", default="0", help="comma-separated seeds")
    p.add_argument("--coastline-platform", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--coastline-dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--init-from-torch", type=int, default=None,
                   help="start the coastline run from torch seed N's saved "
                        "initial weights (requires torch side started first)")
    p.add_argument("--out", default=os.path.join(ART_DIR, "parity.json"))
    p.add_argument("--side", choices=["torch", "coastline", "aggregate"],
                   default="aggregate")
    args = p.parse_args(argv)

    run_cfg = {k: vars(args)[k]
               for k in ("size", "n", "epochs", "batch_size", "lr")}
    os.makedirs(ART_DIR, exist_ok=True)

    if args.side == "aggregate":
        aggregate(args.out, run_cfg)
        return 0

    from coastline.data.synthetic import make_scene

    rng = np.random.default_rng(0)  # dataset pinned across seeds/sides
    pairs = [make_scene(rng, args.size) for _ in range(args.n)]
    images = np.stack([p[0] for p in pairs])
    masks = np.stack([p[1] for p in pairs])
    n_train = int(args.n * 0.8)  # sequential split (Main_Final.py:692-694)

    print(f"parity run: {n_train} train / {args.n - n_train} val @ "
          f"{args.size}^2, {args.epochs} epochs, batch {args.batch_size}")

    for seed in [int(s) for s in args.seeds.split(",")]:
        variant = {}
        if args.side == "coastline":
            variant = {"platform": args.coastline_platform,
                       "dtype": args.coastline_dtype,
                       "init_from_torch": args.init_from_torch}
            tag = f"_{args.coastline_platform}_{args.coastline_dtype}"
            if args.init_from_torch is not None:
                tag += f"_torchinit{args.init_from_torch}"
        else:
            tag = ""
        cache = os.path.join(ART_DIR, f"side_{args.side}_s{seed}{tag}.json")
        if os.path.exists(cache):
            with open(cache) as f:
                cached = json.load(f)
            if ({k: cached.get("config", {}).get(k) for k in run_cfg} == run_cfg
                    and cached.get("seed") == seed):
                print(f"seed {seed}: cached ({cache})")
                continue
        print(f"\n--- {args.side} seed {seed} {variant or ''} ---")
        if args.side == "torch":
            res = run_torch_side(images, masks, n_train, args.epochs,
                                 args.batch_size, args.lr, seed)
        else:
            res = run_coastline_side(
                images, masks, n_train, args.epochs, args.batch_size,
                args.lr, seed, platform=args.coastline_platform,
                dtype=args.coastline_dtype,
                init_from_torch=args.init_from_torch,
            )
        print(f"seed {seed}: final IoU {res['final_iou']:.4f} "
              f"({res['train_seconds']:.0f}s)")
        with open(cache, "w") as f:
            json.dump({"config": run_cfg, "seed": seed, "variant": variant,
                       "result": res}, f, indent=2)

    aggregate(args.out, run_cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
