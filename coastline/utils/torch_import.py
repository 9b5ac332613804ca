"""Import PyTorch reference checkpoints into coastline parameter trees.

The reference ships/saves `models/best_water_segmentation_model.pth` — a
torch `state_dict` of its 2-class U-Net
(`/root/reference/train_water_segmentation.py:597-606`). This module maps
that state_dict (weights + BN running stats) onto our flax `UNet` variables
so existing trained models keep working after switching frameworks.

Layout conversion: torch conv weight (out, in, kh, kw) -> flax NHWC kernel
(kh, kw, in, out); torch ConvTranspose2d weight (in, out, kh, kw) -> our
lhs-dilated-conv kernel (kh, kw, in, out) with a spatial flip (see
tests/test_ops.py::test_conv_transpose_matches_torch for the convention).
"""

from typing import Dict, Mapping

import numpy as np


def _conv(w, b=None):
    out = {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _convT(w, b=None):
    k = np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1].copy()
    out = {"kernel": k}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _bn(prefix: str, sd: Mapping):
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def import_reference_unet(state_dict: Mapping) -> Dict:
    """Reference UNet state_dict -> {'params': ..., 'batch_stats': ...}.

    The reference module tree (train_water_segmentation.py:209-288):
    enc1..enc4, bottleneck are `conv_block`s == Sequential(conv, bn, relu,
    conv, bn, relu); upconv4..1 are ConvTranspose2d; dec4..1 conv_blocks;
    `final` is the 1x1 head. Ours: DoubleConv_0..8 (enc1-4, bottleneck,
    dec4-1 in call order), ConvTranspose_0..3, Conv_0.
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}

    params: Dict = {}
    stats: Dict = {}

    # call order of DoubleConv blocks in coastline.models.unet.UNet.__call__
    blocks = ["enc1", "enc2", "enc3", "enc4", "bottleneck",
              "dec4", "dec3", "dec2", "dec1"]
    for i, name in enumerate(blocks):
        dc_p, dc_s = {}, {}
        for j in range(2):  # two ConvBNAct per DoubleConv
            conv_idx, bn_idx = 3 * j, 3 * j + 1  # Sequential indices
            bn_p, bn_s = _bn(f"{name}.{bn_idx}", sd)
            dc_p[f"ConvBNAct_{j}"] = {
                "Conv_0": {
                    "Conv_0": _conv(
                        sd[f"{name}.{conv_idx}.weight"], sd[f"{name}.{conv_idx}.bias"]
                    )
                },
                "Norm_0": {"BatchNorm_0": bn_p},
            }
            dc_s[f"ConvBNAct_{j}"] = {"Norm_0": {"BatchNorm_0": bn_s}}
        params[f"DoubleConv_{i}"] = dc_p
        stats[f"DoubleConv_{i}"] = dc_s

    for i, name in enumerate(["upconv4", "upconv3", "upconv2", "upconv1"]):
        params[f"ConvTranspose_{i}"] = _convT(
            sd[f"{name}.weight"], sd[f"{name}.bias"]
        )

    params["Conv_0"] = {
        "Conv_0": _conv(sd["final.weight"], sd["final.bias"])
    }
    return {"params": params, "batch_stats": stats}


def load_reference_pth(path: str) -> Dict:
    """Load a torch .pth file and convert (torch import gated here)."""
    import torch

    return import_reference_unet(torch.load(path, map_location="cpu"))
