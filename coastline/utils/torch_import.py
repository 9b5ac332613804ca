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


def _dense_from_1x1(w):
    """torch 1x1 conv weight (out, in, 1, 1) -> flax Dense kernel (in, out).

    ChannelAttention's bottleneck MLP is 1x1 convs on 1x1 maps in the
    reference (`Main_Final.py:90-94`); coastline maps it to Dense on pooled
    (N, C) vectors — identical math, better MXU shape."""
    return {"kernel": np.asarray(w)[:, :, 0, 0].T}


def _residual_block(prefix: str, sd: Mapping):
    """Reference ResidualBlock (`Main_Final.py:151-196`) -> coastline
    `ops.blocks.ResidualBlock` params/stats. Flax names follow call order:
    the 1x1 shortcut (when in!=out) is declared first, so it takes
    Conv_0/Norm_0 and pushes conv1/conv2 to Conv_1/Conv_2."""
    p: Dict = {}
    s: Dict = {}
    i = 0
    if f"{prefix}.shortcut.0.weight" in sd:
        p[f"Conv_{i}"] = {"Conv_0": _conv(sd[f"{prefix}.shortcut.0.weight"])}
        bn_p, bn_s = _bn(f"{prefix}.shortcut.1", sd)
        p[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        s[f"Norm_{i}"] = {"BatchNorm_0": bn_s}
        i += 1
    for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
        p[f"Conv_{i}"] = {"Conv_0": _conv(sd[f"{prefix}.{conv}.weight"])}
        bn_p, bn_s = _bn(f"{prefix}.{bn}", sd)
        p[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        s[f"Norm_{i}"] = {"BatchNorm_0": bn_s}
        i += 1
    p["ChannelAttention_0"] = {
        "Dense_0": _dense_from_1x1(sd[f"{prefix}.ca.fc.0.weight"]),
        "Dense_1": _dense_from_1x1(sd[f"{prefix}.ca.fc.2.weight"]),
    }
    p["SpatialAttention_0"] = {
        "Conv_0": {"Conv_0": _conv(sd[f"{prefix}.sa.conv1.weight"])}
    }
    return p, s


def _attention_gate(prefix: str, sd: Mapping):
    """Reference AttentionGate (`Main_Final.py:120-148`): W_g / W_x / psi
    each Sequential(1x1 conv, BN) -> Conv_0..2 / Norm_0..2 in call order."""
    p: Dict = {}
    s: Dict = {}
    for i, seq in enumerate(("W_g", "W_x", "psi")):
        p[f"Conv_{i}"] = {
            "Conv_0": _conv(sd[f"{prefix}.{seq}.0.weight"], sd[f"{prefix}.{seq}.0.bias"])
        }
        bn_p, bn_s = _bn(f"{prefix}.{seq}.1", sd)
        p[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        s[f"Norm_{i}"] = {"BatchNorm_0": bn_s}
    return p, s


def import_reference_robust_unet(state_dict: Mapping) -> Dict:
    """Reference RobustUNet state_dict (`Main_Final.py:226-321`) ->
    {'params', 'batch_stats'} for `coastline.models.robust_unet.RobustUNet`.

    Module-name correspondence (torch -> flax, call order):
      inc / down1.1 / down2.1 / down3.1 / bottleneck.2 / dec4..dec1
        -> ResidualBlock_0..8
      bottleneck.1 -> DilatedBlock_0 (conv1..4 -> Conv_0..3, bn -> Norm_0)
      att4..att1   -> AttentionGate_0..3
      up4..up1     -> ConvTranspose_0..3
      outc.0       -> Conv_0 (1x1 head; sigmoid is functional both sides)
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    rblocks = ["inc", "down1.1", "down2.1", "down3.1", "bottleneck.2",
               "dec4", "dec3", "dec2", "dec1"]
    for i, name in enumerate(rblocks):
        p, s = _residual_block(name, sd)
        params[f"ResidualBlock_{i}"] = p
        stats[f"ResidualBlock_{i}"] = s

    db_p: Dict = {}
    for j in range(4):
        db_p[f"Conv_{j}"] = {
            "Conv_0": _conv(sd[f"bottleneck.1.conv{j + 1}.weight"],
                            sd[f"bottleneck.1.conv{j + 1}.bias"])
        }
    bn_p, bn_s = _bn("bottleneck.1.bn", sd)
    db_p["Norm_0"] = {"BatchNorm_0": bn_p}
    params["DilatedBlock_0"] = db_p
    stats["DilatedBlock_0"] = {"Norm_0": {"BatchNorm_0": bn_s}}

    for i, name in enumerate(["att4", "att3", "att2", "att1"]):
        p, s = _attention_gate(name, sd)
        params[f"AttentionGate_{i}"] = p
        stats[f"AttentionGate_{i}"] = s

    for i, name in enumerate(["up4", "up3", "up2", "up1"]):
        params[f"ConvTranspose_{i}"] = _convT(
            sd[f"{name}.weight"], sd[f"{name}.bias"]
        )

    params["Conv_0"] = {
        "Conv_0": _conv(sd["outc.0.weight"], sd["outc.0.bias"])
    }
    return {"params": params, "batch_stats": stats}


def import_reference_segnet(state_dict: Mapping) -> Dict:
    """Reference SegNet state_dict (`/root/reference/comne.py:84-208`) ->
    coastline `models.segnet.SegNet` variables.

    torch Sequentials enc1..4/dec4..1 hold (conv, bn, relu)*n — conv at
    3j, bn at 3j+1 — mapped in call order onto ConvBNAct_0..18; dec1's
    trailing head conv (index 3, no BN) is the flax Conv_0. The pooling
    indices carry no parameters on either side (torch MaxUnpool2d vs our
    one-hot window expand), so weight-level parity also certifies the
    unpool numerics end-to-end."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}
    blocks = [("enc1", 2), ("enc2", 2), ("enc3", 3), ("enc4", 3),
              ("dec4", 3), ("dec3", 3), ("dec2", 2), ("dec1", 1)]
    i = 0
    for name, nconv in blocks:
        for j in range(nconv):
            ci, bi = 3 * j, 3 * j + 1
            bn_p, bn_s = _bn(f"{name}.{bi}", sd)
            params[f"ConvBNAct_{i}"] = {
                "Conv_0": {
                    "Conv_0": _conv(sd[f"{name}.{ci}.weight"], sd[f"{name}.{ci}.bias"])
                },
                "Norm_0": {"BatchNorm_0": bn_p},
            }
            stats[f"ConvBNAct_{i}"] = {"Norm_0": {"BatchNorm_0": bn_s}}
            i += 1
    params["Conv_0"] = {"Conv_0": _conv(sd["dec1.3.weight"], sd["dec1.3.bias"])}
    return {"params": params, "batch_stats": stats}


def load_reference_pth(path: str) -> Dict:
    """Load a torch .pth file and convert (torch import gated here)."""
    import torch

    return import_reference_unet(torch.load(path, map_location="cpu"))
