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


def _convbnact(conv_prefix: str, bn_prefix: str, sd: Mapping, bias: bool = True):
    """torch (Conv2d, BatchNorm2d) pair -> coastline `ConvBNAct` params/stats."""
    b = sd.get(f"{conv_prefix}.bias") if bias else None
    bn_p, bn_s = _bn(bn_prefix, sd)
    p = {
        "Conv_0": {"Conv_0": _conv(sd[f"{conv_prefix}.weight"], b)},
        "Norm_0": {"BatchNorm_0": bn_p},
    }
    return p, {"Norm_0": {"BatchNorm_0": bn_s}}


def _aspp(prefix: str, sd: Mapping):
    """Reference ASPP (`Main_Final.py:325-356`): conv1..conv5 + conv_out + bn
    -> coastline `ops.blocks.ASPP` Conv_0..5 / Norm_0 in call order."""
    p: Dict = {}
    for i, name in enumerate(["conv1", "conv2", "conv3", "conv4", "conv5", "conv_out"]):
        p[f"Conv_{i}"] = {
            "Conv_0": _conv(sd[f"{prefix}.{name}.weight"], sd[f"{prefix}.{name}.bias"])
        }
    bn_p, bn_s = _bn(f"{prefix}.bn", sd)
    p["Norm_0"] = {"BatchNorm_0": bn_p}
    return p, {"Norm_0": {"BatchNorm_0": bn_s}}


def import_reference_deeplabv3plus(state_dict: Mapping) -> Dict:
    """Reference DeepLabV3Plus (`Main_Final.py:359-433`) -> coastline
    `models.deeplabv3p.DeepLabV3Plus` variables.

    conv1..conv4 Sequentials -> ConvBNAct_0..3 (conv2's MaxPool shifts its
    conv/bn to Sequential indices 1/2); aspp -> ASPP_0; decoder ConvT/BN
    pairs at indices (0,1),(3,4),(6,7),(9,10) -> ConvTranspose_0..3 +
    top-level Norm_0..3; decoder.12 -> Conv_0 (3x3 head)."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    stages = [("conv1", 0, 1), ("conv2", 1, 2), ("conv3", 0, 1), ("conv4", 0, 1)]
    for i, (name, ci, bi) in enumerate(stages):
        p, s = _convbnact(f"{name}.{ci}", f"{name}.{bi}", sd)
        params[f"ConvBNAct_{i}"] = p
        stats[f"ConvBNAct_{i}"] = s

    params["ASPP_0"], stats["ASPP_0"] = _aspp("aspp", sd)

    for i, (ti, bi) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        params[f"ConvTranspose_{i}"] = _convT(
            sd[f"decoder.{ti}.weight"], sd[f"decoder.{ti}.bias"]
        )
        bn_p, bn_s = _bn(f"decoder.{bi}", sd)
        params[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        stats[f"Norm_{i}"] = {"BatchNorm_0": bn_s}

    params["Conv_0"] = {"Conv_0": _conv(sd["decoder.12.weight"], sd["decoder.12.bias"])}
    return {"params": params, "batch_stats": stats}


def import_reference_yoloseg(state_dict: Mapping) -> Dict:
    """Reference YOLOSeg (`Main_Final.py:436-510`) -> coastline
    `models.yoloseg.YOLOSeg` variables.

    backbone Sequential conv indices [0,4,8,11,14,18,21,24] (bn at +1) ->
    ConvBNAct_0..7; seg_head ConvT/BN pairs -> ConvTranspose_0..3 +
    Norm_0..3; seg_head.12 -> Conv_0."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    for i, ci in enumerate([0, 4, 8, 11, 14, 18, 21, 24]):
        p, s = _convbnact(f"backbone.{ci}", f"backbone.{ci + 1}", sd)
        params[f"ConvBNAct_{i}"] = p
        stats[f"ConvBNAct_{i}"] = s

    for i, (ti, bi) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        params[f"ConvTranspose_{i}"] = _convT(
            sd[f"seg_head.{ti}.weight"], sd[f"seg_head.{ti}.bias"]
        )
        bn_p, bn_s = _bn(f"seg_head.{bi}", sd)
        params[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        stats[f"Norm_{i}"] = {"BatchNorm_0": bn_s}

    params["Conv_0"] = {"Conv_0": _conv(sd["seg_head.12.weight"], sd["seg_head.12.bias"])}
    return {"params": params, "batch_stats": stats}


def _pyramid_pooling(prefix: str, sd: Mapping, n_branches: int = 4):
    """Reference PyramidPooling (`comne.py:214-240` / the identical FastSCNN
    copy at `comne.py:343-371`): convs.{i} = Sequential(pool, conv, bn, relu)
    -> coastline `PyramidPooling` Conv_i/Norm_i per branch."""
    p: Dict = {}
    s: Dict = {}
    for i in range(n_branches):
        p[f"Conv_{i}"] = {
            "Conv_0": _conv(sd[f"{prefix}.convs.{i}.1.weight"],
                            sd[f"{prefix}.convs.{i}.1.bias"])
        }
        bn_p, bn_s = _bn(f"{prefix}.convs.{i}.2", sd)
        p[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        s[f"Norm_{i}"] = {"BatchNorm_0": bn_s}
    return p, s


def import_reference_pspnet(state_dict: Mapping) -> Dict:
    """Reference PSPNet (`comne.py:243-299`) -> coastline
    `models.pspnet.PSPNet` variables.

    conv1..conv4 -> ConvBNAct_0..3; ppm -> PyramidPooling_0;
    final_conv.(0,1) -> ConvBNAct_4; final_conv.4 -> Conv_0 (1x1 head;
    Dropout2d carries no params)."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    for i, name in enumerate(["conv1", "conv2", "conv3", "conv4"]):
        p, s = _convbnact(f"{name}.0", f"{name}.1", sd)
        params[f"ConvBNAct_{i}"] = p
        stats[f"ConvBNAct_{i}"] = s

    pp_p, pp_s = _pyramid_pooling("ppm", sd)
    params["PyramidPooling_0"] = pp_p
    stats["PyramidPooling_0"] = pp_s

    p, s = _convbnact("final_conv.0", "final_conv.1", sd)
    params["ConvBNAct_4"] = p
    stats["ConvBNAct_4"] = s
    params["Conv_0"] = {
        "Conv_0": _conv(sd["final_conv.4.weight"], sd["final_conv.4.bias"])
    }
    return {"params": params, "batch_stats": stats}


def _dsconv(prefix: str, sd: Mapping):
    """Reference DepthwiseSeparableConv (`comne.py:305-320`): depthwise 3x3
    (groups=C, no bias) + pointwise 1x1 (no bias) + BN -> coastline
    `DepthwiseSeparableConv` Conv_0/Conv_1/Norm_0. The grouped-conv kernel
    transposes like any conv: torch (C,1,3,3) -> flax (3,3,1,C)."""
    bn_p, bn_s = _bn(f"{prefix}.bn", sd)
    p = {
        "Conv_0": {"Conv_0": _conv(sd[f"{prefix}.depthwise.weight"])},
        "Conv_1": {"Conv_0": _conv(sd[f"{prefix}.pointwise.weight"])},
        "Norm_0": {"BatchNorm_0": bn_p},
    }
    return p, {"Norm_0": {"BatchNorm_0": bn_s}}


def import_reference_fastscnn(state_dict: Mapping) -> Dict:
    """Reference FastSCNN (`comne.py:447-476`) -> coastline
    `models.fastscnn.FastSCNN` variables.

    learning_to_downsample.conv1 -> ConvBNAct_0 (bias-free);
    dsconv1/dsconv2 + global_feature_extractor block1..3 -> the 11
    DepthwiseSeparableConv_0..10 in call order; gfe.ppm ->
    PyramidPooling_0; feature_fusion conv_low/conv_high -> Conv_0/Norm_0,
    Conv_1/Norm_1 (bias-free 1x1 + BN); classifier.conv1/conv2 ->
    DepthwiseSeparableConv_11/12, classifier.conv3 -> Conv_2."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    p, s = _convbnact("learning_to_downsample.conv1.0",
                      "learning_to_downsample.conv1.1", sd, bias=False)
    params["ConvBNAct_0"] = p
    stats["ConvBNAct_0"] = s

    ds_prefixes = (
        ["learning_to_downsample.dsconv1", "learning_to_downsample.dsconv2"]
        + [f"global_feature_extractor.block1.{j}" for j in range(3)]
        + [f"global_feature_extractor.block2.{j}" for j in range(3)]
        + [f"global_feature_extractor.block3.{j}" for j in range(3)]
    )
    for i, prefix in enumerate(ds_prefixes):
        p, s = _dsconv(prefix, sd)
        params[f"DepthwiseSeparableConv_{i}"] = p
        stats[f"DepthwiseSeparableConv_{i}"] = s

    pp_p, pp_s = _pyramid_pooling("global_feature_extractor.ppm", sd)
    params["PyramidPooling_0"] = pp_p
    stats["PyramidPooling_0"] = pp_s

    for i, seq in enumerate(["conv_low", "conv_high"]):
        params[f"Conv_{i}"] = {
            "Conv_0": _conv(sd[f"feature_fusion.{seq}.0.weight"])
        }
        bn_p, bn_s = _bn(f"feature_fusion.{seq}.1", sd)
        params[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        stats[f"Norm_{i}"] = {"BatchNorm_0": bn_s}

    for i, name in enumerate(["conv1", "conv2"]):
        p, s = _dsconv(f"classifier.{name}", sd)
        params[f"DepthwiseSeparableConv_{11 + i}"] = p
        stats[f"DepthwiseSeparableConv_{11 + i}"] = s
    params["Conv_2"] = {
        "Conv_0": _conv(sd["classifier.conv3.weight"], sd["classifier.conv3.bias"])
    }
    return {"params": params, "batch_stats": stats}


def _enet_bottleneck(prefix: str, sd: Mapping, downsample: bool, asymmetric: bool):
    """Reference ENet BottleneckBlock (`comne.py:500-557`) -> coastline
    `ENetBottleneck`. Flax call order: [identity Conv_0/Norm_0 when
    downsampling] -> ConvBNAct_0 (conv1) -> branch Conv/Norm pairs (one for
    the dilated 3x3, two for the 5x1+1x5 asymmetric pair) -> final 1x1
    Conv/Norm. All convs bias-free on both sides."""
    p: Dict = {}
    s: Dict = {}
    i = 0
    if downsample:
        p[f"Conv_{i}"] = {"Conv_0": _conv(sd[f"{prefix}.conv_down.0.weight"])}
        bn_p, bn_s = _bn(f"{prefix}.conv_down.1", sd)
        p[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        s[f"Norm_{i}"] = {"BatchNorm_0": bn_s}
        i += 1

    cb_p, cb_s = _convbnact(f"{prefix}.conv1.0", f"{prefix}.conv1.1", sd, bias=False)
    p["ConvBNAct_0"] = cb_p
    s["ConvBNAct_0"] = cb_s

    mid = [(f"{prefix}.conv2.0", f"{prefix}.conv2.1")]
    if asymmetric:
        mid.append((f"{prefix}.conv2.3", f"{prefix}.conv2.4"))
    mid.append((f"{prefix}.conv3.0", f"{prefix}.conv3.1"))
    for conv, bn in mid:
        p[f"Conv_{i}"] = {"Conv_0": _conv(sd[f"{conv}.weight"])}
        bn_p, bn_s = _bn(bn, sd)
        p[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        s[f"Norm_{i}"] = {"BatchNorm_0": bn_s}
        i += 1
    return p, s


def import_reference_enet(state_dict: Mapping) -> Dict:
    """Reference ENet (`comne.py:560-608`) -> coastline `models.enet.ENet`
    variables.

    initial -> ENetInitialBlock_0; encoder1.0-3 + encoder2.0-8 ->
    ENetBottleneck_0..12 (downsample at encoder1.0/encoder2.0, asymmetric at
    encoder2.{3,7}); decoder ConvT/BN pairs (0,1)/(3,4) -> ConvTranspose_0/1
    + Norm_0/1, decoder.6 -> ConvTranspose_2 (the 2x2 head)."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    init_p = {"Conv_0": {"Conv_0": _conv(sd["initial.conv.weight"])}}
    bn_p, bn_s = _bn("initial.bn", sd)
    init_p["Norm_0"] = {"BatchNorm_0": bn_p}
    params["ENetInitialBlock_0"] = init_p
    stats["ENetInitialBlock_0"] = {"Norm_0": {"BatchNorm_0": bn_s}}

    blocks = [(f"encoder1.{j}", j == 0, False) for j in range(4)] + [
        (f"encoder2.{j}", j == 0, j in (3, 7)) for j in range(9)
    ]
    for i, (prefix, down, asym) in enumerate(blocks):
        p, s = _enet_bottleneck(prefix, sd, down, asym)
        params[f"ENetBottleneck_{i}"] = p
        stats[f"ENetBottleneck_{i}"] = s

    for i, (ti, bi) in enumerate([(0, 1), (3, 4)]):
        params[f"ConvTranspose_{i}"] = _convT(
            sd[f"decoder.{ti}.weight"], sd[f"decoder.{ti}.bias"]
        )
        bn_p, bn_s = _bn(f"decoder.{bi}", sd)
        params[f"Norm_{i}"] = {"BatchNorm_0": bn_p}
        stats[f"Norm_{i}"] = {"BatchNorm_0": bn_s}
    params["ConvTranspose_2"] = _convT(
        sd["decoder.6.weight"], sd["decoder.6.bias"]
    )
    return {"params": params, "batch_stats": stats}


def import_reference_waternet(state_dict: Mapping) -> Dict:
    """Reference WaterNet (`Extended_Baseline_Comparison.py:396-473`) ->
    coastline `models.waternet.WaterNet` variables.

    water_index.index_conv (1x1/BN/1x1) -> WaterIndexModule_0; enc1..3 +
    bottleneck double-convs -> ConvBNAct_0..7; water_attention (CBAM channel
    gate, bias-free 1x1 MLP) -> ChannelAttention_0 Dense_0/1; up3..1 ->
    ConvTranspose_0..2 interleaved with dec3..1 -> ConvBNAct_8..13 in call
    order; outc.0 -> Conv_0."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    bn_p, bn_s = _bn("water_index.index_conv.1", sd)
    params["WaterIndexModule_0"] = {
        "Conv_0": {"Conv_0": _conv(sd["water_index.index_conv.0.weight"],
                                   sd["water_index.index_conv.0.bias"])},
        "Norm_0": {"BatchNorm_0": bn_p},
        "Conv_1": {"Conv_0": _conv(sd["water_index.index_conv.3.weight"],
                                   sd["water_index.index_conv.3.bias"])},
    }
    stats["WaterIndexModule_0"] = {"Norm_0": {"BatchNorm_0": bn_s}}

    i = 0
    for seq in ["enc1", "enc2", "enc3", "bottleneck"]:
        for ci, bi in [(0, 1), (3, 4)]:
            p, s = _convbnact(f"{seq}.{ci}", f"{seq}.{bi}", sd)
            params[f"ConvBNAct_{i}"] = p
            stats[f"ConvBNAct_{i}"] = s
            i += 1

    params["ChannelAttention_0"] = {
        "Dense_0": _dense_from_1x1(sd["water_attention.fc.0.weight"]),
        "Dense_1": _dense_from_1x1(sd["water_attention.fc.2.weight"]),
    }

    for t, (up, dec) in enumerate([("up3", "dec3"), ("up2", "dec2"), ("up1", "dec1")]):
        params[f"ConvTranspose_{t}"] = _convT(sd[f"{up}.weight"], sd[f"{up}.bias"])
        for ci, bi in [(0, 1), (3, 4)]:
            p, s = _convbnact(f"{dec}.{ci}", f"{dec}.{bi}", sd)
            params[f"ConvBNAct_{i}"] = p
            stats[f"ConvBNAct_{i}"] = s
            i += 1

    params["Conv_0"] = {"Conv_0": _conv(sd["outc.0.weight"], sd["outc.0.bias"])}
    return {"params": params, "batch_stats": stats}


def _multiscale_block(prefix: str, sd: Mapping):
    """Reference MultiScaleBlock (`Extended_Baseline_Comparison.py:479-494`):
    branch1..4 -> coastline `MultiScaleBlock` ConvBNAct_0..3 (branch4's
    Sequential leads with the parameter-free MaxPool, so its conv/bn sit at
    indices 1/2)."""
    p: Dict = {}
    s: Dict = {}
    layout = [("branch1", 0, 1), ("branch2", 0, 1), ("branch3", 0, 1),
              ("branch4", 1, 2)]
    for i, (name, ci, bi) in enumerate(layout):
        bp, bs = _convbnact(f"{prefix}.{name}.{ci}", f"{prefix}.{name}.{bi}", sd)
        p[f"ConvBNAct_{i}"] = bp
        s[f"ConvBNAct_{i}"] = bs
    return p, s


def import_reference_mswnet(state_dict: Mapping) -> Dict:
    """Reference MSWNet (`Extended_Baseline_Comparison.py:497-548`) ->
    coastline `models.mswnet.MSWNet` variables.

    enc1..4 -> MultiScaleBlock_0..3; bridge double-conv -> top-level
    ConvBNAct_0/1; up4..1 -> ConvTranspose_0..3 with dec4..1 ->
    ConvBNAct_2..5; outc.0 -> Conv_0."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    for i, name in enumerate(["enc1", "enc2", "enc3", "enc4"]):
        p, s = _multiscale_block(name, sd)
        params[f"MultiScaleBlock_{i}"] = p
        stats[f"MultiScaleBlock_{i}"] = s

    for j, (ci, bi) in enumerate([(0, 1), (3, 4)]):
        p, s = _convbnact(f"bridge.{ci}", f"bridge.{bi}", sd)
        params[f"ConvBNAct_{j}"] = p
        stats[f"ConvBNAct_{j}"] = s

    for t, (up, dec) in enumerate([("up4", "dec4"), ("up3", "dec3"),
                                   ("up2", "dec2"), ("up1", "dec1")]):
        params[f"ConvTranspose_{t}"] = _convT(sd[f"{up}.weight"], sd[f"{up}.bias"])
        p, s = _convbnact(f"{dec}.0", f"{dec}.1", sd)
        params[f"ConvBNAct_{t + 2}"] = p
        stats[f"ConvBNAct_{t + 2}"] = s

    params["Conv_0"] = {"Conv_0": _conv(sd["outc.0.weight"], sd["outc.0.bias"])}
    return {"params": params, "batch_stats": stats}


def import_reference_hrnet_water(state_dict: Mapping) -> Dict:
    """Reference HRNetWater (`Extended_Baseline_Comparison.py:554-616`) ->
    coastline `models.hrnet_water.HRNetWater` variables.

    stem/hr_branch/mr_branch/lr_branch double-convs -> ConvBNAct_0..7;
    mr_to_hr / lr_to_hr (1x1 conv + BN, upsample is parameter-free) ->
    Conv_0/Norm_0 and Conv_1/Norm_1; head.(0,1) -> ConvBNAct_8; head.4 ->
    Conv_2 (torch's Upsample at head.3 has no params)."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    i = 0
    for seq in ["stem", "hr_branch", "mr_branch", "lr_branch"]:
        for ci, bi in [(0, 1), (3, 4)]:
            p, s = _convbnact(f"{seq}.{ci}", f"{seq}.{bi}", sd)
            params[f"ConvBNAct_{i}"] = p
            stats[f"ConvBNAct_{i}"] = s
            i += 1

    for j, seq in enumerate(["mr_to_hr", "lr_to_hr"]):
        params[f"Conv_{j}"] = {
            "Conv_0": _conv(sd[f"{seq}.0.weight"], sd[f"{seq}.0.bias"])
        }
        bn_p, bn_s = _bn(f"{seq}.1", sd)
        params[f"Norm_{j}"] = {"BatchNorm_0": bn_p}
        stats[f"Norm_{j}"] = {"BatchNorm_0": bn_s}

    p, s = _convbnact("head.0", "head.1", sd)
    params["ConvBNAct_8"] = p
    stats["ConvBNAct_8"] = s
    params["Conv_2"] = {"Conv_0": _conv(sd["head.4.weight"], sd["head.4.bias"])}
    return {"params": params, "batch_stats": stats}


def _efficient_self_attention(prefix: str, sd: Mapping):
    """Reference EfficientSelfAttention (`Extended_Baseline_Comparison.py:
    636-664`) -> coastline `EfficientSelfAttention`. Call order declares the
    query conv, then the stride-r reduction, then kv, then proj ->
    Conv_0..3; torch registers q, kv, proj, reduction."""
    p: Dict = {}
    for i, name in enumerate(["q", "reduction", "kv", "proj"]):
        p[f"Conv_{i}"] = {
            "Conv_0": _conv(sd[f"{prefix}.{name}.weight"], sd[f"{prefix}.{name}.bias"])
        }
    return p


def _mixffn(prefix: str, sd: Mapping):
    """Reference MixFFN (`Extended_Baseline_Comparison.py:622-633`): fc1 /
    depthwise 3x3 / fc2 -> Conv_0..2 (the grouped dwconv kernel transposes
    like any conv: (hidden,1,3,3) -> (3,3,1,hidden))."""
    p: Dict = {}
    for i, name in enumerate(["fc1", "dwconv", "fc2"]):
        p[f"Conv_{i}"] = {
            "Conv_0": _conv(sd[f"{prefix}.{name}.weight"], sd[f"{prefix}.{name}.bias"])
        }
    return p


def import_reference_segformer_lite(state_dict: Mapping) -> Dict:
    """Reference SegFormerLite (`Extended_Baseline_Comparison.py:667-744`) ->
    coastline `models.segformer_lite.SegFormerLite` variables.

    patch_embed1..4 -> ConvBNAct_0..3 (GELU stages); attn1..3 ->
    EfficientSelfAttention_0..2; ffn1..3 -> MixFFN_0..2; linear_c4..c1 ->
    Conv_0..3 (decode call order is c4 first); linear_fuse -> ConvBNAct_4;
    head.(0,1) -> ConvBNAct_5, head.3 -> Conv_4. NOTE the documented
    sigmoid/upsample-ordering deviation (models/segformer_lite.py): forward
    parity holds for `return_logits=True` against a torch model whose head
    sigmoid is removed — all parameterized compute is identical."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    for i in range(4):
        p, s = _convbnact(f"patch_embed{i + 1}.0", f"patch_embed{i + 1}.1", sd)
        params[f"ConvBNAct_{i}"] = p
        stats[f"ConvBNAct_{i}"] = s

    for i in range(3):
        params[f"EfficientSelfAttention_{i}"] = _efficient_self_attention(
            f"attn{i + 1}", sd)
        params[f"MixFFN_{i}"] = _mixffn(f"ffn{i + 1}", sd)

    for i, name in enumerate(["linear_c4", "linear_c3", "linear_c2", "linear_c1"]):
        params[f"Conv_{i}"] = {
            "Conv_0": _conv(sd[f"{name}.weight"], sd[f"{name}.bias"])
        }

    p, s = _convbnact("linear_fuse.0", "linear_fuse.1", sd)
    params["ConvBNAct_4"] = p
    stats["ConvBNAct_4"] = s
    p, s = _convbnact("head.0", "head.1", sd)
    params["ConvBNAct_5"] = p
    stats["ConvBNAct_5"] = s
    params["Conv_4"] = {"Conv_0": _conv(sd["head.3.weight"], sd["head.3.bias"])}
    return {"params": params, "batch_stats": stats}


# Registry-canonical model name -> (unique state_dict signature key, importer).
# Signature keys are each distinctive module names no other reference
# architecture declares, so one membership test identifies the checkpoint.
REFERENCE_IMPORTERS = {
    "UNet": ("upconv4.weight", import_reference_unet),
    "Robust UNet": ("att4.W_g.0.weight", import_reference_robust_unet),
    # NB "dec1.3.weight" would also match WaterNet's double-conv decoder;
    # the 3-conv enc4 stage (conv at Sequential index 6) is SegNet-only.
    "SegNet": ("enc4.6.weight", import_reference_segnet),
    "DeepLabV3+": ("aspp.conv1.weight", import_reference_deeplabv3plus),
    "YOLO-SEG": ("seg_head.0.weight", import_reference_yoloseg),
    "PSPNet": ("ppm.convs.0.1.weight", import_reference_pspnet),
    "Fast-SCNN": ("learning_to_downsample.conv1.0.weight", import_reference_fastscnn),
    "ENet": ("initial.conv.weight", import_reference_enet),
    "WaterNet": ("water_index.index_conv.0.weight", import_reference_waternet),
    "MSWNet": ("enc1.branch1.0.weight", import_reference_mswnet),
    "HRNet-Water": ("hr_branch.0.weight", import_reference_hrnet_water),
    "SegFormer-Lite": ("patch_embed1.0.weight", import_reference_segformer_lite),
}


def detect_reference_architecture(state_dict: Mapping) -> str:
    """Identify which reference architecture a torch state_dict belongs to.

    Returns the registry-canonical model name (`coastline.models.create_model`
    accepts it directly). Raises ValueError for an unrecognized tree."""
    for name, (signature, _) in REFERENCE_IMPORTERS.items():
        if signature in state_dict:
            return name
    sample = sorted(state_dict)[:5]
    raise ValueError(
        "state_dict does not match any reference architecture "
        f"(first keys: {sample}); known: {sorted(REFERENCE_IMPORTERS)}"
    )


def import_reference_checkpoint(state_dict: Mapping, arch: str = None):
    """Convert any reference-architecture state_dict.

    Returns (canonical_model_name, variables). `arch` (any registry name or
    alias) skips detection; otherwise the tree is identified by signature."""
    if arch is None:
        name = detect_reference_architecture(state_dict)
    else:
        from coastline.models.registry import canonical_name

        name = canonical_name(arch)
        if name not in REFERENCE_IMPORTERS:
            raise KeyError(
                f"no importer for {arch!r}; known: {sorted(REFERENCE_IMPORTERS)}"
            )
    return name, REFERENCE_IMPORTERS[name][1](state_dict)


# --------------------------------------------------------------------------
# Export: coastline variables -> reference-compatible torch state_dicts.
# Inverse of the import layout transforms; round-trip exactness is pinned in
# tests/test_torch_import.py (sd -> import -> export -> identical arrays).
# --------------------------------------------------------------------------


def _conv_inv(tree):
    """flax conv {'kernel' (kh,kw,in,out) [, 'bias']} -> torch tensors."""
    out = {"weight": np.transpose(np.asarray(tree["kernel"]), (3, 2, 0, 1))}
    if "bias" in tree:
        out["bias"] = np.asarray(tree["bias"])
    return out


def _convT_inv(tree):
    """Inverse of `_convT`: un-flip then (kh,kw,in,out) -> (in,out,kh,kw)."""
    k = np.asarray(tree["kernel"])[::-1, ::-1]
    out = {"weight": np.transpose(k, (2, 3, 0, 1)).copy()}
    if "bias" in tree:
        out["bias"] = np.asarray(tree["bias"])
    return out


def _dense_to_1x1(tree):
    """flax Dense kernel (in,out) -> torch 1x1 conv weight (out,in,1,1)."""
    return {"weight": np.asarray(tree["kernel"]).T[:, :, None, None]}


def _bn_inv(prefix: str, p, s, out: Dict):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
    out[f"{prefix}.running_var"] = np.asarray(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _emit(out: Dict, prefix: str, tensors: Mapping):
    for k, v in tensors.items():
        out[f"{prefix}.{k}"] = v


def export_reference_unet(variables: Mapping) -> Dict:
    """coastline UNet variables -> the reference's torch state_dict layout
    (`train_water_segmentation.py:209-288`) — the exact inverse of
    `import_reference_unet`, so coastline-trained weights drop back into
    the reference tooling (or torch serving) unchanged."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    blocks = ["enc1", "enc2", "enc3", "enc4", "bottleneck",
              "dec4", "dec3", "dec2", "dec1"]
    for i, name in enumerate(blocks):
        dc_p, dc_s = p[f"DoubleConv_{i}"], s[f"DoubleConv_{i}"]
        for j in range(2):
            cba_p = dc_p[f"ConvBNAct_{j}"]
            cba_s = dc_s[f"ConvBNAct_{j}"]
            _emit(out, f"{name}.{3 * j}", _conv_inv(cba_p["Conv_0"]["Conv_0"]))
            _bn_inv(f"{name}.{3 * j + 1}", cba_p["Norm_0"]["BatchNorm_0"],
                    cba_s["Norm_0"]["BatchNorm_0"], out)
    for i, name in enumerate(["upconv4", "upconv3", "upconv2", "upconv1"]):
        _emit(out, name, _convT_inv(p[f"ConvTranspose_{i}"]))
    _emit(out, "final", _conv_inv(p["Conv_0"]["Conv_0"]))
    return out


def _residual_block_inv(prefix: str, p, s, out: Dict):
    i = 0
    n_convs = sum(1 for k in p if k.startswith("Conv_"))
    if n_convs == 3:  # 1x1 shortcut present (in != out)
        _emit(out, f"{prefix}.shortcut.0", _conv_inv(p["Conv_0"]["Conv_0"]))
        _bn_inv(f"{prefix}.shortcut.1", p["Norm_0"]["BatchNorm_0"],
                s["Norm_0"]["BatchNorm_0"], out)
        i = 1
    for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
        _emit(out, f"{prefix}.{conv}", _conv_inv(p[f"Conv_{i}"]["Conv_0"]))
        _bn_inv(f"{prefix}.{bn}", p[f"Norm_{i}"]["BatchNorm_0"],
                s[f"Norm_{i}"]["BatchNorm_0"], out)
        i += 1
    _emit(out, f"{prefix}.ca.fc.0", _dense_to_1x1(p["ChannelAttention_0"]["Dense_0"]))
    _emit(out, f"{prefix}.ca.fc.2", _dense_to_1x1(p["ChannelAttention_0"]["Dense_1"]))
    _emit(out, f"{prefix}.sa.conv1",
          _conv_inv(p["SpatialAttention_0"]["Conv_0"]["Conv_0"]))


def export_reference_robust_unet(variables: Mapping) -> Dict:
    """coastline RobustUNet variables -> the reference torch state_dict
    (`Main_Final.py:226-321`) — inverse of `import_reference_robust_unet`."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    rblocks = ["inc", "down1.1", "down2.1", "down3.1", "bottleneck.2",
               "dec4", "dec3", "dec2", "dec1"]
    for i, name in enumerate(rblocks):
        _residual_block_inv(name, p[f"ResidualBlock_{i}"],
                            s[f"ResidualBlock_{i}"], out)
    db_p, db_s = p["DilatedBlock_0"], s["DilatedBlock_0"]
    for j in range(4):
        _emit(out, f"bottleneck.1.conv{j + 1}", _conv_inv(db_p[f"Conv_{j}"]["Conv_0"]))
    _bn_inv("bottleneck.1.bn", db_p["Norm_0"]["BatchNorm_0"],
            db_s["Norm_0"]["BatchNorm_0"], out)
    for i, name in enumerate(["att4", "att3", "att2", "att1"]):
        ag_p, ag_s = p[f"AttentionGate_{i}"], s[f"AttentionGate_{i}"]
        for j, seq in enumerate(("W_g", "W_x", "psi")):
            _emit(out, f"{name}.{seq}.0", _conv_inv(ag_p[f"Conv_{j}"]["Conv_0"]))
            _bn_inv(f"{name}.{seq}.1", ag_p[f"Norm_{j}"]["BatchNorm_0"],
                    ag_s[f"Norm_{j}"]["BatchNorm_0"], out)
    for i, name in enumerate(["up4", "up3", "up2", "up1"]):
        _emit(out, name, _convT_inv(p[f"ConvTranspose_{i}"]))
    _emit(out, "outc.0", _conv_inv(p["Conv_0"]["Conv_0"]))
    return out


def _convbnact_inv(conv_prefix: str, bn_prefix: str, p, s, out: Dict):
    """Inverse of `_convbnact`: coastline ConvBNAct -> torch conv+bn keys."""
    _emit(out, conv_prefix, _conv_inv(p["Conv_0"]["Conv_0"]))
    _bn_inv(bn_prefix, p["Norm_0"]["BatchNorm_0"], s["Norm_0"]["BatchNorm_0"], out)


def export_reference_segnet(variables: Mapping) -> Dict:
    """Inverse of `import_reference_segnet` (`comne.py:84-208`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    blocks = [("enc1", 2), ("enc2", 2), ("enc3", 3), ("enc4", 3),
              ("dec4", 3), ("dec3", 3), ("dec2", 2), ("dec1", 1)]
    i = 0
    for name, nconv in blocks:
        for j in range(nconv):
            _convbnact_inv(f"{name}.{3 * j}", f"{name}.{3 * j + 1}",
                           p[f"ConvBNAct_{i}"], s[f"ConvBNAct_{i}"], out)
            i += 1
    _emit(out, "dec1.3", _conv_inv(p["Conv_0"]["Conv_0"]))
    return out


def export_reference_deeplabv3plus(variables: Mapping) -> Dict:
    """Inverse of `import_reference_deeplabv3plus` (`Main_Final.py:359-433`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    stages = [("conv1", 0, 1), ("conv2", 1, 2), ("conv3", 0, 1), ("conv4", 0, 1)]
    for i, (name, ci, bi) in enumerate(stages):
        _convbnact_inv(f"{name}.{ci}", f"{name}.{bi}",
                       p[f"ConvBNAct_{i}"], s[f"ConvBNAct_{i}"], out)
    ap, as_ = p["ASPP_0"], s["ASPP_0"]
    for i, name in enumerate(["conv1", "conv2", "conv3", "conv4", "conv5", "conv_out"]):
        _emit(out, f"aspp.{name}", _conv_inv(ap[f"Conv_{i}"]["Conv_0"]))
    _bn_inv("aspp.bn", ap["Norm_0"]["BatchNorm_0"], as_["Norm_0"]["BatchNorm_0"], out)
    for i, (ti, bi) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        _emit(out, f"decoder.{ti}", _convT_inv(p[f"ConvTranspose_{i}"]))
        _bn_inv(f"decoder.{bi}", p[f"Norm_{i}"]["BatchNorm_0"],
                s[f"Norm_{i}"]["BatchNorm_0"], out)
    _emit(out, "decoder.12", _conv_inv(p["Conv_0"]["Conv_0"]))
    return out


def export_reference_yoloseg(variables: Mapping) -> Dict:
    """Inverse of `import_reference_yoloseg` (`Main_Final.py:436-510`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    for i, ci in enumerate([0, 4, 8, 11, 14, 18, 21, 24]):
        _convbnact_inv(f"backbone.{ci}", f"backbone.{ci + 1}",
                       p[f"ConvBNAct_{i}"], s[f"ConvBNAct_{i}"], out)
    for i, (ti, bi) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        _emit(out, f"seg_head.{ti}", _convT_inv(p[f"ConvTranspose_{i}"]))
        _bn_inv(f"seg_head.{bi}", p[f"Norm_{i}"]["BatchNorm_0"],
                s[f"Norm_{i}"]["BatchNorm_0"], out)
    _emit(out, "seg_head.12", _conv_inv(p["Conv_0"]["Conv_0"]))
    return out


def _pyramid_pooling_inv(prefix: str, p, s, out: Dict, n_branches: int = 4):
    for i in range(n_branches):
        _emit(out, f"{prefix}.convs.{i}.1", _conv_inv(p[f"Conv_{i}"]["Conv_0"]))
        _bn_inv(f"{prefix}.convs.{i}.2", p[f"Norm_{i}"]["BatchNorm_0"],
                s[f"Norm_{i}"]["BatchNorm_0"], out)


def export_reference_pspnet(variables: Mapping) -> Dict:
    """Inverse of `import_reference_pspnet` (`comne.py:243-299`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    for i, name in enumerate(["conv1", "conv2", "conv3", "conv4"]):
        _convbnact_inv(f"{name}.0", f"{name}.1",
                       p[f"ConvBNAct_{i}"], s[f"ConvBNAct_{i}"], out)
    _pyramid_pooling_inv("ppm", p["PyramidPooling_0"], s["PyramidPooling_0"], out)
    _convbnact_inv("final_conv.0", "final_conv.1",
                   p["ConvBNAct_4"], s["ConvBNAct_4"], out)
    _emit(out, "final_conv.4", _conv_inv(p["Conv_0"]["Conv_0"]))
    return out


def _dsconv_inv(prefix: str, p, s, out: Dict):
    _emit(out, f"{prefix}.depthwise", _conv_inv(p["Conv_0"]["Conv_0"]))
    _emit(out, f"{prefix}.pointwise", _conv_inv(p["Conv_1"]["Conv_0"]))
    _bn_inv(f"{prefix}.bn", p["Norm_0"]["BatchNorm_0"], s["Norm_0"]["BatchNorm_0"], out)


def export_reference_fastscnn(variables: Mapping) -> Dict:
    """Inverse of `import_reference_fastscnn` (`comne.py:447-476`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    _convbnact_inv("learning_to_downsample.conv1.0",
                   "learning_to_downsample.conv1.1",
                   p["ConvBNAct_0"], s["ConvBNAct_0"], out)
    ds_prefixes = (
        ["learning_to_downsample.dsconv1", "learning_to_downsample.dsconv2"]
        + [f"global_feature_extractor.block1.{j}" for j in range(3)]
        + [f"global_feature_extractor.block2.{j}" for j in range(3)]
        + [f"global_feature_extractor.block3.{j}" for j in range(3)]
    )
    for i, prefix in enumerate(ds_prefixes):
        _dsconv_inv(prefix, p[f"DepthwiseSeparableConv_{i}"],
                    s[f"DepthwiseSeparableConv_{i}"], out)
    _pyramid_pooling_inv("global_feature_extractor.ppm",
                         p["PyramidPooling_0"], s["PyramidPooling_0"], out)
    for i, seq in enumerate(["conv_low", "conv_high"]):
        _emit(out, f"feature_fusion.{seq}.0", _conv_inv(p[f"Conv_{i}"]["Conv_0"]))
        _bn_inv(f"feature_fusion.{seq}.1", p[f"Norm_{i}"]["BatchNorm_0"],
                s[f"Norm_{i}"]["BatchNorm_0"], out)
    for i, name in enumerate(["conv1", "conv2"]):
        _dsconv_inv(f"classifier.{name}", p[f"DepthwiseSeparableConv_{11 + i}"],
                    s[f"DepthwiseSeparableConv_{11 + i}"], out)
    _emit(out, "classifier.conv3", _conv_inv(p["Conv_2"]["Conv_0"]))
    return out


def _enet_bottleneck_inv(prefix: str, p, s, out: Dict, downsample: bool,
                         asymmetric: bool):
    i = 0
    if downsample:
        _emit(out, f"{prefix}.conv_down.0", _conv_inv(p["Conv_0"]["Conv_0"]))
        _bn_inv(f"{prefix}.conv_down.1", p["Norm_0"]["BatchNorm_0"],
                s["Norm_0"]["BatchNorm_0"], out)
        i = 1
    _convbnact_inv(f"{prefix}.conv1.0", f"{prefix}.conv1.1",
                   p["ConvBNAct_0"], s["ConvBNAct_0"], out)
    mid = [(f"{prefix}.conv2.0", f"{prefix}.conv2.1")]
    if asymmetric:
        mid.append((f"{prefix}.conv2.3", f"{prefix}.conv2.4"))
    mid.append((f"{prefix}.conv3.0", f"{prefix}.conv3.1"))
    for conv, bn in mid:
        _emit(out, conv, _conv_inv(p[f"Conv_{i}"]["Conv_0"]))
        _bn_inv(bn, p[f"Norm_{i}"]["BatchNorm_0"], s[f"Norm_{i}"]["BatchNorm_0"], out)
        i += 1


def export_reference_enet(variables: Mapping) -> Dict:
    """Inverse of `import_reference_enet` (`comne.py:560-608`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    _emit(out, "initial.conv", _conv_inv(p["ENetInitialBlock_0"]["Conv_0"]["Conv_0"]))
    _bn_inv("initial.bn", p["ENetInitialBlock_0"]["Norm_0"]["BatchNorm_0"],
            s["ENetInitialBlock_0"]["Norm_0"]["BatchNorm_0"], out)
    blocks = [(f"encoder1.{j}", j == 0, False) for j in range(4)] + [
        (f"encoder2.{j}", j == 0, j in (3, 7)) for j in range(9)
    ]
    for i, (prefix, down, asym) in enumerate(blocks):
        _enet_bottleneck_inv(prefix, p[f"ENetBottleneck_{i}"],
                             s[f"ENetBottleneck_{i}"], out, down, asym)
    for i, (ti, bi) in enumerate([(0, 1), (3, 4)]):
        _emit(out, f"decoder.{ti}", _convT_inv(p[f"ConvTranspose_{i}"]))
        _bn_inv(f"decoder.{bi}", p[f"Norm_{i}"]["BatchNorm_0"],
                s[f"Norm_{i}"]["BatchNorm_0"], out)
    _emit(out, "decoder.6", _convT_inv(p["ConvTranspose_2"]))
    return out


def export_reference_waternet(variables: Mapping) -> Dict:
    """Inverse of `import_reference_waternet`
    (`Extended_Baseline_Comparison.py:396-473`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    wim_p, wim_s = p["WaterIndexModule_0"], s["WaterIndexModule_0"]
    _emit(out, "water_index.index_conv.0", _conv_inv(wim_p["Conv_0"]["Conv_0"]))
    _bn_inv("water_index.index_conv.1", wim_p["Norm_0"]["BatchNorm_0"],
            wim_s["Norm_0"]["BatchNorm_0"], out)
    _emit(out, "water_index.index_conv.3", _conv_inv(wim_p["Conv_1"]["Conv_0"]))
    i = 0
    for seq in ["enc1", "enc2", "enc3", "bottleneck"]:
        for ci, bi in [(0, 1), (3, 4)]:
            _convbnact_inv(f"{seq}.{ci}", f"{seq}.{bi}",
                           p[f"ConvBNAct_{i}"], s[f"ConvBNAct_{i}"], out)
            i += 1
    _emit(out, "water_attention.fc.0",
          _dense_to_1x1(p["ChannelAttention_0"]["Dense_0"]))
    _emit(out, "water_attention.fc.2",
          _dense_to_1x1(p["ChannelAttention_0"]["Dense_1"]))
    for t, (up, dec) in enumerate([("up3", "dec3"), ("up2", "dec2"), ("up1", "dec1")]):
        _emit(out, up, _convT_inv(p[f"ConvTranspose_{t}"]))
        for ci, bi in [(0, 1), (3, 4)]:
            _convbnact_inv(f"{dec}.{ci}", f"{dec}.{bi}",
                           p[f"ConvBNAct_{i}"], s[f"ConvBNAct_{i}"], out)
            i += 1
    _emit(out, "outc.0", _conv_inv(p["Conv_0"]["Conv_0"]))
    return out


def export_reference_mswnet(variables: Mapping) -> Dict:
    """Inverse of `import_reference_mswnet`
    (`Extended_Baseline_Comparison.py:497-548`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    layout = [("branch1", 0, 1), ("branch2", 0, 1), ("branch3", 0, 1),
              ("branch4", 1, 2)]
    for i, name in enumerate(["enc1", "enc2", "enc3", "enc4"]):
        mp, ms = p[f"MultiScaleBlock_{i}"], s[f"MultiScaleBlock_{i}"]
        for j, (branch, ci, bi) in enumerate(layout):
            _convbnact_inv(f"{name}.{branch}.{ci}", f"{name}.{branch}.{bi}",
                           mp[f"ConvBNAct_{j}"], ms[f"ConvBNAct_{j}"], out)
    for j, (ci, bi) in enumerate([(0, 1), (3, 4)]):
        _convbnact_inv(f"bridge.{ci}", f"bridge.{bi}",
                       p[f"ConvBNAct_{j}"], s[f"ConvBNAct_{j}"], out)
    for t, (up, dec) in enumerate([("up4", "dec4"), ("up3", "dec3"),
                                   ("up2", "dec2"), ("up1", "dec1")]):
        _emit(out, up, _convT_inv(p[f"ConvTranspose_{t}"]))
        _convbnact_inv(f"{dec}.0", f"{dec}.1",
                       p[f"ConvBNAct_{t + 2}"], s[f"ConvBNAct_{t + 2}"], out)
    _emit(out, "outc.0", _conv_inv(p["Conv_0"]["Conv_0"]))
    return out


def export_reference_hrnet_water(variables: Mapping) -> Dict:
    """Inverse of `import_reference_hrnet_water`
    (`Extended_Baseline_Comparison.py:554-616`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    i = 0
    for seq in ["stem", "hr_branch", "mr_branch", "lr_branch"]:
        for ci, bi in [(0, 1), (3, 4)]:
            _convbnact_inv(f"{seq}.{ci}", f"{seq}.{bi}",
                           p[f"ConvBNAct_{i}"], s[f"ConvBNAct_{i}"], out)
            i += 1
    for j, seq in enumerate(["mr_to_hr", "lr_to_hr"]):
        _emit(out, f"{seq}.0", _conv_inv(p[f"Conv_{j}"]["Conv_0"]))
        _bn_inv(f"{seq}.1", p[f"Norm_{j}"]["BatchNorm_0"],
                s[f"Norm_{j}"]["BatchNorm_0"], out)
    _convbnact_inv("head.0", "head.1", p["ConvBNAct_8"], s["ConvBNAct_8"], out)
    _emit(out, "head.4", _conv_inv(p["Conv_2"]["Conv_0"]))
    return out


def export_reference_segformer_lite(variables: Mapping) -> Dict:
    """Inverse of `import_reference_segformer_lite`
    (`Extended_Baseline_Comparison.py:667-744`)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict = {}
    for i in range(4):
        _convbnact_inv(f"patch_embed{i + 1}.0", f"patch_embed{i + 1}.1",
                       p[f"ConvBNAct_{i}"], s[f"ConvBNAct_{i}"], out)
    for i in range(3):
        esa = p[f"EfficientSelfAttention_{i}"]
        for j, name in enumerate(["q", "reduction", "kv", "proj"]):
            _emit(out, f"attn{i + 1}.{name}", _conv_inv(esa[f"Conv_{j}"]["Conv_0"]))
        ffn = p[f"MixFFN_{i}"]
        for j, name in enumerate(["fc1", "dwconv", "fc2"]):
            _emit(out, f"ffn{i + 1}.{name}", _conv_inv(ffn[f"Conv_{j}"]["Conv_0"]))
    for i, name in enumerate(["linear_c4", "linear_c3", "linear_c2", "linear_c1"]):
        _emit(out, name, _conv_inv(p[f"Conv_{i}"]["Conv_0"]))
    _convbnact_inv("linear_fuse.0", "linear_fuse.1",
                   p["ConvBNAct_4"], s["ConvBNAct_4"], out)
    _convbnact_inv("head.0", "head.1", p["ConvBNAct_5"], s["ConvBNAct_5"], out)
    _emit(out, "head.3", _conv_inv(p["Conv_4"]["Conv_0"]))
    return out


# Registry-canonical model name -> exporter (inverse of REFERENCE_IMPORTERS).
REFERENCE_EXPORTERS = {
    "UNet": export_reference_unet,
    "Robust UNet": export_reference_robust_unet,
    "SegNet": export_reference_segnet,
    "DeepLabV3+": export_reference_deeplabv3plus,
    "YOLO-SEG": export_reference_yoloseg,
    "PSPNet": export_reference_pspnet,
    "Fast-SCNN": export_reference_fastscnn,
    "ENet": export_reference_enet,
    "WaterNet": export_reference_waternet,
    "MSWNet": export_reference_mswnet,
    "HRNet-Water": export_reference_hrnet_water,
    "SegFormer-Lite": export_reference_segformer_lite,
}


def save_reference_pth(variables: Mapping, path: str, arch: str = "unet") -> None:
    """Write coastline variables as a reference-loadable torch `.pth`.

    arch: any registry name or alias ('unet' is the production 2-class
    checkpoint the reference GUI/trainer consume). Tensors are saved f32."""
    import torch

    from coastline.models.registry import canonical_name

    name = canonical_name(arch)
    if name not in REFERENCE_EXPORTERS:
        raise KeyError(
            f"no exporter for {arch!r}; known: {sorted(REFERENCE_EXPORTERS)}"
        )
    sd = {
        k: (torch.from_numpy(np.array(v, np.float32))  # copy: owns its memory
            if np.asarray(v).ndim else torch.tensor(v))
        for k, v in REFERENCE_EXPORTERS[name](variables).items()
    }
    torch.save(sd, path)


def load_reference_pth(path: str, arch: str = None) -> Dict:
    """Load a torch .pth file and convert (torch import gated here).

    The architecture is auto-detected from the state_dict (any of the 12
    reference models); pass `arch` to pin it. Returns the variables dict —
    use `import_reference_checkpoint` when the caller also needs the
    detected model name."""
    import torch

    return import_reference_checkpoint(torch.load(path, map_location="cpu"), arch)[1]
