"""Int8 post-training quantization for the model zoo (TPU-native).

The reference serves fp32 torch (`/root/reference/predict_coastline.py`);
this module is a deployment-grade speed path beyond reference parity.
All 12 reference architectures fold and quantize (`ARCHS`); the design
notes below are written against the flagship RobustUNet, whose op set
(deep convs, CBAM epilogues, ConvT decoder) drove the policy choices.
Inference on one v5e is HBM-bandwidth-bound at ~56-58% of peak
(docs/TRAIN_ROOFLINE.md): activations in int8 halve the remaining traffic
and the MXU runs int8 matmuls at 2x bf16 throughput (394 TOPS). Probed on
the real chip before this was built (`scripts/probe_int8.py`): a deep
3x3 conv (64², C=512) runs 1.89x faster as s8xs8->s32, and the full-res
C=64 conv is unchanged (it is lane-padding-bound, so quantizing it costs
nothing).

Design:
  * Eval-only. BatchNorm is folded into every conv (weights + bias in f32)
    before quantization; ConvTranspose has no BN and keeps its bias.
  * Weights: symmetric per-output-channel int8 (`step = absmax/127`).
  * Activations: symmetric per-tensor int8 at named SITES (conv inputs and
    the tensors re-read by the CBAM/gate epilogues). Scales come from a
    calibration pass that records per-site absmax on representative images.
  * One forward implementation serves three modes:
      - float mode (`scales=None`): bf16 math on the folded params. This is
        the calibration recorder AND the correctness anchor — it must match
        `RobustUNet.apply` (tests/test_quant.py).
      - int8 mode: convs with both channel dims >= 64 run s8xs8->s32 with
        the dequant/requant epilogue fused by XLA; small convs (RGB stem,
        psi/spatial-attention heads) read int8 and compute in bf16.
  * Everything is functional and jit-friendly: static shapes, no Python
    branching on traced values.

The quantized path is exact RobustUNet semantics otherwise: the CBAM
channel gate pools the conv2 output, the spatial gate reduces the gated
tensor (computed from the int8 representation and the f32 gate vector),
and the residual add + ReLU requantizes straight to the next block's input
scale — the big activations only ever cross HBM as int8.

Reference architecture being quantized: `/root/reference/Main_Final.py:226-321`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_EPS = 1e-5  # BatchNorm epsilon (torch default, matches ops.primitives)


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------


def _bn_affine(params, stats):
    """Per-channel (inv, shift): y_bn = y * inv + shift (eval-mode BN)."""
    scale = params["BatchNorm_0"]["scale"]
    bias = params["BatchNorm_0"]["bias"]
    mean = stats["BatchNorm_0"]["mean"]
    var = stats["BatchNorm_0"]["var"]
    inv = scale / np.sqrt(np.asarray(var, np.float64) + _EPS)
    inv = np.asarray(inv, np.float32)
    shift = np.asarray(bias - mean * inv, np.float32)
    return inv, shift


def _fold(conv_params, norm_params=None, norm_stats=None,
          inv=None, shift=None):
    """Fold an eval-mode BN affine into conv weight/bias -> (w f32, b f32)."""
    w = np.asarray(conv_params["Conv_0"]["kernel"], np.float32)
    b0 = np.asarray(conv_params["Conv_0"].get("bias", np.zeros(w.shape[-1])),
                    np.float32)
    if inv is None:
        if norm_params is None:
            return w, b0
        inv, shift = _bn_affine(norm_params, norm_stats)
    return w * inv[None, None, None, :], b0 * inv + shift


def fold_robust_unet(variables) -> Dict:
    """Fold all BatchNorms of a trained RobustUNet into conv weights.

    Returns a flat dict of layer -> (w, b) numpy f32 arrays plus the
    attention parameters, mirroring the structure the forward consumes.
    """
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {}

    for i in range(9):
        rb, rbs = p[f"ResidualBlock_{i}"], s[f"ResidualBlock_{i}"]
        has_short = "Conv_2" in rb  # 3 convs => projection shortcut exists
        if has_short:
            short = _fold(rb["Conv_0"], rb["Norm_0"], rbs["Norm_0"])
            c1 = _fold(rb["Conv_1"], rb["Norm_1"], rbs["Norm_1"])
            c2 = _fold(rb["Conv_2"], rb["Norm_2"], rbs["Norm_2"])
        else:
            short = None
            c1 = _fold(rb["Conv_0"], rb["Norm_0"], rbs["Norm_0"])
            c2 = _fold(rb["Conv_1"], rb["Norm_1"], rbs["Norm_1"])
        out[f"rb{i}"] = {
            "short": short, "c1": c1, "c2": c2,
            "fc1": np.asarray(rb["ChannelAttention_0"]["Dense_0"]["kernel"],
                              np.float32),
            "fc2": np.asarray(rb["ChannelAttention_0"]["Dense_1"]["kernel"],
                              np.float32),
            "sa": np.asarray(rb["SpatialAttention_0"]["Conv_0"]["Conv_0"]["kernel"],
                             np.float32),
        }

    db, dbs = p["DilatedBlock_0"], s["DilatedBlock_0"]
    inv, shift = _bn_affine(db["Norm_0"], dbs["Norm_0"])
    f4 = inv.shape[0] // 4
    out["db"] = {
        f"b{k}": _fold(db[f"Conv_{k}"],
                       inv=inv[k * f4:(k + 1) * f4],
                       shift=shift[k * f4:(k + 1) * f4])
        for k in range(4)
    }

    for i in range(4):
        ag, ags = p[f"AttentionGate_{i}"], s[f"AttentionGate_{i}"]
        out[f"ag{i}"] = {
            "g": _fold(ag["Conv_0"], ag["Norm_0"], ags["Norm_0"]),
            "x": _fold(ag["Conv_1"], ag["Norm_1"], ags["Norm_1"]),
            "psi": _fold(ag["Conv_2"], ag["Norm_2"], ags["Norm_2"]),
        }
        ct = p[f"ConvTranspose_{i}"]
        out[f"up{i}"] = (np.asarray(ct["kernel"], np.float32),
                         np.asarray(ct["bias"], np.float32))

    out["head"] = _fold(p["Conv_0"])
    return out


def fold_unet(variables) -> Dict:
    """Fold BNs of the production 2-class UNet (models/unet.py — the
    reference's deployment artifact, `predict_coastline.py:255-334`)."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {}
    for i in range(9):
        dc, dcs = p[f"DoubleConv_{i}"], s[f"DoubleConv_{i}"]
        out[f"dc{i}"] = {
            "c1": _fold(dc["ConvBNAct_0"]["Conv_0"], dc["ConvBNAct_0"]["Norm_0"],
                        dcs["ConvBNAct_0"]["Norm_0"]),
            "c2": _fold(dc["ConvBNAct_1"]["Conv_0"], dc["ConvBNAct_1"]["Norm_0"],
                        dcs["ConvBNAct_1"]["Norm_0"]),
        }
    for i in range(4):
        ct = p[f"ConvTranspose_{i}"]
        out[f"up{i}"] = (np.asarray(ct["kernel"], np.float32),
                         np.asarray(ct["bias"], np.float32))
    out["head"] = _fold(p["Conv_0"])
    return out


def fold_segnet(variables) -> Dict:
    """Fold BNs of SegNet (models/segnet.py, parity `comne.py:84-208`):
    19 ConvBNAct layers (flat creation order: 10 encoder, 9 decoder) and
    the 3x3 head."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {
        f"c{i}": _fold(p[f"ConvBNAct_{i}"]["Conv_0"],
                       p[f"ConvBNAct_{i}"]["Norm_0"],
                       s[f"ConvBNAct_{i}"]["Norm_0"])
        for i in range(19)
    }
    out["head"] = _fold(p["Conv_0"])
    return out


def fold_deeplabv3p(variables) -> Dict:
    """Fold BNs of DeepLabV3+ (models/deeplabv3p.py, parity
    `Main_Final.py:359-433`): 4 backbone ConvBNActs, the 6-conv ASPP (BN
    only after the fusion conv), 4 ConvTranspose+Norm decoder stages."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {
        f"c{i}": _fold(p[f"ConvBNAct_{i}"]["Conv_0"],
                       p[f"ConvBNAct_{i}"]["Norm_0"],
                       s[f"ConvBNAct_{i}"]["Norm_0"])
        for i in range(4)
    }
    aspp, aspps = p["ASPP_0"], s["ASPP_0"]
    for k in range(5):  # b1..b5: bias, no BN
        out[f"aspp_b{k}"] = _fold(aspp[f"Conv_{k}"])
    out["aspp_fuse"] = _fold(aspp["Conv_5"], aspp["Norm_0"], aspps["Norm_0"])
    for i in range(4):  # ConvTranspose + top-level Norm pairs
        ct = p[f"ConvTranspose_{i}"]
        inv, shift = _bn_affine(p[f"Norm_{i}"], s[f"Norm_{i}"])
        w = np.asarray(ct["kernel"], np.float32) * inv[None, None, None, :]
        b = np.asarray(ct["bias"], np.float32) * inv + shift
        out[f"up{i}"] = (w, b)
    out["head"] = _fold(p["Conv_0"])
    return out


def fold_waternet(variables) -> Dict:
    """Fold BNs of WaterNet (models/waternet.py, parity
    `Extended_Baseline_Comparison.py:396-473`): the water-index head
    (1x1+BN+1x1), 14 double-conv ConvBNActs, the bottleneck CBAM channel
    gate, 3 ConvTransposes, 1x1 head."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    wim, wims = p["WaterIndexModule_0"], s["WaterIndexModule_0"]
    out: Dict = {
        "wim1": _fold(wim["Conv_0"], wim["Norm_0"], wims["Norm_0"]),
        "wim2": _fold(wim["Conv_1"]),
        "ca": {
            "fc1": np.asarray(p["ChannelAttention_0"]["Dense_0"]["kernel"],
                              np.float32),
            "fc2": np.asarray(p["ChannelAttention_0"]["Dense_1"]["kernel"],
                              np.float32),
        },
    }
    for i in range(14):  # e1/e2/e3/bottleneck/d3/d2/d1 double convs, flat
        out[f"c{i}"] = _fold(p[f"ConvBNAct_{i}"]["Conv_0"],
                             p[f"ConvBNAct_{i}"]["Norm_0"],
                             s[f"ConvBNAct_{i}"]["Norm_0"])
    for i in range(3):
        ct = p[f"ConvTranspose_{i}"]
        out[f"up{i}"] = (np.asarray(ct["kernel"], np.float32),
                         np.asarray(ct["bias"], np.float32))
    out["head"] = _fold(p["Conv_0"])
    return out


def fold_pspnet(variables) -> Dict:
    """Fold BNs of PSPNet (models/pspnet.py, parity `comne.py:243-299`):
    4 strided stem ConvBNActs, the {1,2,3,6} pyramid-pool branch convs
    (Conv+BN inside PyramidPooling_0), the 512-ch fusion conv, 1x1 head."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {
        f"c{i}": _fold(p[f"ConvBNAct_{i}"]["Conv_0"],
                       p[f"ConvBNAct_{i}"]["Norm_0"],
                       s[f"ConvBNAct_{i}"]["Norm_0"])
        for i in range(5)  # c0..c3 stem, c4 post-PPM fusion
    }
    ppm, ppms = p["PyramidPooling_0"], s["PyramidPooling_0"]
    for k in range(4):
        out[f"ppm{k}"] = _fold(ppm[f"Conv_{k}"], ppm[f"Norm_{k}"],
                               ppms[f"Norm_{k}"])
    out["head"] = _fold(p["Conv_0"])
    return out


def fold_mswnet(variables) -> Dict:
    """Fold BNs of MSWNet (models/mswnet.py, parity
    `Extended_Baseline_Comparison.py:497-548`): 4 encoder MultiScaleBlocks
    (4 ConvBNAct branches each), the 2-conv 1024-ch bridge + 4 single-conv
    decoders (top-level ConvBNAct_0..5), 4 ConvTransposes, 1x1 head."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {}
    for i in range(4):
        msb, msbs = p[f"MultiScaleBlock_{i}"], s[f"MultiScaleBlock_{i}"]
        out[f"ms{i}"] = {
            f"b{k}": _fold(msb[f"ConvBNAct_{k}"]["Conv_0"],
                           msb[f"ConvBNAct_{k}"]["Norm_0"],
                           msbs[f"ConvBNAct_{k}"]["Norm_0"])
            for k in range(4)
        }
    for i in range(6):  # 2 bridge + 4 decoder convs, flat creation order
        out[f"c{i}"] = _fold(p[f"ConvBNAct_{i}"]["Conv_0"],
                             p[f"ConvBNAct_{i}"]["Norm_0"],
                             s[f"ConvBNAct_{i}"]["Norm_0"])
    for i in range(4):
        ct = p[f"ConvTranspose_{i}"]
        out[f"up{i}"] = (np.asarray(ct["kernel"], np.float32),
                         np.asarray(ct["bias"], np.float32))
    out["head"] = _fold(p["Conv_0"])
    return out


def fold_yoloseg(variables) -> Dict:
    """Fold BNs of YOLOSeg (models/yoloseg.py, parity
    `Main_Final.py:436-510`): 8 Darknet-ish ConvBNActs (LeakyReLU 0.1),
    4 ConvTranspose+Norm decoder stages (BN folded into the ConvT like
    DeepLabV3+'s decoder), 3x3 head."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {
        f"c{i}": _fold(p[f"ConvBNAct_{i}"]["Conv_0"],
                       p[f"ConvBNAct_{i}"]["Norm_0"],
                       s[f"ConvBNAct_{i}"]["Norm_0"])
        for i in range(8)
    }
    for i in range(4):
        ct = p[f"ConvTranspose_{i}"]
        inv, shift = _bn_affine(p[f"Norm_{i}"], s[f"Norm_{i}"])
        w = np.asarray(ct["kernel"], np.float32) * inv[None, None, None, :]
        b = np.asarray(ct["bias"], np.float32) * inv + shift
        out[f"up{i}"] = (w, b)
    out["head"] = _fold(p["Conv_0"])
    return out


def fold_hrnet_water(variables) -> Dict:
    """Fold BNs of HRNet-Water (models/hrnet_water.py, parity
    `Extended_Baseline_Comparison.py:554-616`): 2 stem + 2/2/2 branch
    ConvBNActs, the two 1x1 fuse projections (Conv+top-level Norm), the
    post-fusion ConvBNAct, 1x1 head."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {
        f"c{i}": _fold(p[f"ConvBNAct_{i}"]["Conv_0"],
                       p[f"ConvBNAct_{i}"]["Norm_0"],
                       s[f"ConvBNAct_{i}"]["Norm_0"])
        for i in range(9)  # c0-1 stem, c2-3 hr, c4-5 mr, c6-7 lr, c8 fuse
    }
    out["mr_proj"] = _fold(p["Conv_0"], p["Norm_0"], s["Norm_0"])
    out["lr_proj"] = _fold(p["Conv_1"], p["Norm_1"], s["Norm_1"])
    out["head"] = _fold(p["Conv_2"])
    return out


def fold_fastscnn(variables) -> Dict:
    """Fold BNs of Fast-SCNN (models/fastscnn.py, parity
    `comne.py:323-476`): the downsample stem ConvBNAct, 13 ds-convs (BN
    folds into the POINTWISE 1x1; the depthwise 3x3 has neither bias nor
    BN and is kept as-is with a zero bias), the {1,2,3,6} pyramid branch
    convs, both 128-ch fusion projections (Conv+top-level Norm), 1x1 head."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {"c0": _fold(p["ConvBNAct_0"]["Conv_0"],
                             p["ConvBNAct_0"]["Norm_0"],
                             s["ConvBNAct_0"]["Norm_0"])}
    for i in range(13):
        ds, dss = p[f"DepthwiseSeparableConv_{i}"], \
            s[f"DepthwiseSeparableConv_{i}"]
        wdw = np.asarray(ds["Conv_0"]["Conv_0"]["kernel"], np.float32)
        out[f"ds{i}"] = {
            "dw": (wdw, np.zeros(wdw.shape[-1], np.float32)),
            "pw": _fold(ds["Conv_1"], ds["Norm_0"], dss["Norm_0"]),
        }
    ppm, ppms = p["PyramidPooling_0"], s["PyramidPooling_0"]
    for k in range(4):
        out[f"ppm{k}"] = _fold(ppm[f"Conv_{k}"], ppm[f"Norm_{k}"],
                               ppms[f"Norm_{k}"])
    out["low_proj"] = _fold(p["Conv_0"], p["Norm_0"], s["Norm_0"])
    out["high_proj"] = _fold(p["Conv_1"], p["Norm_1"], s["Norm_1"])
    out["head"] = _fold(p["Conv_2"])
    return out


#: ENet encoder layout (models/enet.py): (kind, dilation) per bottleneck.
_ENET_SPECS = (
    ("down", 1), ("reg", 1), ("reg", 1), ("reg", 1),       # enc1, 64ch
    ("down", 1), ("reg", 1), ("reg", 2), ("asym", 1),      # enc2, 128ch
    ("reg", 4), ("reg", 1), ("reg", 8), ("asym", 1), ("reg", 16),
)


def fold_enet(variables) -> Dict:
    """Fold BNs of ENet (models/enet.py, parity `comne.py:482-608`).

    The initial block's BN spans the concat of conv (13ch) and maxpool
    (3ch) channels: the conv slice folds into the conv, the pool slice is
    kept as an explicit (inv, shift) affine applied to the pooled input.
    Bottlenecks fold per their kind (regular / asymmetric 5x1+1x5 /
    downsample with its maxpool+1x1 projection); the 2 ConvTranspose+Norm
    decoder stages fold like DeepLabV3+'s, the final ConvT keeps its bias."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    ib, ibs = p["ENetInitialBlock_0"], s["ENetInitialBlock_0"]
    inv, shift = _bn_affine(ib["Norm_0"], ibs["Norm_0"])
    ncv = ib["Conv_0"]["Conv_0"]["kernel"].shape[-1]  # 13 conv channels
    out: Dict = {"init": {
        "conv": _fold(ib["Conv_0"], inv=inv[:ncv], shift=shift[:ncv]),
        "pool_inv": inv[ncv:], "pool_shift": shift[ncv:],
    }}
    for i, (kind, _) in enumerate(_ENET_SPECS):
        bn, bns = p[f"ENetBottleneck_{i}"], s[f"ENetBottleneck_{i}"]
        entry = {"reduce": _fold(bn["ConvBNAct_0"]["Conv_0"],
                                 bn["ConvBNAct_0"]["Norm_0"],
                                 bns["ConvBNAct_0"]["Norm_0"])}
        if kind == "down":
            entry["proj"] = _fold(bn["Conv_0"], bn["Norm_0"], bns["Norm_0"])
            entry["mid1"] = _fold(bn["Conv_1"], bn["Norm_1"], bns["Norm_1"])
            entry["expand"] = _fold(bn["Conv_2"], bn["Norm_2"], bns["Norm_2"])
        elif kind == "asym":
            entry["mid1"] = _fold(bn["Conv_0"], bn["Norm_0"], bns["Norm_0"])
            entry["mid2"] = _fold(bn["Conv_1"], bn["Norm_1"], bns["Norm_1"])
            entry["expand"] = _fold(bn["Conv_2"], bn["Norm_2"], bns["Norm_2"])
        else:
            entry["mid1"] = _fold(bn["Conv_0"], bn["Norm_0"], bns["Norm_0"])
            entry["expand"] = _fold(bn["Conv_1"], bn["Norm_1"], bns["Norm_1"])
        out[f"bn{i}"] = entry
    for i in range(2):
        ct = p[f"ConvTranspose_{i}"]
        inv, shift = _bn_affine(p[f"Norm_{i}"], s[f"Norm_{i}"])
        w = np.asarray(ct["kernel"], np.float32) * inv[None, None, None, :]
        b = np.asarray(ct["bias"], np.float32) * inv + shift
        out[f"up{i}"] = (w, b)
    ct = p["ConvTranspose_2"]
    out["head"] = (np.asarray(ct["kernel"], np.float32),
                   np.asarray(ct["bias"], np.float32))
    return out


def fold_segformer_lite(variables) -> Dict:
    """Fold BNs of SegFormer-Lite (models/segformer_lite.py, parity
    `Extended_Baseline_Comparison.py:667-744`): 4 patch-embed ConvBNActs
    (BN folds into the conv; GELU stays in the forward), the attention /
    Mix-FFN blocks are BN-free (biases kept), the all-MLP decoder's two
    ConvBNActs fold, the four 1x1 stage projections and head keep biases."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    out: Dict = {
        f"c{i}": _fold(p[f"ConvBNAct_{i}"]["Conv_0"],
                       p[f"ConvBNAct_{i}"]["Norm_0"],
                       s[f"ConvBNAct_{i}"]["Norm_0"])
        for i in range(6)  # c0-3 patch embeds, c4 fuse, c5 head conv
    }
    for i in range(3):
        esa = p[f"EfficientSelfAttention_{i}"]
        out[f"esa{i}"] = {
            "q": _fold(esa["Conv_0"]), "sr": _fold(esa["Conv_1"]),
            "kv": _fold(esa["Conv_2"]), "proj": _fold(esa["Conv_3"]),
        }
        ffn = p[f"MixFFN_{i}"]
        out[f"ffn{i}"] = {
            "c1": _fold(ffn["Conv_0"]), "dw": _fold(ffn["Conv_1"]),
            "c2": _fold(ffn["Conv_2"]),
        }
    for i in range(4):  # f4, f3, f2, f1 decoder projections
        out[f"f{4 - i}"] = _fold(p[f"Conv_{i}"])
    out["head"] = _fold(p["Conv_4"])
    return out


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------


def _quant_w(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8: w ~= wq * step[None,None,None,:]."""
    absmax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
    step = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    wq = np.clip(np.round(w / step), -127, 127).astype(np.int8)
    return wq, step


def quantize_folded(folded: Dict) -> Dict:
    """Add (wq, step) int8 views beside every conv in a folded tree."""

    def q(entry):
        if entry is None:
            return None
        w, b = entry
        wq, step = _quant_w(w)
        return {"w": w, "b": b, "wq": wq, "wstep": step}

    out = {}
    for k, v in folded.items():
        if isinstance(v, dict):
            out[k] = {kk: (q(vv) if isinstance(vv, tuple) or vv is None
                           else vv) for kk, vv in v.items()}
        else:
            out[k] = q(v)
    return out


# ---------------------------------------------------------------------------
# Forward (shared float / int8 implementation)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _QT:
    """A tensor either in float form or as (int8 codes, dequant step)."""

    q: jnp.ndarray
    step: Optional[jnp.ndarray] = None  # None => q is float

    def f(self, dtype=jnp.bfloat16):
        if self.step is None:
            return self.q.astype(dtype)
        return self.q.astype(dtype) * self.step.astype(dtype)



#: Which ops run s8xs8->s32 on the MXU (vs reading int8 + computing bf16).
#: Tuned from on-chip per-op probes (scripts/probe_int8_ops.py).
DEFAULT_POLICY = {
    "conv_min_ch": 64,   # int8 conv iff min(C_in, C_out) >= this
    "convT_int8": True,  # int8 path for lhs-dilated (transposed) convs
    # Round-4 experiment, measured NEGATIVE (artifacts/quant_experiments.
    # json): quantizing the CBAM gated tensor at its own `.gated` site
    # ADDS cost-model bytes (1.678 -> 1.896 GB/img) and loses 10% end to
    # end (265 -> 240 img/s) — the round/clip requant pass does not fuse
    # with the three consumers, so it buys an extra pass instead of
    # halving one. Kept off; the sites still calibrate for artifact
    # compatibility and future XLA re-evaluation.
    "gated_int8": False,
    # Round-4 experiment, INFEASIBLE at production shape: splitting the
    # decoder `conv(concat(skip, up))` into two s8 convs summed
    # in-register eliminates the cat requant — but XLA can fuse a dequant
    # epilogue only into a single-conv fusion root, so one conv's raw s32
    # accumulator materializes ((64,512,512,64) s32 = 8 GB with 2x layout
    # padding) and the AOT compile exhausts HBM (quant_exp2 log, round
    # 4). The single-conv cat path already fuses dequant->concat->requant
    # into one s8 elementwise pass, which is why the attribution shows no
    # bf16 concat buffers. Works at small shapes; off for production.
    "split_cat": False,
}


class _Ctx:
    """Carries mode (float-calibration vs int8) + scales + absmax records."""

    def __init__(self, scales: Optional[Dict[str, float]], collect=None,
                 dtype=jnp.bfloat16, policy: Optional[Dict] = None):
        self.scales = scales
        self.collect = collect  # dict to fill with traced absmax scalars
        self.dtype = dtype  # float-path compute dtype (f32 for anchor tests)
        self.policy = dict(DEFAULT_POLICY, **(policy or {}))

    @property
    def quant(self):
        return self.scales is not None

    def site(self, name: str, t: jnp.ndarray, optional: bool = False) -> _QT:
        """Quantize float tensor `t` at a named site (or record its range).

        `optional=True` marks sites added after artifacts already shipped
        (e.g. the round-4 CBAM `.gated` sites): calibration always records
        them, but int8 mode quantizes only when the loaded scale dict has
        the site — older `.npz` bundles keep their bf16 behavior instead
        of KeyErroring."""
        if self.collect is not None:
            m = jnp.max(jnp.abs(t.astype(jnp.float32)))
            prev = self.collect.get(name)
            self.collect[name] = m if prev is None else jnp.maximum(prev, m)
        if not self.quant or (optional and name not in self.scales):
            return _QT(t.astype(self.dtype))
        step = jnp.float32(self.scales[name] / 127.0)
        q = jnp.clip(jnp.round(t.astype(jnp.float32) / step), -127, 127)
        return _QT(q.astype(jnp.int8), step)


def _conv(ctx: _Ctx, x: _QT, entry, stride=1, padding=0, dilation=1,
          lhs_dilation=None, groups=1) -> jnp.ndarray:
    """Conv on a site tensor -> float (f32) output with bias, epilogue-ready.

    int8 path when the context is quantized, the input is int8, and both
    channel dims are >=64 (smaller convs gain nothing on the MXU; they
    still read the int8 input, so traffic stays halved). Grouped/depthwise
    convs (groups > 1) always take the float path — their per-group
    contraction depth is too small for the MXU's s8 pipeline to pay.
    """
    if isinstance(entry, dict):
        w, b, wq, wstep = entry["w"], entry["b"], entry["wq"], entry["wstep"]
    else:
        w, b = entry
        wq = wstep = None
    kh, kw, cin, cout = w.shape
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) \
        else padding
    dn = ("NHWC", "HWIO", "NHWC")
    use_int8 = (ctx.quant and x.step is not None and wq is not None
                and groups == 1
                and min(cin, cout) >= ctx.policy["conv_min_ch"]
                and (lhs_dilation is None or ctx.policy["convT_int8"]))
    # The epilogue's f32 math lives in-register inside the conv fusion; the
    # RESULT is cast to the compute dtype before anything is written — a
    # full-resolution f32 tensor in HBM costs 2x passes and measured 6x
    # end-to-end on the first version of this graph (see bench_quant.py).
    if use_int8:
        acc = lax.conv_general_dilated(
            x.q, jnp.asarray(wq), (stride, stride), pad,
            lhs_dilation=lhs_dilation, rhs_dilation=(dilation, dilation),
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (x.step * jnp.asarray(wstep)) + b
        return y.astype(ctx.dtype)
    y = lax.conv_general_dilated(
        x.f(ctx.dtype), jnp.asarray(w, ctx.dtype), (stride, stride), pad,
        lhs_dilation=lhs_dilation, rhs_dilation=(dilation, dilation),
        dimension_numbers=dn, feature_group_count=groups)
    return y + jnp.asarray(b, ctx.dtype)


def _conv_cat(ctx: _Ctx, a: _QT, b: _QT, entry, stride=1, padding=0):
    """`conv(concat([a, b], -1), W)` without materializing the concat.

    int8 path: the kernel splits along C_in and each part convolves the
    operand's OWN s8 codes (their sites already exist: ag/up/dc outputs);
    the two s32 accumulators dequant-sum with their own scales,
    eliminating the `.cat`-site requant and its rounding. MEASURED
    NEGATIVE at production shape (see DEFAULT_POLICY["split_cat"]): the
    two-conv sum denies XLA its single-root epilogue fusion, so an s32
    accumulator materializes at 4x the s8 size and the 512^2 B>=64
    compile exhausts HBM. Kept for small-shape use and as the recorded
    experiment; callers keep the `.cat`-site path for the
    float/calibration anchor and whenever the policy disables the
    split."""
    if isinstance(entry, dict):
        w, bias, wq, wstep = entry["w"], entry["b"], entry["wq"], entry["wstep"]
    else:
        (w, bias), wq, wstep = entry, None, None
    c0 = a.q.shape[-1]
    cout = w.shape[-1]
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) \
        else padding
    dn = ("NHWC", "HWIO", "NHWC")
    use_int8 = (ctx.quant and a.step is not None and b.step is not None
                and wq is not None
                and min(c0, w.shape[2] - c0, cout) >= ctx.policy["conv_min_ch"])
    if not use_int8:
        xcat = _QT(jnp.concatenate([a.f(ctx.dtype), b.f(ctx.dtype)], axis=-1))
        return _conv(ctx, xcat, entry, stride=stride, padding=padding)
    wq = jnp.asarray(wq)
    acc1 = lax.conv_general_dilated(
        a.q, wq[:, :, :c0, :], (stride, stride), pad,
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    acc2 = lax.conv_general_dilated(
        b.q, wq[:, :, c0:, :], (stride, stride), pad,
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    wstep = jnp.asarray(wstep)
    y = (acc1.astype(jnp.float32) * (a.step * wstep)
         + acc2.astype(jnp.float32) * (b.step * wstep) + bias)
    return y.astype(ctx.dtype)


def _maxpool(x: _QT, window: int = 2, stride: int = 2,
             padding: int = 0) -> _QT:
    """Max pool directly on the codes (monotonic under dequant)."""
    init = jnp.int8(-128) if x.step is not None else -jnp.inf
    y = lax.reduce_window(x.q, init, lax.max, (1, window, window, 1),
                          (1, stride, stride, 1),
                          ((0, 0), (padding, padding), (padding, padding),
                           (0, 0)))
    return _QT(y, x.step)


def _residual_block(ctx: _Ctx, name: str, x: _QT, p, pair=None) -> _QT:
  """`pair=(a, b)`: the block's input is concat([a, b], -1) — the two
  input convs run via `_conv_cat` so the concat never materializes
  (int8 split_cat path). `x` is ignored when `pair` is given."""
  with jax.named_scope(name):
    dt = ctx.dtype
    if pair is not None:
        assert p["short"] is not None, "concat blocks change channels"
        short = ctx.site(f"{name}.short", _conv_cat(ctx, *pair, p["short"]))
        t1 = jax.nn.relu(_conv_cat(ctx, *pair, p["c1"], padding=1))
    else:
        if p["short"] is not None:
            short = ctx.site(f"{name}.short", _conv(ctx, x, p["short"]))
        else:
            short = x
        t1 = jax.nn.relu(_conv(ctx, x, p["c1"], padding=1))
    t1 = ctx.site(f"{name}.t1", t1)
    mid = ctx.site(f"{name}.mid", _conv(ctx, t1, p["c2"], padding=1))

    # CBAM channel gate. Full-resolution tensors stay in the compute dtype
    # (int8 codes / bf16) — f32 appears only as reduction accumulators and
    # on the pooled (N, C) vectors. An f32 materialization here measured a
    # 6x end-to-end regression (bench_quant.py round-3 log).
    # Pool the raw codes (reads int8, f32 accumulator); dequant the tiny
    # pooled vectors exactly. Mean/max commute with the positive step.
    avg = jnp.mean(mid.q, axis=(1, 2), dtype=jnp.float32)
    mx = jnp.max(mid.q, axis=(1, 2)).astype(jnp.float32)
    if mid.step is not None:
        avg = avg * mid.step
        mx = mx * mid.step
    fc1 = jnp.asarray(p["fc1"], jnp.float32)
    fc2 = jnp.asarray(p["fc2"], jnp.float32)
    gate = jax.nn.relu(avg @ fc1) @ fc2 + jax.nn.relu(mx @ fc1) @ fc2
    gc = jax.nn.sigmoid(gate).astype(dt)  # (N, C)

    # CBAM spatial gate on the channel-gated tensor. The gated tensor is
    # re-read by the channel mean/max AND the residual output, so it
    # crosses HBM as int8 at its own site when the policy + scales allow
    # (DEFAULT_POLICY["gated_int8"]); the per-tensor step commutes with
    # the channel-axis reductions.
    gated_f = mid.f(dt) * gc[:, None, None, :]
    if ctx.quant and not ctx.policy.get("gated_int8", True):
        gq = _QT(gated_f)  # policy-disabled: bf16 gated (round-3 graph)
    else:
        gq = ctx.site(f"{name}.gated", gated_f, optional=True)
    gb = gq.f(dt)
    att = jnp.stack([jnp.mean(gb, axis=-1, dtype=jnp.float32).astype(dt),
                     jnp.max(gb, axis=-1)], axis=-1)  # (N, H, W, 2)
    sa = lax.conv_general_dilated(
        att, jnp.asarray(p["sa"], dt),
        (1, 1), ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gs = jax.nn.sigmoid(sa)  # (N, H, W, 1), compute dtype like the model

    out = jax.nn.relu(gb * gs + short.f(dt))
    return ctx.site(f"{name}.out", out)


def _attention_gate(ctx: _Ctx, name: str, g: _QT, x: _QT, p) -> _QT:
  with jax.named_scope(name):
    g1 = _conv(ctx, g, p["g"])
    x1 = _conv(ctx, x, p["x"])
    psi = ctx.site(f"{name}.psi", jax.nn.relu(g1 + x1))
    psi = _conv(ctx, psi, p["psi"])
    gate = jax.nn.sigmoid(psi.astype(jnp.float32)).astype(ctx.dtype)
    return ctx.site(f"{name}.out", x.f(ctx.dtype) * gate)


def _double_conv(ctx: _Ctx, name: str, x: _QT, p, pair=None) -> _QT:
  with jax.named_scope(name):
    if pair is not None:
        t1_raw = _conv_cat(ctx, *pair, p["c1"], padding=1)
    else:
        t1_raw = _conv(ctx, x, p["c1"], padding=1)
    t1 = ctx.site(f"{name}.t1", jax.nn.relu(t1_raw))
    return ctx.site(f"{name}.out", jax.nn.relu(_conv(ctx, t1, p["c2"], padding=1)))


def _forward_unet(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                  policy=None):
    """Plain-UNet forward on folded params (logits out, torch concat order
    [up, skip] — models/unet.py)."""
    ctx = _Ctx(scales, collect, dtype, policy)
    cur = ctx.site("input", x.astype(jnp.float32))
    enc = []
    for i in range(4):
        cur = _double_conv(ctx, f"dc{i}", cur, qp[f"dc{i}"])
        enc.append(cur)
        cur = _maxpool(cur)
    cur = _double_conv(ctx, "dc4", cur, qp["dc4"])
    for i in range(4):
        up = _conv(ctx, cur, qp[f"up{i}"], lhs_dilation=(2, 2),
                   padding=((1, 1), (1, 1)))
        up = ctx.site(f"up{i}.out", up)
        skip = enc[3 - i]
        if (ctx.quant and ctx.policy.get("split_cat", True)
                and up.step is not None and skip.step is not None):
            cur = _double_conv(ctx, f"dc{5 + i}", None, qp[f"dc{5 + i}"],
                               pair=(up, skip))
        else:
            cat = ctx.site(f"cat{i}", jnp.concatenate(
                [up.f(ctx.dtype), skip.f(ctx.dtype)], axis=-1))
            cur = _double_conv(ctx, f"dc{5 + i}", cat, qp[f"dc{5 + i}"])
    return _conv(ctx, cur, qp["head"]).astype(jnp.float32)


def _forward(qp, scales, x, collect=None, dtype=jnp.bfloat16, policy=None):
    """Shared RobustUNet forward. scales=None -> float/calibration mode."""
    ctx = _Ctx(scales, collect, dtype, policy)
    xin = ctx.site("input", x.astype(jnp.float32))

    enc = [None] * 5
    cur = xin
    for i in range(4):
        cur = _residual_block(ctx, f"rb{i}", cur, qp[f"rb{i}"])
        enc[i] = cur
        cur = _maxpool(cur)

    # Bottleneck: 4-branch dilated block -> BN(folded) -> ReLU -> RB4
    branches = [
        _conv(ctx, cur, qp["db"]["b0"]),
        _conv(ctx, cur, qp["db"]["b1"], padding=1, dilation=1),
        _conv(ctx, cur, qp["db"]["b2"], padding=2, dilation=2),
        _conv(ctx, cur, qp["db"]["b3"], padding=4, dilation=4),
    ]
    cur = ctx.site("db.out", jax.nn.relu(jnp.concatenate(branches, axis=-1)))
    cur = _residual_block(ctx, "rb4", cur, qp["rb4"])

    for i in range(4):
        up = _conv(ctx, cur, qp[f"up{i}"], lhs_dilation=(2, 2),
                   padding=((1, 1), (1, 1)))
        up = ctx.site(f"up{i}.out", up)
        skip = _attention_gate(ctx, f"ag{i}", up, enc[3 - i], qp[f"ag{i}"])
        if (ctx.quant and ctx.policy.get("split_cat", True)
                and skip.step is not None and up.step is not None):
            cur = _residual_block(ctx, f"rb{5 + i}", None, qp[f"rb{5 + i}"],
                                  pair=(skip, up))
        else:
            cat = ctx.site(f"cat{i}", jnp.concatenate(
                [skip.f(ctx.dtype), up.f(ctx.dtype)], axis=-1))
            cur = _residual_block(ctx, f"rb{5 + i}", cat, qp[f"rb{5 + i}"])

    return _conv(ctx, cur, qp["head"]).astype(jnp.float32)


def _forward_segnet(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                    policy=None):
    """SegNet forward on folded params. The index-preserving unpool runs
    directly on the int8 CODES: placing codes and zero-filling commutes
    with dequantization (0 dequantizes to 0.0 under symmetric quant)."""
    from coastline.ops.primitives import max_pool_with_indices, max_unpool

    ctx = _Ctx(scales, collect, dtype, policy)
    cur = ctx.site("input", x.astype(jnp.float32))
    k = 0

    def convs(cur, n):
        nonlocal k
        for _ in range(n):
            cur = ctx.site(f"c{k}", jax.nn.relu(
                _conv(ctx, cur, qp[f"c{k}"], padding=1)))
            k += 1
        return cur

    idx = []
    for n in (2, 2, 3, 3):
        cur = convs(cur, n)
        q, i = max_pool_with_indices(cur.q)
        idx.append(i)
        cur = _QT(q, cur.step)
    for n, i in zip((3, 3, 2), (idx[3], idx[2], idx[1])):
        cur = _QT(max_unpool(cur.q, i), cur.step)
        cur = convs(cur, n)
    cur = _QT(max_unpool(cur.q, idx[0]), cur.step)
    cur = convs(cur, 1)
    return _conv(ctx, cur, qp["head"], padding=1).astype(jnp.float32)


def _forward_deeplabv3p(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                        policy=None):
    """DeepLabV3+ forward on folded params: strided stem, ASPP (the global
    branch pools the codes and broadcasts its 1x1-conv output), 4
    ConvTranspose+BN(folded)+ReLU decoder stages."""
    ctx = _Ctx(scales, collect, dtype, policy)
    cur = ctx.site("input", x.astype(jnp.float32))
    cur = ctx.site("c0", jax.nn.relu(
        _conv(ctx, cur, qp["c0"], stride=2, padding=3)))
    cur = _maxpool(cur, window=3, stride=2, padding=1)
    cur = ctx.site("c1", jax.nn.relu(_conv(ctx, cur, qp["c1"], padding=1)))
    cur = ctx.site("c2", jax.nn.relu(
        _conv(ctx, cur, qp["c2"], stride=2, padding=1)))
    cur = ctx.site("c3", jax.nn.relu(
        _conv(ctx, cur, qp["c3"], stride=2, padding=1)))

    n, h, w, _ = cur.q.shape
    branches = [
        _conv(ctx, cur, qp["aspp_b0"]),
        _conv(ctx, cur, qp["aspp_b1"], padding=6, dilation=6),
        _conv(ctx, cur, qp["aspp_b2"], padding=12, dilation=12),
        _conv(ctx, cur, qp["aspp_b3"], padding=18, dilation=18),
    ]
    # global branch: pool the codes, 1x1-conv the tiny (N, C) vector in f32,
    # broadcast back (bilinear resize of a 1x1 map IS a broadcast)
    pooled = jnp.mean(cur.q, axis=(1, 2), dtype=jnp.float32)
    if cur.step is not None:
        pooled = pooled * cur.step
    wb5, bb5 = (qp["aspp_b4"]["w"], qp["aspp_b4"]["b"]) \
        if isinstance(qp["aspp_b4"], dict) else qp["aspp_b4"]
    v = pooled @ jnp.asarray(wb5, jnp.float32)[0, 0] + bb5
    branches.append(jnp.broadcast_to(v[:, None, None, :].astype(ctx.dtype),
                                     (n, h, w, v.shape[-1])))
    cat = ctx.site("aspp.cat", jnp.concatenate(branches, axis=-1))
    cur = ctx.site("aspp.out", jax.nn.relu(_conv(ctx, cat, qp["aspp_fuse"])))

    for i in range(4):
        up = _conv(ctx, cur, qp[f"up{i}"], lhs_dilation=(2, 2),
                   padding=((2, 2), (2, 2)))
        cur = ctx.site(f"up{i}.out", jax.nn.relu(up))
    return _conv(ctx, cur, qp["head"], padding=1).astype(jnp.float32)


def _forward_waternet(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                      policy=None):
    """WaterNet forward on folded params: the water-index sigmoid head is
    concatenated to RGB (7-ch input site), VGG-ish U-Net with a CBAM
    channel gate on the bottleneck (pooled on the int8 codes like
    `_residual_block`)."""
    ctx = _Ctx(scales, collect, dtype, policy)
    xin = ctx.site("input", x.astype(jnp.float32))

    def double(name, cur: _QT, k: int) -> _QT:
        cur = ctx.site(f"{name}.t1", jax.nn.relu(
            _conv(ctx, cur, qp[f"c{k}"], padding=1)))
        return ctx.site(f"{name}.out", jax.nn.relu(
            _conv(ctx, cur, qp[f"c{k + 1}"], padding=1)))

    t = ctx.site("wim.t", jax.nn.relu(_conv(ctx, xin, qp["wim1"])))
    idx = jax.nn.sigmoid(
        _conv(ctx, t, qp["wim2"]).astype(jnp.float32)).astype(ctx.dtype)
    cur = ctx.site("in7", jnp.concatenate([xin.f(ctx.dtype), idx], axis=-1))

    e1 = double("e1", cur, 0)
    e2 = double("e2", _maxpool(e1), 2)
    e3 = double("e3", _maxpool(e2), 4)
    b = double("b", _maxpool(e3), 6)

    # bottleneck CBAM channel gate (pool the codes, exact dequant on the
    # tiny pooled vectors — mean/max commute with the positive step)
    avg = jnp.mean(b.q, axis=(1, 2), dtype=jnp.float32)
    mx = jnp.max(b.q, axis=(1, 2)).astype(jnp.float32)
    if b.step is not None:
        avg = avg * b.step
        mx = mx * b.step
    fc1 = jnp.asarray(qp["ca"]["fc1"], jnp.float32)
    fc2 = jnp.asarray(qp["ca"]["fc2"], jnp.float32)
    gate = jax.nn.relu(avg @ fc1) @ fc2 + jax.nn.relu(mx @ fc1) @ fc2
    gc = jax.nn.sigmoid(gate).astype(ctx.dtype)
    cur = ctx.site("ca.out", b.f(ctx.dtype) * gc[:, None, None, :])

    for i, (skip, k) in enumerate(((e3, 8), (e2, 10), (e1, 12))):
        up = _conv(ctx, cur, qp[f"up{i}"], lhs_dilation=(2, 2),
                   padding=((1, 1), (1, 1)))
        up = ctx.site(f"up{i}.out", up)
        cat = ctx.site(f"cat{i}", jnp.concatenate(
            [up.f(ctx.dtype), skip.f(ctx.dtype)], axis=-1))
        cur = double(f"d{3 - i}", cat, k)
    return _conv(ctx, cur, qp["head"]).astype(jnp.float32)


def _forward_pspnet(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                    policy=None):
    """PSPNet forward on folded params: 4 strided stem convs (/16), the
    {1,2,3,6} adaptive-pool pyramid (pooled maps are <=6x6 — their branch
    convs still run the policy's int8 path so slim artifacts stay
    bit-exact), fusion conv, 1x1 head, f32 bilinear upsample to input."""
    from coastline.ops.primitives import adaptive_avg_pool, bilinear_resize

    ctx = _Ctx(scales, collect, dtype, policy)
    h, w = x.shape[1], x.shape[2]
    cur = ctx.site("input", x.astype(jnp.float32))
    for i, pad in enumerate((1, 1, 1, 1)):
        cur = ctx.site(f"c{i}", jax.nn.relu(
            _conv(ctx, cur, qp[f"c{i}"], stride=2, padding=pad)))

    hh, ww = cur.q.shape[1], cur.q.shape[2]
    outs = [cur.f(ctx.dtype)]
    for k, size in enumerate((1, 2, 3, 6)):
        p = adaptive_avg_pool(cur.f(ctx.dtype), size)
        p = ctx.site(f"ppm{k}.in", p)
        p = jax.nn.relu(_conv(ctx, p, qp[f"ppm{k}"]))
        outs.append(bilinear_resize(p.astype(ctx.dtype), (hh, ww)))
    cat = ctx.site("ppm.cat", jnp.concatenate(outs, axis=-1))
    cur = ctx.site("c4", jax.nn.relu(_conv(ctx, cat, qp["c4"], padding=1)))
    logits = _conv(ctx, cur, qp["head"]).astype(jnp.float32)
    return bilinear_resize(logits, (h, w))


def _forward_mswnet(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                    policy=None):
    """MSWNet forward on folded params. The multi-scale blocks' four
    branches all read the SAME int8 input (one site per block input); the
    stride-1 3x3 max pool of branch 4 runs on the codes like every pool."""
    ctx = _Ctx(scales, collect, dtype, policy)

    def msb(name, inp: _QT, p) -> _QT:
        branches = [
            jax.nn.relu(_conv(ctx, inp, p["b0"])),
            jax.nn.relu(_conv(ctx, inp, p["b1"], padding=1)),
            jax.nn.relu(_conv(ctx, inp, p["b2"], padding=2)),
            jax.nn.relu(_conv(ctx, _maxpool(inp, 3, 1, 1), p["b3"])),
        ]
        return ctx.site(f"{name}.out", jnp.concatenate(branches, axis=-1))

    cur = ctx.site("input", x.astype(jnp.float32))
    enc = []
    for i in range(4):
        cur = msb(f"ms{i}", cur if i == 0 else _maxpool(cur), qp[f"ms{i}"])
        enc.append(cur)
    cur = _maxpool(cur)
    cur = ctx.site("c0", jax.nn.relu(_conv(ctx, cur, qp["c0"], padding=1)))
    cur = ctx.site("c1", jax.nn.relu(_conv(ctx, cur, qp["c1"], padding=1)))
    for i in range(4):
        up = _conv(ctx, cur, qp[f"up{i}"], lhs_dilation=(2, 2),
                   padding=((1, 1), (1, 1)))
        up = ctx.site(f"up{i}.out", up)
        cat = ctx.site(f"cat{i}", jnp.concatenate(
            [up.f(ctx.dtype), enc[3 - i].f(ctx.dtype)], axis=-1))
        cur = ctx.site(f"c{2 + i}", jax.nn.relu(
            _conv(ctx, cat, qp[f"c{2 + i}"], padding=1)))
    return _conv(ctx, cur, qp["head"]).astype(jnp.float32)


def _forward_yoloseg(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                     policy=None):
    """YOLOSeg forward on folded params: LeakyReLU(0.1) throughout, 4
    maxpools on the codes, 4 folded ConvT(4,2,1) decoder stages, 3x3 head."""
    ctx = _Ctx(scales, collect, dtype, policy)

    def cba(name, cur: _QT, k: int, padding: int) -> _QT:
        return ctx.site(name, jax.nn.leaky_relu(
            _conv(ctx, cur, qp[f"c{k}"], padding=padding), 0.1))

    cur = ctx.site("input", x.astype(jnp.float32))
    cur = _maxpool(cba("c0", cur, 0, 1))
    cur = _maxpool(cba("c1", cur, 1, 1))
    cur = cba("c2", cur, 2, 1)
    cur = cba("c3", cur, 3, 0)
    cur = _maxpool(cba("c4", cur, 4, 1))
    cur = cba("c5", cur, 5, 1)
    cur = cba("c6", cur, 6, 0)
    cur = _maxpool(cba("c7", cur, 7, 1))
    for i in range(4):  # ConvT k4 s2 p1 -> lhs-dilated conv, pad k-1-p=2
        up = _conv(ctx, cur, qp[f"up{i}"], lhs_dilation=(2, 2),
                   padding=((2, 2), (2, 2)))
        cur = ctx.site(f"up{i}.out", jax.nn.leaky_relu(up, 0.1))
    return _conv(ctx, cur, qp["head"], padding=1).astype(jnp.float32)


def _forward_hrnet_water(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                         policy=None):
    """HRNet-Water forward on folded params: /2 stem, three parallel
    resolution branches, folded 1x1 projections + bilinear fuse at high
    resolution, head conv, 2x upsample, 1x1 head."""
    from coastline.ops.primitives import bilinear_resize

    ctx = _Ctx(scales, collect, dtype, policy)

    def cba(name, cur: _QT, k: int, stride: int = 1) -> _QT:
        return ctx.site(name, jax.nn.relu(
            _conv(ctx, cur, qp[f"c{k}"], stride=stride, padding=1)))

    cur = ctx.site("input", x.astype(jnp.float32))
    stem = cba("c1", cba("c0", cur, 0, 2), 1)
    hr = cba("c3", cba("c2", stem, 2), 3)
    mr = cba("c5", cba("c4", stem, 4, 2), 5)
    lr = cba("c7", cba("c6", mr, 6, 2), 7)

    size = (hr.q.shape[1], hr.q.shape[2])
    mr_up = bilinear_resize(_conv(ctx, mr, qp["mr_proj"]), size)
    lr_up = bilinear_resize(_conv(ctx, lr, qp["lr_proj"]), size)
    fused = ctx.site("fused", jnp.concatenate(
        [hr.f(ctx.dtype), mr_up, lr_up], axis=-1))
    h = cba("c8", fused, 8)
    h = ctx.site("head.in", bilinear_resize(
        h.f(ctx.dtype), (size[0] * 2, size[1] * 2)))
    return _conv(ctx, h, qp["head"]).astype(jnp.float32)


def _forward_fastscnn(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                      policy=None):
    """Fast-SCNN forward on folded params: the depthwise 3x3s run grouped
    in the compute dtype (reading int8 codes), BN+ReLU folded/fused into
    the pointwise 1x1s; {1,2,3,6} pyramid on the /16 map; both fusion
    projections folded; f32 bilinear upsample of the 1-ch logits."""
    from coastline.ops.primitives import adaptive_avg_pool, bilinear_resize

    ctx = _Ctx(scales, collect, dtype, policy)
    h, w = x.shape[1], x.shape[2]

    def ds(name, cur: _QT, k: int, stride: int = 1) -> _QT:
        p = qp[f"ds{k}"]
        groups = p["dw"]["w"].shape[-1] if isinstance(p["dw"], dict) \
            else p["dw"][0].shape[-1]
        t = _conv(ctx, cur, p["dw"], stride=stride, padding=1, groups=groups)
        t = ctx.site(f"{name}.mid", t)
        return ctx.site(f"{name}.out",
                        jax.nn.relu(_conv(ctx, t, p["pw"])))

    cur = ctx.site("input", x.astype(jnp.float32))
    cur = ctx.site("c0", jax.nn.relu(
        _conv(ctx, cur, qp["c0"], stride=2, padding=1)))
    cur = ds("ds0", cur, 0, 2)
    low = ds("ds1", cur, 1, 2)

    g = low
    for k in (2, 3, 4):
        g = ds(f"ds{k}", g, k)
    g = ds("ds5", g, 5, 2)
    for k in (6, 7, 8, 9, 10):
        g = ds(f"ds{k}", g, k)

    hh, ww = g.q.shape[1], g.q.shape[2]
    outs = [g.f(ctx.dtype)]
    for k, size in enumerate((1, 2, 3, 6)):
        p = adaptive_avg_pool(g.f(ctx.dtype), size)
        p = ctx.site(f"ppm{k}.in", p)
        p = jax.nn.relu(_conv(ctx, p, qp[f"ppm{k}"]))
        outs.append(bilinear_resize(p.astype(ctx.dtype), (hh, ww)))
    g = ctx.site("ppm.cat", jnp.concatenate(outs, axis=-1))

    lowp = _conv(ctx, low, qp["low_proj"])
    high = _conv(ctx, g, qp["high_proj"])
    high = bilinear_resize(high, (low.q.shape[1], low.q.shape[2]))
    cur = ctx.site("fuse.out", jax.nn.relu(lowp + high))
    cur = ds("ds11", cur, 11)
    cur = ds("ds12", cur, 12)
    logits = _conv(ctx, cur, qp["head"]).astype(jnp.float32)
    return bilinear_resize(logits, (h, w))


def _forward_enet(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                  policy=None):
    """ENet forward on folded params: initial block (conv slice folded,
    pool slice through the explicit BN affine), 13 bottlenecks per
    `_ENET_SPECS`, folded ConvT(3,2,1,op=1) decoder, ConvT(2,2) head."""
    ctx = _Ctx(scales, collect, dtype, policy)

    def bottleneck(name, cur: _QT, spec, p) -> _QT:
        kind, dil = spec
        if kind == "down":
            ident = _conv(ctx, _maxpool(cur), p["proj"])
        else:
            ident = cur.f(ctx.dtype)
        t = ctx.site(f"{name}.r", jax.nn.relu(
            _conv(ctx, cur, p["reduce"], stride=2 if kind == "down" else 1)))
        if kind == "asym":
            t = ctx.site(f"{name}.m1", jax.nn.relu(
                _conv(ctx, t, p["mid1"], padding=((2, 2), (0, 0)))))
            t = ctx.site(f"{name}.m2", jax.nn.relu(
                _conv(ctx, t, p["mid2"], padding=((0, 0), (2, 2)))))
        else:
            t = ctx.site(f"{name}.m1", jax.nn.relu(
                _conv(ctx, t, p["mid1"], padding=dil, dilation=dil)))
        out = _conv(ctx, t, p["expand"])  # BN folded; relu after residual
        return ctx.site(f"{name}.out", jax.nn.relu(out + ident))

    cur = ctx.site("input", x.astype(jnp.float32))
    conv_part = _conv(ctx, cur, qp["init"]["conv"], stride=2, padding=1)
    pool_part = _maxpool(cur).f(ctx.dtype) \
        * jnp.asarray(qp["init"]["pool_inv"], ctx.dtype) \
        + jnp.asarray(qp["init"]["pool_shift"], ctx.dtype)
    cur = ctx.site("init.out", jax.nn.relu(
        jnp.concatenate([conv_part, pool_part], axis=-1)))

    for i, spec in enumerate(_ENET_SPECS):
        cur = bottleneck(f"bn{i}", cur, spec, qp[f"bn{i}"])

    for i in range(2):  # ConvT k3 s2 p1 op1 -> pad (k-1-p, k-1-p+op) = (1,2)
        up = _conv(ctx, cur, qp[f"up{i}"], lhs_dilation=(2, 2),
                   padding=((1, 2), (1, 2)))
        cur = ctx.site(f"up{i}.out", jax.nn.relu(up))
    head = _conv(ctx, cur, qp["head"], lhs_dilation=(2, 2),
                 padding=((1, 1), (1, 1)))  # ConvT k2 s2
    return head.astype(jnp.float32)


def _forward_segformer_lite(qp, scales, x, collect=None, dtype=jnp.bfloat16,
                            policy=None):
    """SegFormer-Lite forward on folded params (default logits ordering:
    upsample then sigmoid — models/segformer_lite.py). Attention matmuls
    and softmax run in the compute dtype / f32 off int8-read inputs; the
    convs (patch embeds, spatial reductions, Mix-FFN, decoder) follow the
    int8 policy."""
    from coastline.ops.primitives import bilinear_resize

    ctx = _Ctx(scales, collect, dtype, policy)
    h, w = x.shape[1], x.shape[2]

    def esa(name, cur: _QT, p, heads: int, red: int) -> jnp.ndarray:
        n, hh, ww, c = cur.q.shape
        dh = c // heads
        q = _conv(ctx, cur, p["q"])
        xr = ctx.site(f"{name}.xr",
                      _conv(ctx, cur, p["sr"], stride=red))
        kv = _conv(ctx, xr, p["kv"])
        hr, wr = xr.q.shape[1], xr.q.shape[2]
        q = q.reshape(n, hh * ww, heads, dh).transpose(0, 2, 1, 3)
        k = kv[..., :c].reshape(n, hr * wr, heads, dh).transpose(0, 2, 1, 3)
        v = kv[..., c:].reshape(n, hr * wr, heads, dh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) * (dh ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32),
                              axis=-1).astype(ctx.dtype)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, hh, ww, c)
        return _conv(ctx, ctx.site(f"{name}.o", out), p["proj"])

    def ffn(name, cur: _QT, p) -> jnp.ndarray:
        t = _conv(ctx, cur, p["c1"])
        groups = t.shape[-1]
        t = ctx.site(f"{name}.h", t)
        t = _conv(ctx, t, p["dw"], padding=1, groups=groups)
        t = ctx.site(f"{name}.g", jax.nn.gelu(t, approximate=False))
        return _conv(ctx, t, p["c2"])

    def stage(i, cur: _QT, stride, pad, heads, red) -> _QT:
        c = ctx.site(f"c{i}", jax.nn.gelu(
            _conv(ctx, cur, qp[f"c{i}"], stride=stride, padding=pad),
            approximate=False))
        if heads is None:
            return c
        c = ctx.site(f"c{i}.a", c.f(ctx.dtype)
                     + esa(f"esa{i}", c, qp[f"esa{i}"], heads, red))
        return ctx.site(f"c{i}.f", c.f(ctx.dtype)
                        + ffn(f"ffn{i}", c, qp[f"ffn{i}"]))

    cur = ctx.site("input", x.astype(jnp.float32))
    c1 = stage(0, cur, 4, 3, 1, 8)
    c2 = stage(1, c1, 2, 1, 2, 4)
    c3 = stage(2, c2, 2, 1, 4, 2)
    c4 = stage(3, c3, 2, 1, None, None)

    size = (c1.q.shape[1], c1.q.shape[2])
    f4 = bilinear_resize(_conv(ctx, c4, qp["f4"]), size)
    f3 = bilinear_resize(_conv(ctx, c3, qp["f3"]), size)
    f2 = bilinear_resize(_conv(ctx, c2, qp["f2"]), size)
    f1 = _conv(ctx, c1, qp["f1"])
    cat = ctx.site("dec.cat", jnp.concatenate([f4, f3, f2, f1], axis=-1))
    fused = ctx.site("c4f", jax.nn.relu(_conv(ctx, cat, qp["c4"])))
    head = ctx.site("c5h", jax.nn.relu(
        _conv(ctx, fused, qp["c5"], padding=1)))
    logits = _conv(ctx, head, qp["head"]).astype(jnp.float32)
    return bilinear_resize(logits, (h, w))


# arch name -> (fold fn, forward fn, sigmoid head?)
ARCHS = {
    "robust_unet": (fold_robust_unet, _forward, True),
    "unet": (fold_unet, _forward_unet, False),
    "segnet": (fold_segnet, _forward_segnet, True),
    "deeplabv3p": (fold_deeplabv3p, _forward_deeplabv3p, True),
    "mswnet": (fold_mswnet, _forward_mswnet, True),
    "waternet": (fold_waternet, _forward_waternet, True),
    "pspnet": (fold_pspnet, _forward_pspnet, True),
    "yoloseg": (fold_yoloseg, _forward_yoloseg, True),
    "hrnet_water": (fold_hrnet_water, _forward_hrnet_water, True),
    "fastscnn": (fold_fastscnn, _forward_fastscnn, True),
    "enet": (fold_enet, _forward_enet, True),
    "segformer_lite": (fold_segformer_lite, _forward_segformer_lite, True),
}


def default_calibration(image_size: int, images_u8=None, n_scenes: int = 4):
    """The ONE calibration-batch recipe every entry point shares.

    uint8 images (given, or `n_scenes` synthetic coastal scenes from a
    fixed seed) -> /255 -> ImageNet-normalized f32. Used by
    `CoastlineExtractor.quantize` and the export CLI so artifacts are
    calibrated identically no matter which command wrote them."""
    import numpy as np

    from coastline.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    if images_u8 is None:
        from coastline.data.synthetic import make_scene

        rng = np.random.default_rng(0)
        images_u8 = np.stack(
            [make_scene(rng, image_size)[0] for _ in range(n_scenes)])
    mean, std = jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD)
    return (jnp.asarray(images_u8, jnp.float32) / 255.0 - mean) / std


def quant_arch_for(name):
    """Resolve ANY model-registry name/alias to this module's ARCHS key.

    Derived from the registry's own alias table (ARCHS keys are registry
    aliases), so adding/renaming an architecture never needs a parallel
    name map maintained elsewhere (e.g. the export CLI). Returns None when
    the model has no int8 fold."""
    from coastline.models.registry import canonical_name

    canon = canonical_name(name)
    for key in ARCHS:
        if key == name or canonical_name(key) == canon:
            return key
    return None


def float_forward(folded, x, return_logits: bool = False,
                  dtype=jnp.bfloat16, arch: str = "robust_unet"):
    """Float forward on BN-folded params — must match `model.apply`
    (at dtype=f32 the agreement is ~1e-6; see tests/test_quant.py)."""
    _, fwd, sig = ARCHS[arch]
    logits = fwd(folded, None, x, dtype=dtype)
    return jax.nn.sigmoid(logits) if sig and not return_logits else logits


def int8_forward(qparams, scales, x, return_logits: bool = False,
                 arch: str = "robust_unet", policy: Optional[Dict] = None):
    """int8-activation forward; `scales` maps site name -> absmax (float)."""
    _, fwd, sig = ARCHS[arch]
    logits = fwd(qparams, scales, x, policy=policy)
    return jax.nn.sigmoid(logits) if sig and not return_logits else logits


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


def calibration_sites(folded, example: jnp.ndarray,
                      arch: str = "robust_unet"):
    """Trace the float forward once to enumerate site names (static)."""
    fwd = ARCHS[arch][1]
    collect: Dict[str, jnp.ndarray] = {}
    jax.eval_shape(lambda xx: (fwd(folded, None, xx, collect), None),
                   example)
    return sorted(collect.keys())


def calibrate(folded, images, batch_size: int = 2,
              arch: str = "robust_unet") -> Dict[str, float]:
    """Run the float forward over calibration images, return absmax/site.

    `images` is (N, H, W, 3) float32 (already normalized, i.e. exactly what
    the production `apply` receives).
    """

    fwd = ARCHS[arch][1]

    # folded is a jit ARGUMENT: captured param trees become HLO constants
    # and remote compiles hang (CLAUDE.md).
    @jax.jit
    def run(fold, xx):
        collect: Dict[str, jnp.ndarray] = {}
        fwd(fold, None, xx, collect)
        return collect

    out: Dict[str, float] = {}
    n = images.shape[0]
    for i in range(0, n, batch_size):
        chunk = images[i:i + batch_size]
        if chunk.shape[0] != batch_size:  # keep one compiled shape
            reps = -(-batch_size // chunk.shape[0])
            chunk = jnp.concatenate([chunk] * reps, axis=0)[:batch_size]
        stats = jax.device_get(run(folded, jnp.asarray(chunk, jnp.float32)))
        for k, v in stats.items():
            out[k] = max(out.get(k, 0.0), float(v))
    # Never leave a degenerate scale (all-zero activation on the calib set)
    return {k: (v if v > 0 else 1.0) for k, v in out.items()}


# ---------------------------------------------------------------------------
# High-level wrapper
# ---------------------------------------------------------------------------


class QuantizedModel:
    """PTQ int8 model: build once from trained variables, then call.

    >>> q = QuantizedModel.from_variables(variables, calib_images,
    ...                                   arch="robust_unet")
    >>> probs = q(x)            # jitted int8 forward
    """

    def __init__(self, qparams, scales, arch: str = "robust_unet",
                 policy: Optional[Dict] = None):
        # Commit the tree to device ONCE. A host-numpy tree would re-upload
        # ~200MB through the tunnel on EVERY call — the exact multiplicative
        # timing bug of the round-3 post-mortem (docs/QUANT.md), measured
        # 5.8x on the tiled scene path before this device_put.
        self.qparams = jax.device_put(qparams)
        self.scales = scales
        self.arch = arch
        self.policy = policy
        # scales are scalar HLO constants (fine); qparams stay a traced
        # argument — captured trees hang remote compiles (CLAUDE.md).
        self._fn = jax.jit(
            lambda p, x: int8_forward(p, scales, x, arch=arch, policy=policy))

    @classmethod
    def from_variables(cls, variables, calib_images, batch_size: int = 2,
                       arch: str = "robust_unet", policy: Optional[Dict] = None):
        folded = ARCHS[arch][0](variables)
        scales = calibrate(folded, calib_images, batch_size, arch=arch)
        return cls(quantize_folded(folded), scales, arch, policy)

    def __call__(self, x):
        return self._fn(self.qparams, jnp.asarray(x, jnp.float32))


class QuantizedRobustUNet(QuantizedModel):
    """Back-compat alias for the flagship."""

    @classmethod
    def from_variables(cls, variables, calib_images, batch_size: int = 2):
        return QuantizedModel.from_variables(variables, calib_images,
                                             batch_size, arch="robust_unet")
