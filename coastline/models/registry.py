"""Model registry: canonical name -> constructor.

Names match the reference's benchmark display names (`Main_Final.py:841-845`,
`comne.py:978-983`, `Extended_Baseline_Comparison.py:1080-1104`) so results
tables line up 1:1. Aliases accept snake_case too.
"""

from typing import Any, Dict

_REGISTRY: Dict[str, Any] = {}
_ALIASES: Dict[str, str] = {}


def register(name: str, *aliases: str):
    def wrap(cls):
        _REGISTRY[name] = cls
        for a in (name.lower(), *aliases):
            _ALIASES[a.lower()] = name
        return cls

    return wrap


def _populate():
    if _REGISTRY:
        return
    from coastline.models.robust_unet import RobustUNet
    from coastline.models.unet import UNet

    entries = [
        ("Robust UNet", RobustUNet, ("robust_unet", "robustunet")),
        ("UNet", UNet, ("unet",)),
    ]
    try:
        from coastline.models.deeplabv3p import DeepLabV3Plus
        from coastline.models.yoloseg import YOLOSeg
        from coastline.models.segnet import SegNet
        from coastline.models.pspnet import PSPNet
        from coastline.models.fastscnn import FastSCNN
        from coastline.models.enet import ENet
        from coastline.models.waternet import WaterNet
        from coastline.models.mswnet import MSWNet
        from coastline.models.hrnet_water import HRNetWater
        from coastline.models.segformer_lite import SegFormerLite

        entries += [
            ("DeepLabV3+", DeepLabV3Plus, ("deeplabv3plus", "deeplabv3p", "deeplab")),
            ("YOLO-SEG", YOLOSeg, ("yoloseg", "yolo_seg")),
            ("SegNet", SegNet, ("segnet",)),
            ("PSPNet", PSPNet, ("pspnet",)),
            ("Fast-SCNN", FastSCNN, ("fastscnn", "fast_scnn")),
            ("ENet", ENet, ("enet",)),
            ("WaterNet", WaterNet, ("waternet",)),
            ("MSWNet", MSWNet, ("mswnet",)),
            ("HRNet-Water", HRNetWater, ("hrnetwater", "hrnet_water")),
            ("SegFormer-Lite", SegFormerLite, ("segformerlite", "segformer_lite")),
        ]
    except ImportError:
        pass  # partial builds during bring-up
    for name, cls, aliases in entries:
        _REGISTRY[name] = cls
        for a in (name.lower(), *aliases):
            _ALIASES[a.lower()] = name


def available_models():
    _populate()
    return sorted(_REGISTRY)


def canonical_name(name: str) -> str:
    """Resolve a registry name or alias to its canonical display name.

    Unknown names pass through unchanged (callers decide how to fail)."""
    _populate()
    return _ALIASES.get(name.lower(), name)


def create_model(name: str, **kwargs):
    canonical = canonical_name(name)
    if canonical not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {available_models()}")
    return _REGISTRY[canonical](**kwargs)


MODEL_REGISTRY = _REGISTRY
