"""Labelme polygon JSON -> binary water mask.

Parity with `CoastalDataset.create_mask_from_labelme`
(`/root/reference/Main_Final.py:62-78`, cv2 variant
`train_water_segmentation.py:176-207`): shapes labeled water/sea/海水/水体
with >=3 vertices fill to 1; malformed files yield a zero mask.

Rasterization itself is host-side preprocessing (runs once per image at
dataset-cache build, never inside the compiled step — SURVEY.md §7 hard
parts). PIL's polygon fill is used as the geometry engine, matching the
reference's fill convention exactly.
"""

import json
from typing import Iterable, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

WATER_LABELS = frozenset({"water", "sea", "海水", "水体"})


def rasterize_polygons(
    polygons: Iterable[Sequence[Tuple[float, float]]],
    size: Tuple[int, int],
) -> np.ndarray:
    """Fill polygons (lists of (x, y)) into a uint8 {0,1} mask of (W, H) `size`."""
    mask = Image.new("L", size, 0)
    draw = ImageDraw.Draw(mask)
    for points in polygons:
        pts = [(int(p[0]), int(p[1])) for p in points]
        if len(pts) >= 3:
            draw.polygon(pts, fill=1)
    return np.asarray(mask, dtype=np.uint8)


def mask_from_labelme(label_path, size: Tuple[int, int]) -> np.ndarray:
    """Parse a Labelme JSON and rasterize its water shapes at (W, H) `size`.

    Returns an (H, W) uint8 {0,1} array; any error -> zero mask (the
    reference's silent-fallback behavior, Main_Final.py:77-78).
    """
    try:
        with open(label_path, "r", encoding="utf-8") as f:
            data = json.load(f)
        polys = [
            s.get("points", [])
            for s in data.get("shapes", [])
            if str(s.get("label", "")).lower() in WATER_LABELS
        ]
        return rasterize_polygons(polys, size)
    except Exception:
        return np.zeros((size[1], size[0]), dtype=np.uint8)
