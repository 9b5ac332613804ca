"""Host-side contour tracing + simplification.

Contour topology extraction is inherently sequential/pointer-chasing and
stays on host (SURVEY.md §7); the heavy raster work (predict, dilate, band)
runs on device. Parity with `extract_coastline_contours`
(`/root/reference/predict_coastline.py:583-618`): external contours only,
drop contours of <=10 points, simplify with epsilon = 0.002 * arc length.

Backend order: cv2 (exact reference semantics) > native C++ tracer
(coastline/native — bit-identical to the Python fallback, ~100x faster)
> pure Python. cv2-less deployments therefore keep native-speed contour
extraction; `backend=` forces one for tests.
"""

from typing import List

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def _moore_trace(mask: np.ndarray) -> List[np.ndarray]:
    """Pure-python external boundary tracing fallback (Moore neighborhood)."""
    from scipy import ndimage

    labeled, n = ndimage.label(mask > 0)
    contours = []
    offs = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]
    for comp in range(1, n + 1):
        ys, xs = np.nonzero(labeled == comp)
        if len(ys) == 0:
            continue
        start = (ys.min(), xs[ys == ys.min()].min())
        comp_mask = labeled == comp
        contour = [start]
        prev_dir = 6  # coming from the left
        cur = start
        for _ in range(4 * len(ys) + 8):
            found = False
            for k in range(8):
                d = (prev_dir + 1 + k) % 8
                ny, nx = cur[0] + offs[d][0], cur[1] + offs[d][1]
                if 0 <= ny < mask.shape[0] and 0 <= nx < mask.shape[1] and comp_mask[ny, nx]:
                    cur = (ny, nx)
                    prev_dir = (d + 4) % 8
                    found = True
                    break
            if not found or cur == start:
                break
            contour.append(cur)
        contours.append(np.array([[x, y] for y, x in contour], np.int32))
    return contours


def _rdp(points: np.ndarray, eps: float) -> np.ndarray:
    """Ramer-Douglas-Peucker simplification (approxPolyDP equivalent)."""
    if len(points) < 3:
        return points
    keep = np.zeros(len(points), bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(points) - 1)]
    while stack:
        a, b = stack.pop()
        if b <= a + 1:
            continue
        # cross products in int64: int32 wraps past ~46341-px coordinate
        # spans and would silently pick a wrong split point (the native
        # C++ backend always used exact int64 — this keeps the two
        # backends bit-identical at any raster size)
        seg = (points[b] - points[a]).astype(np.int64)
        norm = np.hypot(*seg.astype(float))
        if norm == 0:
            d = np.hypot(*(points[a + 1 : b] - points[a]).astype(float).T)
        else:
            d = np.abs(np.cross(seg, (points[a + 1 : b] - points[a])
                                .astype(np.int64))) / norm
        i = int(np.argmax(d))
        if d[i] > eps:
            keep[a + 1 + i] = True
            stack += [(a, a + 1 + i), (a + 1 + i, b)]
    return points[keep]


def extract_contours(band_mask: np.ndarray, min_points: int = 10,
                     epsilon_frac: float = 0.002,
                     backend: str = "auto") -> List[List[List[int]]]:
    """Coastline band -> simplified polylines as [[x, y], ...] lists.

    backend: 'auto' (cv2 > native > python), or force 'cv2' / 'native' /
    'python'. The native and python backends produce bit-identical output
    (tests/test_native.py)."""
    band = np.asarray(band_mask).astype(np.uint8)
    coastlines = []
    if backend not in ("auto", "cv2", "native", "python"):
        raise ValueError(f"unknown contour backend {backend!r}")
    if backend == "cv2" and not _HAS_CV2:
        raise RuntimeError("cv2 backend requested but cv2 is not installed")
    if backend == "cv2" or (backend == "auto" and _HAS_CV2):
        contours, _ = cv2.findContours(band, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        for c in contours:
            if len(c) > min_points:
                eps = epsilon_frac * cv2.arcLength(c, True)
                simplified = cv2.approxPolyDP(c, eps, True)
                coastlines.append(simplified.reshape(-1, 2).tolist())
        return coastlines

    traced, simplify = None, _rdp
    if backend in ("auto", "native"):
        from coastline import native

        traced = native.moore_trace(band)
        if traced is not None:
            simplify = native.rdp
        elif backend == "native":
            raise RuntimeError("native contour library unavailable "
                               "(g++ missing or build failed)")
    if traced is None:  # backend == 'python', or auto degraded
        traced = _moore_trace(band)
    for c in traced:
        if len(c) > min_points:
            closed = np.vstack([c, c[:1]])
            arc = np.hypot(*np.diff(closed, axis=0).astype(float).T).sum()
            coastlines.append(simplify(c, epsilon_frac * arc).tolist())
    return coastlines
