"""Native (C++) contour tracer/RDP: bit-parity with the Python fallback.

The native library is the cv2-less deployment path for the reference's
contour stage (`/root/reference/predict_coastline.py:583-618`); its
contract is EXACT equality with `contours._moore_trace`/`_rdp` — same
component numbering, same walk, same keep set — so these tests assert
array equality, not tolerances.
"""

import os
import shutil
import time

import numpy as np
import pytest

from coastline import native
from coastline.infer.contours import _moore_trace, _rdp, extract_contours

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def lib():
    lib = native.load_native()
    if lib is None:
        pytest.fail("g++ present but native build failed — build_library "
                    "stderr has the compile error (run with verbose=True)")
    return lib


def _blob_mask(seed, h=96, w=128, n_blobs=4):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros((h, w), np.uint8)
    for _ in range(n_blobs):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = rng.integers(3, 18)
        m |= (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.uint8)
    return m


def test_trace_bit_parity_fuzz(lib):
    for seed in range(8):
        m = _blob_mask(seed)
        got = native.moore_trace(m)
        want = _moore_trace(m)
        assert len(got) == len(want), f"seed {seed}"
        for g, w_ in zip(got, want):
            np.testing.assert_array_equal(g, w_)


def test_trace_edge_cases(lib):
    # empty mask, single pixel, full mask, 1-px line touching borders
    assert native.moore_trace(np.zeros((5, 7), np.uint8)) == []
    one = np.zeros((4, 4), np.uint8)
    one[2, 1] = 1
    got, want = native.moore_trace(one), _moore_trace(one)
    assert len(got) == len(want) == 1
    np.testing.assert_array_equal(got[0], want[0])
    full = np.ones((6, 9), np.uint8)
    for g, w_ in zip(native.moore_trace(full), _moore_trace(full)):
        np.testing.assert_array_equal(g, w_)
    line = np.zeros((8, 8), np.uint8)
    line[0, :] = 1
    line[:, 7] = 1  # L along two borders (one 4-connected component)
    for g, w_ in zip(native.moore_trace(line), _moore_trace(line)):
        np.testing.assert_array_equal(g, w_)


def test_trace_handles_255_masks(lib):
    m = _blob_mask(3)
    got01 = native.moore_trace(m)
    got255 = native.moore_trace(m * 255)
    for a, b in zip(got01, got255):
        np.testing.assert_array_equal(a, b)


def test_rdp_bit_parity(lib):
    rng = np.random.default_rng(0)
    for n in (3, 4, 17, 256):
        pts = rng.integers(0, 100, (n, 2)).astype(np.int32)
        for eps in (0.0, 0.5, 2.0, 10.0):
            np.testing.assert_array_equal(native.rdp(pts, eps),
                                          _rdp(pts, eps))
    # degenerate: all points identical (zero-length segments throughout)
    same = np.full((9, 2), 5, np.int32)
    np.testing.assert_array_equal(native.rdp(same, 1.0), _rdp(same, 1.0))
    short = np.array([[0, 0], [3, 4]], np.int32)
    np.testing.assert_array_equal(native.rdp(short, 1.0), short)


def test_rdp_no_int32_overflow_on_huge_spans(lib):
    """Coordinate spans past ~46341 px overflow an int32 cross product —
    the C++ always computed in int64; the Python side must agree (it
    upcasts now). 46341*46341 wraps int32 to a tiny value, which would
    silently DROP the far-off middle vertex."""
    pts = np.array([[0, 0], [46341, 46341], [92682, 0]], np.int32)
    kept = _rdp(pts, 10.0)
    np.testing.assert_array_equal(kept, pts)  # middle is ~46341 px off-line
    np.testing.assert_array_equal(native.rdp(pts, 10.0), kept)


def test_cache_dir_refuses_foreign_ownership(tmp_path, monkeypatch):
    """The .so cache must never load from a directory owned by another
    user (predictable-path code execution). Non-owned dir -> no native."""
    if not hasattr(os, "getuid") or os.getuid() != 0:
        pytest.skip("needs root to fabricate a foreign-owned dir")
    foreign = tmp_path / "evil_cache"
    foreign.mkdir()
    os.chown(foreign, 1, 1)  # daemon-owned
    monkeypatch.setenv("COASTLINE_NATIVE_CACHE", str(foreign))
    assert native._cache_dir() is None
    assert native.build_library() is None


def test_default_cache_dir_is_per_user(monkeypatch):
    """Without overrides the cache lands under the user's own cache root,
    not a world-shared /tmp path."""
    monkeypatch.delenv("COASTLINE_NATIVE_CACHE", raising=False)
    d = native._cache_dir()
    assert d is not None
    home_cache = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    import tempfile as _tf
    uid = os.getuid() if hasattr(os, "getuid") else "u"
    assert (d.startswith(home_cache)
            or d == os.path.join(_tf.gettempdir(), f"coastline_native_{uid}"))
    if hasattr(os, "getuid"):
        assert os.stat(d).st_uid == os.getuid()


def test_extract_contours_backends_agree(lib):
    from coastline.infer.morphology import coastline_band

    yy, xx = np.mgrid[0:128, 0:128]
    mask = (((yy - 64) ** 2 + (xx - 64) ** 2) < 40 ** 2).astype(np.uint8)
    band = np.asarray(coastline_band(mask, 5))
    nat = extract_contours(band, backend="native")
    py = extract_contours(band, backend="python")
    assert nat == py
    assert len(nat) == 1  # the disk's single external ring


def test_native_speedup_on_production_mask(lib):
    """The point of the module: native-speed tracing on a production-size
    band. 2x is a very loose floor — measured ~100x (the artifact records
    the real number)."""
    m = _blob_mask(0, h=512, w=512, n_blobs=24)

    t0 = time.perf_counter()
    native.moore_trace(m)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    _moore_trace(m)
    t_py = time.perf_counter() - t0
    assert t_nat < t_py / 2, f"native {t_nat:.4f}s vs python {t_py:.4f}s"


def test_env_kill_switch(monkeypatch):
    """COASTLINE_NO_NATIVE forces the Python path (support escape hatch)."""
    import importlib

    monkeypatch.setenv("COASTLINE_NO_NATIVE", "1")
    importlib.reload(native)
    try:
        assert native.load_native() is None
        assert native.moore_trace(np.ones((4, 4), np.uint8)) is None
    finally:
        monkeypatch.delenv("COASTLINE_NO_NATIVE")
        importlib.reload(native)
