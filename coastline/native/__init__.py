"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is XLA/Pallas on the TPU; the only real host-side compute
in the framework is contour topology extraction (inherently sequential
pointer-chasing, SURVEY.md §7). With cv2 present that stage uses
cv2.findContours; without it (the same deployment class the geotiff PIL
fallback serves) the pure-Python Moore tracer is ~100x slower on
production-size masks. This package compiles `contours.cpp` on demand with
g++ into a source-hash-keyed shared object, caches it, and exposes
bit-identical replacements for the Python fallback.

Everything degrades gracefully: no g++, a failed compile, or a failed load
all yield `load_native() -> None` and callers keep the Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "contours.cpp")
_lock = threading.Lock()
_lib = None
_load_attempted = False


def _cache_dir() -> Optional[str]:
    """Per-user cache directory for built .so files, or None if unusable.

    NEVER a world-shared path: loading a .so from a predictable /tmp
    location another user could pre-create is local-attacker code
    execution. Preference order: $COASTLINE_NATIVE_CACHE (explicit
    opt-in), $XDG_CACHE_HOME/coastline_native, ~/.cache/coastline_native,
    then a uid-suffixed tempdir. Whatever we end up with must be owned by
    the current user or we refuse (-> Python fallback)."""
    d = os.environ.get("COASTLINE_NATIVE_CACHE")
    if not d:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache")
        d = os.path.join(base, "coastline_native")
    try:
        os.makedirs(d, mode=0o700, exist_ok=True)
    except OSError:
        uid = os.getuid() if hasattr(os, "getuid") else "u"
        d = os.path.join(tempfile.gettempdir(), f"coastline_native_{uid}")
        try:
            os.makedirs(d, mode=0o700, exist_ok=True)
        except OSError:
            return None
    if hasattr(os, "getuid"):
        try:
            if os.stat(d).st_uid != os.getuid():
                return None  # pre-created by someone else: do not trust
        except OSError:
            return None
    return d


def build_library(verbose: bool = False) -> Optional[str]:
    """Compile contours.cpp -> cached .so; return its path or None.

    The object name embeds a hash of the source, so editing the .cpp
    invalidates stale caches automatically."""
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    cache = _cache_dir()
    if cache is None:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = os.path.join(cache, f"contours_{tag}.so")
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        if verbose:
            print("native build failed:", proc.stderr.decode(errors="replace"))
        return None
    os.replace(tmp, out)  # atomic: concurrent builders race benignly
    return out


def load_native():
    """ctypes handle to the contour library, or None if unavailable."""
    global _lib, _load_attempted
    with _lock:
        if _load_attempted:
            return _lib
        _load_attempted = True
        if os.environ.get("COASTLINE_NO_NATIVE"):
            return None
        path = build_library()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.trace_new.restype = ctypes.c_void_p
        lib.trace_new.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_int, ctypes.c_int]
        lib.trace_ncontours.restype = ctypes.c_int
        lib.trace_ncontours.argtypes = [ctypes.c_void_p]
        lib.trace_len.restype = ctypes.c_int64
        lib.trace_len.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.trace_copy.restype = None
        lib.trace_copy.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_int32)]
        lib.trace_free.restype = None
        lib.trace_free.argtypes = [ctypes.c_void_p]
        lib.rdp_keep.restype = None
        lib.rdp_keep.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                 ctypes.c_int64, ctypes.c_double,
                                 ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return _lib


def moore_trace(mask: np.ndarray) -> Optional[List[np.ndarray]]:
    """External boundary per 4-connected component, as (n, 2) int32 [x, y]
    arrays — bit-identical to contours._moore_trace. None if no native lib."""
    lib = load_native()
    if lib is None:
        return None
    m = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    h, w = m.shape
    handle = lib.trace_new(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           h, w)
    try:
        out = []
        for i in range(lib.trace_ncontours(handle)):
            n = lib.trace_len(handle, i)
            buf = np.empty((n, 2), np.int32)
            lib.trace_copy(handle, i,
                           buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            out.append(buf)
        return out
    finally:
        lib.trace_free(handle)


def rdp(points: np.ndarray, eps: float) -> Optional[np.ndarray]:
    """RDP-simplified points — bit-identical to contours._rdp, or None."""
    lib = load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(np.asarray(points, np.int32))
    n = pts.shape[0]
    if n < 3:
        return pts
    keep = np.zeros(n, np.uint8)
    lib.rdp_keep(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                 n, float(eps),
                 keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return pts[keep.astype(bool)]
