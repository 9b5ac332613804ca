"""Hand-written TPU kernels for the ops XLA does not fuse optimally.

Opt-in via COASTLINE_PALLAS=1 (or per-call flags). Kernels ship with
interpret-mode tests so they validate on any backend.
"""

import os


def pallas_enabled() -> bool:
    return os.environ.get("COASTLINE_PALLAS", "0") not in ("0", "", "false")


def cbam_tail_enabled() -> bool:
    """Fused CBAM residual tail (pallas/cbam.py). Separate flag from the
    experimental opt-ins: flips default-on once the on-chip end-to-end win
    is recorded (the dilation kernel's promotion path)."""
    return os.environ.get("COASTLINE_PALLAS_CBAM", "0") not in ("0", "", "false")
