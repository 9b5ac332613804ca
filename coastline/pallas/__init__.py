"""Hand-written TPU kernels for the ops XLA does not fuse optimally.

Opt-in via COASTLINE_PALLAS=1 (or per-call flags). Kernels ship with
interpret-mode tests so they validate on any backend.
"""

import os


def pallas_enabled() -> bool:
    return os.environ.get("COASTLINE_PALLAS", "0") not in ("0", "", "false")
