"""Hand-written TPU kernels for the ops XLA does not fuse optimally.

Opt-in via COASTLINE_PALLAS=1 (or per-call flags). Kernels ship with
interpret-mode tests so they validate on any backend.
"""

import os


def pallas_enabled() -> bool:
    return os.environ.get("COASTLINE_PALLAS", "0") not in ("0", "", "false")


def cbam_tail_enabled() -> bool:
    """Fused CBAM residual tail (pallas/cbam.py). Default OFF — a fully
    measured negative result (VERDICT r2 item 4): in ISOLATION the fused
    tail wins at C>=256 (1.36x at (8,128,128,256)), but END-TO-END the
    full RobustUNet runs 0.933x with the fused path even when gated to
    those winning shapes (artifacts/bench_cbam.json): in-model, XLA fuses
    the tail's reductions into neighboring conv epilogues and keeps small
    deep-level activations VMEM-resident, and the pallas calls' forced
    materialization boundaries cost more than the 13->5 HBM-pass saving.
    COASTLINE_PALLAS_CBAM=1 enables the dispatch (still shape-gated by
    cbam.wins) for re-benching on other hardware."""
    return os.environ.get("COASTLINE_PALLAS_CBAM", "0") not in ("0", "", "false")
