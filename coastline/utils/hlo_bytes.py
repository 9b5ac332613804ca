"""HBM byte attribution from optimized HLO text.

The axon tunnel strips device-side XPlane data from profiler traces
(docs/TRAIN_ROOFLINE.md), so per-op traffic cannot be measured with
`jax.profiler` in this container. This module recovers a close proxy from
the compiled executable itself: in post-optimization HLO, every top-level
(ENTRY) instruction materializes its outputs in HBM — fusions hide their
interiors, so summing ENTRY output buffers (plus parameter reads) gives
the program's HBM write/read ledger, attributable per instruction via the
`metadata op_name` scopes JAX embeds (e.g.
"jit(int8_forward)/conv_general_dilated[...]").

Used by scripts/attr_hlo_bytes.py to attribute the int8 serving graph and
the train step (VERDICT r3 items 2-3). Cross-check: total writes+reads
should land within ~2x of `cost_analysis()['bytes accessed']` (the cost
model also counts fusion-internal re-reads that stay in VMEM).
"""

import re
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def shape_bytes(type_str: str) -> int:
    """Bytes of all array shapes in an HLO result-type string (handles
    tuples by summing every `dtype[dims]` occurrence)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue  # token/opaque
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def parse_entry_buffers(hlo_text: str) -> List[dict]:
    """Per-instruction output-buffer sizes for the ENTRY computation.

    Returns [{name, bytes, op, op_name, line}] for every non-parameter
    instruction in ENTRY. Instructions inside fused computations / reducer
    bodies are skipped (they never touch HBM)."""
    out = []
    in_entry = False
    for raw in hlo_text.splitlines():
        line = raw.strip()
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line == "}":
            in_entry = False
            continue
        if not in_entry or "=" not in line:
            continue
        m = re.match(r"(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)", line)
        if not m:
            continue
        name, rest = m.groups()
        # result type is everything before the opcode token
        tm = re.match(r"((?:\([^)]*\)|\w+\[[0-9,]*\](?:\{[^}]*\})?))\s+([\w\-]+)",
                      rest)
        if not tm:
            continue
        type_str, opcode = tm.groups()
        if opcode == "parameter":
            continue
        op_name = ""
        om = _OPNAME_RE.search(line)
        if om:
            op_name = om.group(1)
        out.append({
            "name": name,
            "bytes": shape_bytes(type_str),
            "op": opcode,
            "op_name": op_name,
        })
    return out


def parameter_bytes(hlo_text: str) -> int:
    """Total bytes of ENTRY parameters (weights + inputs read from HBM)."""
    total = 0
    in_entry = False
    for raw in hlo_text.splitlines():
        line = raw.strip()
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line == "}":
            break
        if in_entry and " parameter(" in line:
            m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*?)\s+parameter\(",
                         line)
            if m:
                total += shape_bytes(m.group(1))
    return total


def _scope_key(op_name: str, depth: int) -> str:
    """Collapse a jax op_name scope path to its leading `depth` segments
    after the jit(...) wrapper."""
    parts = [p for p in op_name.split("/") if p]
    if parts and parts[0].startswith("jit("):
        parts = parts[1:]
    return "/".join(parts[:depth]) if parts else "(unattributed)"


def attribute_by_scope(buffers: List[dict], depth: int = 2,
                       top: Optional[int] = None) -> List[Tuple[str, int, int]]:
    """Group ENTRY output buffers by op_name scope prefix.

    Returns [(scope, bytes, count)] sorted by bytes desc."""
    agg: Dict[str, List[int]] = defaultdict(lambda: [0, 0])
    for b in buffers:
        k = _scope_key(b["op_name"], depth)
        agg[k][0] += b["bytes"]
        agg[k][1] += 1
    rows = sorted(((k, v[0], v[1]) for k, v in agg.items()),
                  key=lambda r: -r[1])
    return rows[:top] if top else rows


def attribute_by_dtype(hlo_text: str) -> Dict[str, int]:
    """ENTRY output bytes grouped by element dtype — shows how much of the
    program's materialized traffic is still float in an int8 graph."""
    agg: Dict[str, int] = defaultdict(int)
    in_entry = False
    for raw in hlo_text.splitlines():
        line = raw.strip()
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line == "}":
            break
        if not in_entry or "=" not in line or " parameter(" in line:
            continue
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*)", line)
        if not m:
            continue
        tm = re.match(r"((?:\([^)]*\)|\w+\[[0-9,]*\](?:\{[^}]*\})?))\s+[\w\-]+",
                      m.group(1))
        if not tm:
            continue
        for dtype, dims in _SHAPE_RE.findall(tm.group(1)):
            if dtype not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            agg[dtype] += n * _DTYPE_BYTES[dtype]
    return dict(agg)
