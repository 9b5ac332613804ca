"""HBM byte attribution from optimized HLO text.

The axon tunnel strips device-side XPlane data from profiler traces
(docs/TRAIN_ROOFLINE.md), so per-op traffic cannot be measured with
`jax.profiler` in this container. This module recovers a close proxy from
the compiled executable itself: in post-optimization HLO, every top-level
instruction of a non-fused computation (ENTRY, or a while/scan body)
materializes its outputs in HBM — fusions hide their interiors, so
summing those output buffers (plus parameter reads) gives the program's
HBM write/read ledger, attributable per instruction via the
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
# computation headers may have nested parens in tuple-typed params
_COMP_RE = re.compile(r"(ENTRY\s+)?%?([\w.\-]+)\s*\(.*\)\s*->.*\{$")
_INSTR_RE = re.compile(r"(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)")
_ARRAY_TYPE_RE = re.compile(r"\w+\[[0-9,]*\](?:\{[^}]*\})?")
_OPCODE_RE = re.compile(r"\s*([\w\-]+)")

#: ops whose result is not real HBM traffic: constants/iota are materialized
#: once at load (or folded), parameters are counted separately as reads
_NON_TRAFFIC_OPS = {"constant", "iota", "parameter"}


def _split_type_op(rest: str):
    """Split an instruction RHS into (result-type string, opcode).

    Tuple result types may nest arbitrarily (while-loop carries are often
    ((f32[...], ...), s32[]) ), so the type is found with a paren-balanced
    scan, not a regex (ADVICE r4: the old \\([^)]*\\) alternative silently
    dropped every nested-tuple instruction from the ledger)."""
    if rest.startswith("("):
        depth = 0
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    type_str = rest[: i + 1]
                    om = _OPCODE_RE.match(rest[i + 1:])
                    return (type_str, om.group(1)) if om else None
        return None
    m = _ARRAY_TYPE_RE.match(rest)
    if not m:
        return None
    om = _OPCODE_RE.match(rest[m.end():])
    return (m.group(0), om.group(1)) if om else None

#: key under which the ENTRY computation appears in parse_computations
ENTRY = "ENTRY"


def _dtype_elems(type_str: str) -> Dict[str, int]:
    """Per-dtype byte counts for every array shape in an HLO result-type
    string (tuples contribute each member)."""
    out: Dict[str, int] = defaultdict(int)
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue  # token/opaque
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out[dtype] += n * _DTYPE_BYTES[dtype]
    return dict(out)


def shape_bytes(type_str: str) -> int:
    """Total bytes of all array shapes in an HLO result-type string."""
    return sum(_dtype_elems(type_str).values())


def parse_computations(hlo_text: str,
                       coverage: Optional[dict] = None) -> Dict[str, List[dict]]:
    """Per-computation instruction buffers for an HLO module.

    Returns {computation_name: [{name, bytes, by_dtype, op, op_name}]}
    with parameters included as op == "parameter" (callers filter). The
    ENTRY computation is keyed by `ENTRY` ("ENTRY") regardless of its
    module-assigned name.

    Pass a dict as `coverage` to receive {"parsed": N, "skipped": N} —
    instruction lines inside a computation whose result type could not be
    parsed (so consumers can see the proxy's coverage, ADVICE r4).
    """
    comps: Dict[str, List[dict]] = {}
    cur: Optional[List[dict]] = None
    parsed = skipped = 0
    for raw in hlo_text.splitlines():
        line = raw.strip()
        cm = _COMP_RE.match(line)
        if cm:
            key = ENTRY if cm.group(1) else cm.group(2)
            cur = comps.setdefault(key, [])
            continue
        if line == "}":
            cur = None
            continue
        if cur is None or "=" not in line:
            continue
        im = _INSTR_RE.match(line)
        if not im:
            skipped += 1
            continue
        name, rest = im.groups()
        to = _split_type_op(rest)
        if to is None:
            skipped += 1
            continue
        type_str, opcode = to
        parsed += 1
        om = _OPNAME_RE.search(line)
        by_dtype = _dtype_elems(type_str)
        cur.append({
            "name": name,
            "bytes": sum(by_dtype.values()),
            "by_dtype": by_dtype,
            "op": opcode,
            "op_name": om.group(1) if om else "",
        })
    if coverage is not None:
        coverage["parsed"] = parsed
        coverage["skipped"] = skipped
    return comps


def _outputs(buffers: List[dict]) -> List[dict]:
    """Real HBM-traffic output buffers: parameters are reads (counted by
    `parameter_bytes`), constants/iota are load-time or folded, not
    per-call writes (ADVICE r4)."""
    return [b for b in buffers if b["op"] not in _NON_TRAFFIC_OPS]


def parse_entry_buffers(hlo_text: str) -> List[dict]:
    """Output-buffer records for the ENTRY computation (no parameters)."""
    return _outputs(parse_computations(hlo_text).get(ENTRY, []))


def parameter_bytes(hlo_text: str) -> int:
    """Total bytes of ENTRY parameters (weights + inputs read from HBM)."""
    return sum(b["bytes"]
               for b in parse_computations(hlo_text).get(ENTRY, [])
               if b["op"] == "parameter")


def largest_body(hlo_text: str) -> Tuple[Optional[str], List[dict]]:
    """The largest non-ENTRY, non-fusion computation (typically a
    while/scan body) and its output buffers — where a `lax.scan` epoch's
    per-iteration traffic lives."""
    best, best_bufs, best_bytes = None, [], 0
    for name, bufs in parse_computations(hlo_text).items():
        if name == ENTRY or name.startswith(("fused_", "region_")):
            continue
        outs = _outputs(bufs)
        total = sum(b["bytes"] for b in outs)
        if total > best_bytes:
            best, best_bufs, best_bytes = name, outs, total
    return best, best_bufs


def _scope_key(op_name: str, depth: int) -> str:
    """Collapse a jax op_name scope path to its leading `depth` segments
    after the jit(...) wrapper."""
    parts = [p for p in op_name.split("/") if p]
    if parts and parts[0].startswith("jit("):
        parts = parts[1:]
    return "/".join(parts[:depth]) if parts else "(unattributed)"


def attribute_by_scope(buffers: List[dict], depth: int = 2,
                       top: Optional[int] = None) -> List[Tuple[str, int, int]]:
    """Group output buffers by op_name scope prefix.

    Returns [(scope, bytes, count)] sorted by bytes desc."""
    agg: Dict[str, List[int]] = defaultdict(lambda: [0, 0])
    for b in buffers:
        k = _scope_key(b["op_name"], depth)
        agg[k][0] += b["bytes"]
        agg[k][1] += 1
    rows = sorted(((k, v[0], v[1]) for k, v in agg.items()),
                  key=lambda r: -r[1])
    return rows[:top] if top else rows


def attribute_by_dtype(buffers: List[dict]) -> Dict[str, int]:
    """Output bytes grouped by element dtype — shows how much of a
    program's materialized traffic is still float in an int8 graph."""
    agg: Dict[str, int] = defaultdict(int)
    for b in buffers:
        for dtype, n in b["by_dtype"].items():
            agg[dtype] += n
    return dict(agg)
