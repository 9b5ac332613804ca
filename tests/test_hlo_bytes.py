"""utils.hlo_bytes: the HLO byte-ledger parser behind the round-4
roofline attribution (scripts/attr_hlo_bytes.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from coastline.utils.hlo_bytes import (
    attribute_by_dtype,
    attribute_by_scope,
    largest_body,
    parameter_bytes,
    parse_computations,
    parse_entry_buffers,
    shape_bytes,
)

# A miniature post-optimization HLO module: one fusion body (must be
# excluded), one while body (the "scan"), and ENTRY.
FAKE_HLO = """\
HloModule jit_step, entry_computation_layout={...}

%fused_computation.1 (p0: bf16[8,128]) -> bf16[8,128] {
  %p0 = bf16[8,128]{1,0} parameter(0)
  ROOT %m = bf16[8,128]{1,0} multiply(%p0, %p0)
}

%body.2 (arg: (s32[], bf16[8,128])) -> (s32[], bf16[8,128]) {
  %arg = (s32[], bf16[8,128]{1,0}) parameter(0)
  %i = s32[] get-tuple-element(%arg), index=0
  %x = bf16[8,128]{1,0} get-tuple-element(%arg), index=1
  %f = bf16[8,128]{1,0} fusion(%x), kind=kLoop, calls=%fused_computation.1, metadata={op_name="jit(step)/model/layer1/mul" source_file="x.py"}
  ROOT %t = (s32[], bf16[8,128]{1,0}) tuple(%i, %f)
}

ENTRY %main.3 (w: f32[128,128], x: bf16[8,128]) -> bf16[8,128] {
  %w = f32[128,128]{1,0} parameter(0)
  %x = bf16[8,128]{1,0} parameter(1)
  %d = bf16[8,128]{1,0} dot(%x, %w), metadata={op_name="jit(step)/model/dense/dot_general"}
  ROOT %r = bf16[8,128]{1,0} fusion(%d), kind=kLoop, calls=%fused_computation.1, metadata={op_name="jit(step)/model/relu"}
}
"""


def test_shape_bytes():
    assert shape_bytes("bf16[8,128]{1,0}") == 8 * 128 * 2
    assert shape_bytes("(s32[], bf16[8,128]{1,0})") == 4 + 8 * 128 * 2
    assert shape_bytes("f32[128,128]") == 128 * 128 * 4
    assert shape_bytes("token[]") == 0


def test_parse_fake_module():
    comps = parse_computations(FAKE_HLO)
    assert set(comps) == {"fused_computation.1", "body.2", "ENTRY"}

    entry = parse_entry_buffers(FAKE_HLO)
    assert [b["op"] for b in entry] == ["dot", "fusion"]
    assert all(b["bytes"] == 8 * 128 * 2 for b in entry)
    assert parameter_bytes(FAKE_HLO) == 128 * 128 * 4 + 8 * 128 * 2

    # scope attribution strips the jit(...) wrapper and groups by prefix
    rows = attribute_by_scope(entry, depth=2)
    assert ("model/dense", 8 * 128 * 2, 1) in rows
    assert ("model/relu", 8 * 128 * 2, 1) in rows

    by_dtype = attribute_by_dtype(entry)
    assert by_dtype == {"bf16": 2 * 8 * 128 * 2}

    # the while body is the largest non-ENTRY non-fused computation;
    # fusion interiors are never counted
    name, bufs = largest_body(FAKE_HLO)
    assert name == "body.2"
    ops = {b["op"] for b in bufs}
    assert "fusion" in ops and "parameter" not in ops


def test_parse_real_cpu_compile():
    """End-to-end on a real compiled module: totals must cover at least
    the output buffer, and every record must carry non-negative sizes."""

    def f(w, x):
        return jax.nn.relu(jnp.dot(x, w) + 1.0)

    w = jnp.zeros((64, 32), jnp.float32)
    x = jnp.zeros((16, 64), jnp.float32)
    hlo = jax.jit(f).lower(w, x).compile().as_text()
    bufs = parse_entry_buffers(hlo)
    assert bufs, "ENTRY must contain instructions"
    assert sum(b["bytes"] for b in bufs) >= 16 * 32 * 4  # >= the output
    assert parameter_bytes(hlo) == (64 * 32 + 16 * 64) * 4
    assert all(b["bytes"] >= 0 for b in bufs)


# Round-5 parser hardening (ADVICE r4): nested-tuple result types must be
# parsed (while-loop carries are often ((f32[...],...), s32[])), constants/
# iota must not count as HBM writes, and coverage must be reported.
NESTED_HLO = """\
HloModule jit_loop

%body.9 (arg: ((f32[4,8], s32[]), pred[])) -> ((f32[4,8], s32[]), pred[]) {
  %arg = ((f32[4,8]{1,0}, s32[]), pred[]) parameter(0)
  %gte = (f32[4,8]{1,0}, s32[]) get-tuple-element(%arg), index=0
  ROOT %t = ((f32[4,8]{1,0}, s32[]), pred[]) tuple(%gte, %gte)
}

ENTRY %main.1 (x: f32[4,8]) -> f32[4,8] {
  %x = f32[4,8]{1,0} parameter(0)
  %c = f32[4,8]{1,0} constant({...})
  %i = s32[4,8]{1,0} iota(), iota_dimension=0
  ROOT %a = f32[4,8]{1,0} add(%x, %c), metadata={op_name="jit(loop)/add"}
}
"""


def test_nested_tuple_and_constants():
    cov = {}
    comps = parse_computations(NESTED_HLO, coverage=cov)
    # nested-tuple instructions are in the ledger, not silently dropped
    body = [b for b in comps["body.9"] if b["op"] == "tuple"]
    assert len(body) == 1
    assert body[0]["bytes"] == (4 * 8 * 4 + 4) + 1  # (f32[4,8], s32[]) + pred
    gte = [b for b in comps["body.9"] if b["op"] == "get-tuple-element"]
    assert gte and gte[0]["bytes"] == 4 * 8 * 4 + 4
    assert cov["parsed"] >= 6 and cov["skipped"] == 0

    # constants and iota are excluded from output traffic
    entry = parse_entry_buffers(NESTED_HLO)
    assert [b["op"] for b in entry] == ["add"]


def test_bn_frozen_context_manager():
    from coastline.ops import primitives

    assert primitives._BN_FROZEN is False
    try:
        with primitives.bn_frozen():
            assert primitives._BN_FROZEN is True
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    # restored even on error — a leaked True would silently freeze BN
    # statistics for every later training run in the process (ADVICE r4)
    assert primitives._BN_FROZEN is False
