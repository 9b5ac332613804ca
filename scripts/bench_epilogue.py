"""Measure the ResidualBlock eval epilogue against its bandwidth ideal.

docs/TRAIN_ROOFLINE.md names the CBAM/attention epilogues as the likely
cause of inference's 56-58% HBM efficiency: "each pool/gate breaks a
fusion and re-touches a large activation". Before hand-writing a Pallas
fusion (VERDICT r2 item 4), this isolates the epilogue — the exact
composition `ResidualBlock` applies after its second conv+BN
(`coastline/ops/blocks.py:185-187`, parity with
`/root/reference/Main_Final.py:151-196`):

    out = ChannelAttention(y); out = SpatialAttention(out)
    out = relu(out + shortcut)

at RobustUNet's hot shapes, and reports:
  * measured time (dependency-chained on-device loop, RTT subtracted)
  * XLA cost-analysis bytes --> sustained GB/s
  * the minimum-traffic ideal: 3 reads of y (global avg/max stats;
    channel stats of y*gate; final apply) + 1 read of shortcut + 1 write
    of out = 5 passes over the (B,H,W,C) tensor (small (B,H,W,<=2)
    side tensors counted too), at 819 GB/s v5e HBM peak.

If XLA already sits near the 5-pass ideal the epilogue is NOT where the
inference headroom lives and a Pallas fusion cannot win; the artifact
records that either way. Writes artifacts/bench_epilogue.json.
"""

import json
import sys

import jax
import jax.numpy as jnp
from flax import linen as nn

from coastline.ops.blocks import ChannelAttention, SpatialAttention
from coastline.pallas.cbam import fused_cbam_tail
from coastline.utils.platform import enable_compile_cache
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

HBM_GBPS = 819.0


class Epilogue(nn.Module):
    """Exactly ResidualBlock's post-conv2 tail (blocks.py:185-187)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, y, shortcut):
        out = ChannelAttention(conv_init="kaiming_out", dtype=self.dtype)(y, False)
        out = SpatialAttention(conv_init="kaiming_out", dtype=self.dtype)(out)
        return nn.relu(out + shortcut)


def bench_shape(b, h, w, c, rtt):
    mod = Epilogue()
    rng = jax.random.PRNGKey(0)
    y = jax.random.normal(rng, (b, h, w, c), jnp.bfloat16)
    short = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c), jnp.bfloat16)
    params = mod.init(rng, y, short)

    def apply(p, yy, ss):
        return mod.apply(p, yy, ss)

    p = params["params"]
    fc1 = p["ChannelAttention_0"]["Dense_0"]["kernel"]
    fc2 = p["ChannelAttention_0"]["Dense_1"]["kernel"]
    sk = p["SpatialAttention_0"]["Conv_0"]["Conv_0"]["kernel"]

    # the variadic-reduce 'xla' impl is NOT benchmarked here: this
    # container's remote compiler hangs on variadic reduces (see
    # coastline/pallas/cbam.py:variadic_avg_max) — pallas is the TPU path
    @jax.jit
    def fused(yy, ss):
        return fused_cbam_tail(yy, ss, fc1, fc2, sk, impl="pallas")

    # on-chip parity of the fused path vs the XLA module composition
    # (bf16 compute -> modest tolerance; reduction orders differ)
    ref = jax.jit(apply)(params, y, short)
    got = fused(y, short)
    perr = float(
        jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    assert perr < 0.05, f"fused tail mismatch on chip: {perr}"

    def step(carry, p, yy, ss):
        o = apply(p, yy * (1.0 + carry * 1e-20).astype(yy.dtype), ss)
        return carry + o.mean().astype(jnp.float32)

    def step_fused(carry, yy, ss):
        o = fused(yy * (1.0 + carry * 1e-20).astype(yy.dtype), ss)
        return carry + o.mean().astype(jnp.float32)

    sec = device_loop_seconds(step, (params, y, short), n_loop=50, rtt=rtt)
    sec_fused = device_loop_seconds(step_fused, (y, short), n_loop=50, rtt=rtt)
    ca = jax.jit(apply).lower(params, y, short).compile().cost_analysis()
    big = b * h * w * c * 2  # bf16 bytes of one (B,H,W,C) tensor
    side = b * h * w * 2 * 2 + b * h * w * 1 * 2  # att_in write+read, att map
    ideal_bytes = 5 * big + 2 * side
    ideal_s = ideal_bytes / (HBM_GBPS * 1e9)
    gb = float(ca["bytes accessed"]) / 1e9
    return {
        "shape": [b, h, w, c],
        "ms": round(sec * 1e3, 3),
        "fused_ms": round(sec_fused * 1e3, 3),
        "fused_speedup": round(sec / sec_fused, 2),
        "fused_max_abs_err": round(perr, 4),
        "xla_gbytes": round(gb, 3),
        "sustained_gbps": round(gb / sec, 1),
        "ideal_5pass_gbytes": round(ideal_bytes / 1e9, 3),
        "ideal_ms": round(ideal_s * 1e3, 3),
        "xla_passes_over_big_tensor": round(float(ca["bytes accessed"]) / big, 2),
        "efficiency_vs_ideal": round(ideal_s / sec, 3),
        "fused_efficiency_vs_ideal": round(ideal_s / sec_fused, 3),
    }


SHAPES = ((8, 512, 512, 64), (8, 256, 256, 128), (8, 128, 128, 256),
          (8, 64, 64, 512), (8, 32, 32, 1024))
ART = "artifacts/bench_epilogue.json"


def main(argv=None):
    enable_compile_cache()
    # per-shape incremental caching: the tunnel can wedge mid-run, so each
    # completed shape is persisted immediately and skipped on re-runs
    import argparse
    import os

    p = argparse.ArgumentParser()
    p.add_argument("--redo", action="store_true")
    args = p.parse_args(argv)

    out = {"shapes": []}
    if os.path.exists(ART) and not args.redo:
        out = json.load(open(ART))
    done = {tuple(r["shape"]) for r in out["shapes"] if "fused_ms" in r}

    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    out["rtt_ms"] = round(rtt * 1e3, 1)
    for shp in SHAPES:
        if shp in done:
            continue
        r = bench_shape(*shp, rtt)
        print(json.dumps(r), file=sys.stderr)
        out["shapes"] = [e for e in out["shapes"] if tuple(e["shape"]) != shp]
        out["shapes"].append(r)
        with open(ART, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
