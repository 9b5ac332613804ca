"""Per-architecture bf16-vs-int8 serving throughput on the real chip.

Completes the QUANT.md adoption table for every arch beyond the four
already measured (robust_unet/unet/segnet/deeplabv3p): the U-Net-shaped
MSWNet (24.8M params) and WaterNet (7.7M — predicted wins like
UNet/SegNet), the strided-encoder PSPNet (6.5M — predicted loss like
DeepLabV3+), and the round-3 zoo completions YOLOSeg, HRNet-Water,
Fast-SCNN, ENet and SegFormer-Lite. Mock calibration scales are fine
for timing (the graph is identical regardless of scale values); accuracy
is gated separately (tests/test_quant.py).

Tiny-shape compiles run before every 512² program — a failed remote
compile wedges the tunnel ~50 min (CLAUDE.md), so novel HLO never goes
to the chip at production shape first.

Writes artifacts/quant_archs.json.
"""

import json
import pathlib
import sys

from coastline.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from coastline.infer import quant
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "artifacts" / "quant_archs.json")
B = 8

MODELS = {
    "mswnet": ("coastline.models.mswnet", "MSWNet"),
    "waternet": ("coastline.models.waternet", "WaterNet"),
    "pspnet": ("coastline.models.pspnet", "PSPNet"),
    "yoloseg": ("coastline.models.yoloseg", "YOLOSeg"),
    "hrnet_water": ("coastline.models.hrnet_water", "HRNetWater"),
    "fastscnn": ("coastline.models.fastscnn", "FastSCNN"),
    "enet": ("coastline.models.enet", "ENet"),
    "segformer_lite": ("coastline.models.segformer_lite", "SegFormerLite"),
}


def main():
    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    rng = jax.random.PRNGKey(0)
    out = {"batch": B, "rtt_ms": round(rtt * 1e3, 1)}

    for arch, (mod, cls) in MODELS.items():
        M = getattr(__import__(mod, fromlist=[cls]), cls)
        model = M(dtype=jnp.bfloat16)
        x1 = jax.random.normal(rng, (1, 512, 512, 3), jnp.float32)
        v = model.init({"params": rng, "dropout": rng}, x1)
        v = {"params": v["params"], "batch_stats": v["batch_stats"]}

        folded = quant.ARCHS[arch][0](v)
        calib = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 512, 3),
                                  jnp.float32)
        scales = quant.calibrate(folded, calib, batch_size=2, arch=arch)
        qp = quant.quantize_folded(folded)

        # tiny-shape compile probe first (novel HLO pattern safety)
        xt = jax.random.normal(rng, (2, 64, 64, 3), jnp.float32)
        st = quant.calibrate(folded, xt, batch_size=2, arch=arch)
        jax.jit(lambda p, xx: quant.int8_forward(p, st, xx, arch=arch)
                )(qp, xt).block_until_ready()
        print(f"{arch}: tiny-shape int8 compile OK", file=sys.stderr)

        xb = jax.random.normal(rng, (B, 512, 512, 3), jnp.float32)

        def bf16_step(c, p, s, xx):
            y = model.apply({"params": p, "batch_stats": s},
                            xx * (1.0 + c * 1e-20), train=False)
            return c + y.mean().astype(jnp.float32)

        sec = device_loop_seconds(
            bf16_step, (v["params"], v["batch_stats"], xb), n_loop=10,
            trials=3, rtt=rtt)
        bf16 = {"ms": round(sec * 1e3, 2), "images_per_sec": round(B / sec, 2)}

        def int8_step(c, p, xx):
            y = quant.int8_forward(p, scales, xx * (1.0 + c * 1e-20),
                                   arch=arch)
            return c + y.mean().astype(jnp.float32)

        sec8 = device_loop_seconds(int8_step, (qp, xb), n_loop=10,
                                   trials=3, rtt=rtt)
        int8 = {"ms": round(sec8 * 1e3, 2),
                "images_per_sec": round(B / sec8, 2)}
        out[arch] = {"bf16": bf16, "int8": int8,
                     "speedup": round(sec / sec8, 3)}
        print(arch, json.dumps(out[arch]), file=sys.stderr)

    OUT.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
