"""Train-step throughput sweep on the real chip: batch size x remat.

VERDICT r1 #4: lift RobustUNet training from 36 img/s. This measures the
full production train epoch (scan of BCE fwd/bwd + Adam + BN updates) for
each config and prints one JSON dict; also dumps an XLA cost analysis of
the train step so conv-bound vs overhead-bound is a measurement, not a
guess.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from coastline.models.robust_unet import RobustUNet
from coastline.train.loop import TrainConfig, create_train_state, make_train_epoch
from coastline.utils.profiling import measure_dispatch_rtt


def measure(batch, remat, n_batches=10, trials=3, rtt=0.0):
    model = RobustUNet(dtype=jnp.bfloat16, remat=remat)
    cfg = TrainConfig(batch_size=batch, lr=1e-4)
    host = np.random.default_rng(0)
    n = batch * 2
    images = jnp.asarray(host.integers(0, 255, (n, 512, 512, 3), dtype=np.uint8))
    masks = jnp.asarray(host.integers(0, 2, (n, 512, 512), dtype=np.uint8))
    idx = jnp.asarray(host.integers(0, n, (n_batches, batch), dtype=np.int32))
    valid = jnp.ones((n_batches, batch), jnp.float32)
    epoch = make_train_epoch(model, cfg)

    state = create_train_state(model, cfg, (1, 512, 512, 3))
    t0 = time.perf_counter()
    state, loss = epoch(state, images, masks, idx, valid)
    float(loss)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        state, loss = epoch(state, images, masks, idx, valid)
        float(loss)
        times.append(time.perf_counter() - t0)
    sec = max(1e-9, min(times) - rtt)
    return batch * n_batches / sec, compile_s


def cost_analysis(batch=8):
    """XLA cost model for one train step at the given batch."""
    model = RobustUNet(dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=batch, lr=1e-4)
    state = create_train_state(model, cfg, (1, 512, 512, 3))

    def step(params, batch_stats, x, y):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                return_logits=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            l = jnp.maximum(out, 0.0) - out * y[..., None] + jnp.log1p(
                jnp.exp(-jnp.abs(out)))
            return l.mean(), upd["batch_stats"]

        (l, s), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return l, g, s

    x = jnp.zeros((batch, 512, 512, 3), jnp.float32)
    y = jnp.zeros((batch, 512, 512), jnp.float32)
    c = jax.jit(step).lower(state.params, state.batch_stats, x, y).compile()
    ca = c.cost_analysis()
    return {k: float(ca[k]) for k in ("flops", "bytes accessed") if k in ca}


def main():
    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)
    out = {"rtt_ms": round(rtt * 1e3, 1)}
    try:
        out["train_step_cost"] = cost_analysis()
        print("cost:", out["train_step_cost"], file=sys.stderr)
    except Exception as e:
        print("cost_analysis failed:", e, file=sys.stderr)
    configs = [(8, False), (16, False), (16, True), (32, True)]
    if len(sys.argv) > 1:  # e.g. "8:conv,16:conv"
        configs = []
        for part in sys.argv[1].split(","):
            b, r = part.split(":")
            configs.append((int(b), {"0": False, "1": True}.get(r, r)))
    for batch, remat in configs:
        key = f"b{batch}_remat{remat if isinstance(remat, str) else int(remat)}"
        try:
            ips, comp = measure(batch, remat, rtt=rtt)
            out[key] = {"images_per_sec": round(ips, 2),
                        "compile_s": round(comp, 1)}
        except Exception as e:
            out[key] = {"error": str(e)[:200]}
        print(key, out[key], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
