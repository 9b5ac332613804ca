"""Decompose the RobustUNet train step's time and bytes on the real chip.

Measures, at batch 8 / 512^2 / bf16, with the on-device dependency-chained
loop (tunnel-safe):
  fwd        — training-mode forward (BN batch stats + dropout) + BCE loss
  fwd_bwd    — value_and_grad of the same
  full_step  — fwd_bwd + Adam/weight-decay update (the production step)
and pairs each with XLA cost-analysis flops / bytes-accessed, so the gap
between 36 img/s trained and 124 img/s inferred (BENCH_r01) is attributed
to measured sub-costs instead of guesses (VERDICT r1 item 4).
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from coastline.models.robust_unet import RobustUNet
from coastline.train.loop import TrainConfig, create_train_state, make_optimizer
from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt

B = 8
REMAT = sys.argv[1] if len(sys.argv) > 1 else False


def main():
    rtt = measure_dispatch_rtt()
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)
    model = RobustUNet(dtype=jnp.bfloat16, remat=REMAT)
    cfg = TrainConfig(batch_size=B, lr=1e-4)
    state = create_train_state(model, cfg, (1, 512, 512, 3))
    tx = make_optimizer(cfg.weight_decay)
    host = np.random.default_rng(0)
    x = jnp.asarray(host.normal(size=(B, 512, 512, 3)).astype(np.float32))
    y = jnp.asarray((host.random((B, 512, 512, 1)) > 0.5).astype(np.float32))

    def bce(logits):
        l = logits.astype(jnp.float32)
        return (jnp.maximum(l, 0.0) - l * y + jnp.log1p(jnp.exp(-jnp.abs(l)))).mean()

    def fwd(params, batch_stats, xi):
        out, upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, xi, train=True,
            return_logits=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return bce(out), upd["batch_stats"]

    def fwd_bwd(params, batch_stats, xi):
        (l, s), g = jax.value_and_grad(fwd, has_aux=True)(params, batch_stats, xi)
        return l, s, g

    def full_step(params, batch_stats, opt_state, xi):
        (l, s), g = jax.value_and_grad(fwd, has_aux=True)(params, batch_stats, xi)
        updates, new_opt = tx.update(g, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p - cfg.lr * u, params, updates)
        return l, s, new_params, new_opt

    out = {"batch": B, "remat": str(REMAT), "rtt_ms": round(rtt * 1e3, 1)}

    def tree_probe(t):
        """Tiny scalar that depends on every leaf — defeats DCE of the
        backward/optimizer without adding measurable work."""
        return sum(jnp.ravel(l)[0].astype(jnp.float32) for l in jax.tree.leaves(t))

    def fwd_step(c, p, s):
        l, new_s = fwd(p, s, x * (1.0 + c * 1e-20))
        return c + l + tree_probe(new_s)

    def fwd_bwd_step(c, p, s):
        l, new_s, g = fwd_bwd(p, s, x * (1.0 + c * 1e-20))
        return c + l + tree_probe(new_s) + tree_probe(g)

    def full_step_step(c, p, s, o):
        l, new_s, new_p, new_o = full_step(p, s, o, x * (1.0 + c * 1e-20))
        return c + l + tree_probe(new_s) + tree_probe(new_p)

    variants = {
        "fwd": (
            fwd_step,
            (state.params, state.batch_stats),
            lambda p, s: jax.jit(fwd).lower(p, s, x),
        ),
        "fwd_bwd": (
            fwd_bwd_step,
            (state.params, state.batch_stats),
            lambda p, s: jax.jit(fwd_bwd).lower(p, s, x),
        ),
        "full_step": (
            full_step_step,
            (state.params, state.batch_stats, state.opt_state),
            lambda p, s, o: jax.jit(full_step).lower(p, s, o, x),
        ),
    }
    for name, (step, args, lower) in variants.items():
        sec = device_loop_seconds(step, args, n_loop=10, trials=2)
        entry = {"ms": round(sec * 1e3, 2), "images_per_sec": round(B / sec, 2)}
        try:
            ca = lower(*args).compile().cost_analysis()
            entry["gflops"] = round(float(ca["flops"]) / 1e9, 1)
            entry["gbytes"] = round(float(ca["bytes accessed"]) / 1e9, 2)
            entry["bw_gbps"] = round(entry["gbytes"] / sec, 1)
            entry["tflops_per_s"] = round(entry["gflops"] / sec / 1e3, 1)
        except Exception as e:
            entry["cost_error"] = str(e)[:120]
        out[name] = entry
        print(name, entry, file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
