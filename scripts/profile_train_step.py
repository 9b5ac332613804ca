"""Per-op attribution of the RobustUNet train step on the real chip.

Captures a jax.profiler trace of the jitted full train step (batch 8,
512^2, bf16), converts the XPlane with xprof's hlo_stats tool, and writes
the top ops by self-time to artifacts/train_op_profile.json. This turns
the 30% gap to the HBM roofline (docs/TRAIN_ROOFLINE.md) from a guess
into a table: which fusions/convs run below sustained bandwidth.
"""

import glob
import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

from coastline.models.robust_unet import RobustUNet
from coastline.train.loop import TrainConfig, create_train_state, make_optimizer

B = 8
LOGDIR = "/tmp/coastline-train-trace"
OUT = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / "train_op_profile.json"


def build_step():
    model = RobustUNet(dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=B, lr=1e-4)
    state = create_train_state(model, cfg, (1, 512, 512, 3))
    tx = make_optimizer(cfg.weight_decay)
    host = np.random.default_rng(0)
    x = jnp.asarray(host.normal(size=(B, 512, 512, 3)).astype(np.float32))
    y = jnp.asarray((host.random((B, 512, 512, 1)) > 0.5).astype(np.float32))

    def bce(logits):
        l = logits.astype(jnp.float32)
        return (jnp.maximum(l, 0.0) - l * y + jnp.log1p(jnp.exp(-jnp.abs(l)))).mean()

    def fwd(params, batch_stats):
        out, upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            return_logits=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return bce(out), upd["batch_stats"]

    @jax.jit
    def full_step(params, batch_stats, opt_state):
        (l, s), g = jax.value_and_grad(fwd, has_aux=True)(params, batch_stats)
        updates, new_opt = tx.update(g, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p - 1e-4 * u, params, updates)
        return l, s, new_params, new_opt

    return full_step, (state.params, state.batch_stats, state.opt_state)


def main():
    step, args = build_step()
    l, s, p, o = step(*args)  # compile + warm
    float(l)
    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            l, s, p, o = step(*args)
        float(l)

    planes = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    if not planes:
        print(json.dumps({"error": "no xplane captured"}))
        return
    plane = max(planes, key=lambda p: pathlib.Path(p).stat().st_size)
    print(f"xplane: {plane}", file=sys.stderr)

    from xprof.convert import raw_to_tool_data as rtd

    written = []
    for tool in ("hlo_stats", "op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([pathlib.Path(plane).parent], tool, {})
            out_path = OUT.parent / f"train_trace_{tool}.json"
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            out_path.write_text(data if isinstance(data, str) else json.dumps(data))
            print(f"wrote {out_path}", file=sys.stderr)
            written.append(tool)
        except Exception as e:
            print(f"{tool}: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    print(json.dumps({"captured": plane, "tools_written": written}))


if __name__ == "__main__":
    main()
