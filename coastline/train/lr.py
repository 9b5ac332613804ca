"""ReduceLROnPlateau as a pure JAX state machine.

torch's scheduler is stateful host code; here it is a tiny pytree update
that can live inside a jitted epoch (SURVEY.md §7 "hard parts"). Semantics
match torch defaults: mode='min', threshold=1e-4 (relative), cooldown=0,
min_lr=0 — lr is multiplied by `factor` once `num_bad` exceeds `patience`.

The reference wires it two ways: stepped on *train* loss with patience 5
(`Main_Final.py:553,622`, `Extended_Baseline_Comparison.py`) and on *val*
loss with patience 3 / 10 (`comne.py:723`, `train_water_segmentation.py:
308-310`). The choice is the caller's (see train.loop.TrainConfig).
"""

import jax.numpy as jnp
from flax import struct


class PlateauState(struct.PyTreeNode):
    lr: jnp.ndarray  # current learning rate (f32 scalar)
    best: jnp.ndarray  # best metric seen
    num_bad: jnp.ndarray  # epochs without improvement


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.asarray(0, jnp.int32),
    )


def plateau_update(
    state: PlateauState,
    metric,
    patience: int,
    factor: float = 0.5,
    threshold: float = 1e-4,
    min_lr: float = 0.0,
) -> PlateauState:
    metric = jnp.asarray(metric, jnp.float32)
    improved = metric < state.best * (1.0 - threshold)
    best = jnp.where(improved, metric, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce = num_bad > patience
    lr = jnp.where(reduce, jnp.maximum(state.lr * factor, min_lr), state.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(lr=lr, best=best, num_bad=num_bad)
