"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference's only instrumentation is wall-clock `time.time()` around a
forward pass. Here:

  * `trace(logdir)` — context manager around `jax.profiler` for full XLA
    traces viewable in TensorBoard/Perfetto.
  * `device_loop_seconds` — the library version of the dependency-chained
    on-device timing loop used by bench.py: N iterations inside one jitted
    lax.scan (CSE-proof), one host fetch, optional RTT subtraction. This is
    the only reliable way to time through transports whose completion
    signaling is asynchronous.
"""

import contextlib
import time

import jax
import jax.numpy as jnp
from jax import lax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/coastline-trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def measure_dispatch_rtt(trials: int = 3) -> float:
    trivial = jax.jit(lambda x: x.sum())
    z = jnp.ones((8,))
    float(trivial(z))
    t0 = time.perf_counter()
    for _ in range(trials):
        float(trivial(z))
    return (time.perf_counter() - t0) / trials


def device_loop_seconds(step_fn, args, n_loop: int = 20, trials: int = 3,
                        rtt: float = None) -> float:
    """step_fn(carry_f32_scalar, *args) -> carry. Returns s/iteration."""
    if rtt is None:
        rtt = measure_dispatch_rtt()

    @jax.jit
    def loop(*a):
        return lax.scan(
            lambda c, _: (step_fn(c, *a), None),
            jnp.zeros((), jnp.float32), None, length=n_loop,
        )[0]

    float(loop(*args))  # compile + warm
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(*args))
        times.append(time.perf_counter() - t0)
    return max(1e-9, (min(times) - rtt) / n_loop)
