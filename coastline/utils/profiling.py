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
import numpy as np
from jax import lax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/coastline-trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _warm(loop, args, retries: int = 2, backoff_s: float = 20.0):
    """Compile + warm a timing loop, retrying transient remote-compile
    failures (the TPU tunnel sporadically drops a response mid-body; the
    retry recompiles cleanly). Non-transient errors re-raise immediately."""
    for attempt in range(retries + 1):
        try:
            float(loop(*args))
            return
        except Exception as e:  # jax wraps transport errors opaquely
            transient = any(
                s in str(e) for s in ("remote_compile", "response body",
                                      "HTTP 500", "DEADLINE_EXCEEDED")
            )
            if not transient or attempt == retries:
                raise
            time.sleep(backoff_s * (attempt + 1))


def measure_dispatch_rtt(trials: int = 3) -> float:
    trivial = jax.jit(lambda x: x.sum())
    z = jnp.ones((8,))
    float(trivial(z))
    t0 = time.perf_counter()
    for _ in range(trials):
        float(trivial(z))
    return (time.perf_counter() - t0) / trials


def device_loop_seconds(step_fn, args, n_loop: int = 20, trials: int = 3,
                        rtt: float = None, target_ratio: float = 20.0,
                        max_loop: int = 20_000) -> float:
    """step_fn(carry_f32_scalar, *args) -> carry. Returns s/iteration.

    The loop count auto-scales until the on-device loop time is at least
    `target_ratio` x the dispatch RTT — for a sub-millisecond step behind a
    ~30 ms transport, a fixed short loop measures pure RTT noise (this was
    exactly the round-1 "0.00 ms" latency bug). One recalibration recompile
    at most.
    """
    if rtt is None:
        rtt = measure_dispatch_rtt()

    # Pin args to the device ONCE. Host-resident (numpy) arg trees would be
    # re-uploaded through the transport on every timed call, and because
    # n_loop auto-scales inversely with the step time the inflation is
    # MULTIPLICATIVE, not additive — a 400MB numpy param tree measured a
    # healthy graph 4-6x slow (round-3 int8 quant bench post-mortem).
    args = jax.device_put(args)

    def make_loop(n):
        @jax.jit
        def loop(*a):
            return lax.scan(
                lambda c, _: (step_fn(c, *a), None),
                jnp.zeros((), jnp.float32), None, length=n,
            )[0]
        return loop

    loop = make_loop(n_loop)
    _warm(loop, args)  # compile + warm (retries transient tunnel errors)
    t0 = time.perf_counter()
    float(loop(*args))
    t = time.perf_counter() - t0

    needed = target_ratio * rtt
    if t - rtt < needed:
        # Estimate per-iteration time. The floor of t/(10*n) guards against
        # a noisy-high RTT making (t - rtt) collapse: it bounds the scaled
        # loop's single blocking dispatch to ~10x `needed` even in the worst
        # case (long blocking calls can wedge the TPU tunnel).
        per_iter = max((t - rtt) / n_loop, t / (10.0 * n_loop), 1e-7)
        scaled = min(max_loop, int(np.ceil(needed / per_iter)))
        if scaled > n_loop:
            n_loop = scaled
            loop = make_loop(n_loop)
            _warm(loop, args)

    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(*args))
        times.append(time.perf_counter() - t0)
    return max(1e-9, (min(times) - rtt) / n_loop)
