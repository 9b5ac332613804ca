"""Adaptive device-loop timing tests (CPU; the semantics the round-1
"0.00 ms latency" fix depends on)."""

import jax.numpy as jnp

from coastline.utils.profiling import device_loop_seconds, measure_dispatch_rtt


def _step(c, x):
    return c + (x * (1.0 + c * 1e-20)).sum()


def test_returns_positive_per_iteration_time():
    x = jnp.ones((64, 64))
    sec = device_loop_seconds(_step, (x,), n_loop=5, trials=2, rtt=0.0)
    assert sec > 1e-9  # not the clamp floor


def test_scales_loop_until_device_time_dominates_rtt():
    """With an artificially huge RTT, a cheap step must be looped enough
    that the measurement is not pure RTT noise: the scaled loop's total
    device time must reach ~target_ratio x rtt (bounded by max_loop)."""
    x = jnp.ones((8, 8))
    fake_rtt = 0.05  # 50 ms "transport" on a ~microsecond step
    sec = device_loop_seconds(_step, (x,), n_loop=4, trials=2, rtt=fake_rtt,
                              target_ratio=5.0, max_loop=50_000)
    # A 8x8 sum step on CPU is far under a millisecond; if the loop had
    # stayed at n_loop=4, (t - rtt) would be dominated by the fake rtt and
    # the result would be wildly negative/clamped or ~12.5 ms/iter. The
    # adaptive scale-up must bring it under 1 ms/iter.
    assert 0 < sec < 1e-3


def test_measure_dispatch_rtt_smoke():
    rtt = measure_dispatch_rtt(trials=2)
    assert 0 <= rtt < 5.0
