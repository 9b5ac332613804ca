"""Platform override for CLI entry points.

Set COASTLINE_PLATFORM=cpu (plus optionally
XLA_FLAGS=--xla_force_host_platform_device_count=N before python starts) to
run any CLI on host CPU — e.g. for CI or multichip simulation. Needed
because some deployments pin JAX_PLATFORMS at interpreter startup, so a
plain env var cannot override it; jax.config can.
"""

import os


def apply_platform_override():
    plat = os.environ.get("COASTLINE_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_compile_cache(path: str = None):
    """Persistent XLA compile cache (same store the test conftest uses).

    Benchmarks/CLIs compile multi-minute programs; caching makes re-runs
    resume instantly after an interrupted session or a wedged transport.
    """
    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
