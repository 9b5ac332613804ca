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
