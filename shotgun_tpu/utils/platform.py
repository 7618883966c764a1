"""Backend selection helper.

``SHOTGUN_TPU_PLATFORM`` (e.g. ``cpu``, ``tpu``) overrides the JAX platform
for this process -- applied right after the first jax import, before any
backend is initialized.  Used by tests/CI to force the host CPU backend in
environments where a site hook pre-selects an accelerator.
"""

from __future__ import annotations

import os

_configured = False


def configure_platform() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    plat = os.environ.get("SHOTGUN_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
