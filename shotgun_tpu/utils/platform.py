"""Backend selection + persistent compilation cache.

``SHOTGUN_TPU_PLATFORM`` (e.g. ``cpu``, ``tpu``) overrides the JAX platform
for this process -- applied right after the first jax import, before any
backend is initialized.  Used by tests/CI to force the host CPU backend in
environments where a site hook pre-selects an accelerator.

The persistent compilation cache amortizes the cold-compile cost of the
align pipeline across CLI invocations (the reference's build-once
align-many ``.kdb`` workflow, reference kmer.py:265-282, has the same
goal): a warm ``dumpalign`` reuses the serialized executable instead of
repaying the full XLA compile.  Directory: ``SHOTGUN_TPU_CACHE_DIR`` or
``~/.cache/shotgun_tpu/xla_cache``; disable with
``SHOTGUN_TPU_CACHE_DIR=0``.
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
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)

    cache_dir = os.environ.get("SHOTGUN_TPU_CACHE_DIR")
    if cache_dir == "0":
        return
    # CPU compiles are fast and the CPU AOT cache is brittle across
    # machine-feature fingerprints; the cache exists to amortize the
    # ~80s TPU align-pipeline compile across CLI invocations
    if (plat or os.environ.get("JAX_PLATFORMS", "")).startswith("cpu"):
        return
    if not cache_dir:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "shotgun_tpu", "xla_cache"
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # the align executables compile in 1-80s; cache all of them, and
        # anything else that takes more than a trivial trace
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
