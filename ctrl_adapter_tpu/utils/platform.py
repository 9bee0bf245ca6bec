"""Backend selection helper for CLI entry points.

Some TPU terminals expose the chip through a proxy PJRT plugin whose
``sitecustomize`` *programmatically* sets ``jax_platforms`` at interpreter
startup — which silently overrides a user's ``JAX_PLATFORMS=cpu``. Entry points
call :func:`respect_env_platforms` right after importing jax so that an
explicitly exported ``JAX_PLATFORMS`` wins again (the no-override default keeps
whatever the image configured, i.e. the real TPU for ``bench.py``).
"""

from __future__ import annotations

import os


def respect_env_platforms() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        cur = getattr(jax.config, "jax_platforms", None) or ""
        # compare primary platform only: the proxy plugin sets "axon,cpu" and
        # JAX_PLATFORMS=axon must not strip its cpu fallback entry
        if cur.split(",")[0] != env.split(",")[0]:
            jax.config.update("jax_platforms", env)
    except Exception:
        pass  # backend already initialized; too late to switch
