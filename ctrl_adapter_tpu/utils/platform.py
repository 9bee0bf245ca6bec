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


def host_cpu_cache_dir(base: str) -> str:
    """Partition a jax compilation-cache dir by the host's CPU feature set.

    The checkout-shared cache (`.cache/jax_test`) is reused by containers on
    DIFFERENT physical hosts; XLA:CPU AOT executables embed the compile
    machine's feature flags (amx/avx512 subsets, prefer-no-scatter, ...) and
    deserializing one on a host without those features crashes the process
    (observed: SIGSEGV inside compilation_cache.get_executable_and_time;
    cpu_aot_loader warns "could lead to execution errors such as SIGILL").
    TPU executables are device code and stay in the shared base dir.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.md5(line.encode()).hexdigest()[:10]
                    break
            else:
                tag = "noflags"
    except OSError:
        tag = "nocpuinfo"
    if os.path.basename(base) == f"cpu-{tag}":  # idempotent
        return base
    return os.path.join(base, f"cpu-{tag}")


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
