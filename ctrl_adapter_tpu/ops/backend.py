"""Backend detection shared by the Pallas kernel dispatchers.

Real TPU chips can be exposed under a proxy platform name (this image registers the
chip as platform ``"axon"``, with lowering rules aliased ``axon -> tpu`` so Pallas
TPU kernels lower normally). Dispatch must therefore accept both names — matching on
``"tpu"`` alone silently drops every Pallas kernel on such terminals.

NOT cached: entry points switch ``jax_platforms`` (cpu dryruns/tests) after import, so
dispatch tracks the *current* default backend.
"""

from __future__ import annotations

import jax

_TPU_PLATFORMS = ("tpu", "axon")


def is_tpu_backend() -> bool:
    try:
        return jax.default_backend() in _TPU_PLATFORMS
    except Exception:
        return False
