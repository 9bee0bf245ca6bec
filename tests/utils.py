"""Test helpers: fast param fabrication without XLA compiles.

flax ``init`` is expensive on this single-core host (jitted: big XLA compiles; eager:
unjitted threefry PRNG). For behavior tests the init *values* rarely matter, so we
eval_shape the init (pure tracing) and fill params with numpy randomness.
"""

import jax
import jax.numpy as jnp
import numpy as np


def fake_init(module, *args, seed=0, scale=0.02, **kwargs):
    """Fabricate a param tree matching ``module.init`` shapes (numpy-filled)."""
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(seed)

    def fill(s):
        return jnp.asarray(rng.standard_normal(s.shape).astype(np.float32) * scale)

    return jax.tree.map(fill, shapes)


def eager_apply(module, params, *args, **kwargs):
    """Jitted apply (non-array args and kwargs stay static) — with the persistent
    compile cache this is the fastest option on this host: compile once, then ~instant."""

    def is_dynamic(a):
        return isinstance(a, (jnp.ndarray, np.ndarray)) or (
            isinstance(a, (list, tuple)) and len(a) > 0 and isinstance(a[0], (jnp.ndarray, np.ndarray))
        )

    dynamic = {i: a for i, a in enumerate(args) if is_dynamic(a)}

    def fn(p, dyn):
        full = [dyn[i] if i in dyn else args[i] for i in range(len(args))]
        return module.apply(p, *full, **kwargs)

    return jax.jit(fn)(params, dynamic)
