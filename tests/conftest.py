"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding (data-parallel pjit train step, mesh collectives) is validated on a
virtual 8-device CPU mesh, mirroring how the driver's ``dryrun_multichip`` runs. Real-TPU
benchmarks live in ``bench.py``, not in the test suite.
"""

import os

# Must run before jax initializes a backend. NOTE: this image force-sets
# JAX_PLATFORMS=axon (real TPU via sitecustomize), so a plain setdefault is not
# enough — override both the env and the live config below.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache INSIDE the repo (gitignored `.cache/`): fresh containers
# share this checkout, so one warmed run makes later suite runs skip every compile —
# this single-core host pays ~1h of XLA-CPU compile otherwise.
# Partitioned PER HOST-CPU: containers land on different physical hosts, and
# loading another host's XLA:CPU AOT executable (different feature flags)
# segfaults the process (see utils/platform.py host_cpu_cache_dir).
from ctrl_adapter_tpu.utils.platform import host_cpu_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    host_cpu_cache_dir(os.environ.get(
        "CTRL_ADAPTER_JAX_TEST_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "jax_test"),
    )),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
