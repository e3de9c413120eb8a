import os
import sys

# The ambient environment forces JAX_PLATFORMS=axon (single tunnelled TPU
# chip).  The test suite must be hermetic and parallel-safe, so force CPU
# with a virtual 8-device mesh and deregister the axon backend factory
# entirely — otherwise backend init dials the TPU relay even under
# JAX_PLATFORMS=cpu and can block on a stale claim.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Import Pallas BEFORE deregistering the tpu backend factory: Pallas
# registers MLIR lowering rules per known platform at import time and
# raises NotImplementedError("unknown platform tpu") if the factory set
# no longer contains "tpu" when it first loads.
import jax.experimental.pallas  # noqa: E402,F401

from jax._src import xla_bridge as _xb  # noqa: E402

for _plat in ("axon", "tpu"):
    _xb._backend_factories.pop(_plat, None)

# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon
# already read; override the cached config value too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the nested while-loop step function costs
# ~40s to compile; cache it across test runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
