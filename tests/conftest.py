import os

# Multi-device CPU mesh for sharding tests; XLA reads this at backend init.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The session environment registers the axon TPU plugin at interpreter start
# and pins jax_platforms to it; unit tests run on the host CPU. The config
# update (not the env var) is what actually wins here.
jax.config.update("jax_platforms", "cpu")

# Golden-parity tests compare against float64 NumPy/SciPy oracles.
jax.config.update("jax_enable_x64", True)
