import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; compute kernels are platform-agnostic.
# NOTE: the axon TPU plugin force-prepends itself to jax_platforms at import
# time, so JAX_PLATFORMS=cpu alone is not enough — override the config knob
# after import, before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated test runs skip XLA recompiles.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
