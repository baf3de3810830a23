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


# -- slow-tier policy (SURVEY §4 / driver round budget) ----------------------
# Default `pytest -q` stays under the round budget; the full sweep tier
# (every SIG_ALGO e2e, property sweeps, proof-level tests) runs with
# --runslow / PZK_SLOW=1 (or just that tier with `-m slow`).

def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow as well")


def pytest_collection_modifyitems(config, items):
    import pytest
    if (config.getoption("--runslow") or os.environ.get("PZK_SLOW") == "1"
            or config.getoption("-m")):
        return
    skip = pytest.mark.skip(reason="slow tier: use --runslow / PZK_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

# Persistent compilation cache: repeated test runs skip XLA recompiles.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
