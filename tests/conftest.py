"""Test harness: force an 8-device virtual CPU platform before JAX import.

Multi-chip sharding paths are validated on this virtual mesh (the TPU answer
to "multi-node without a cluster" — the reference only ever tested DDP on real
GPUs, SPIRAL/README.md:25-56).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# some pytest plugin imports jax before this conftest runs, which freezes the
# env-var defaults into jax.config — override via config (backend init is lazy)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# this host's XLA:CPU lowers default-precision matmuls/convs onto
# bf16-capable instructions (avx512bf16/AMX) — ~3e-3 relative error, which
# poisons parity tolerances. Pin true fp32 for the test tier.
jax.config.update("jax_default_matmul_precision", "highest")

# this box has ONE cpu: XLA compiles dominate test wall time. Cache compiled
# executables across test processes/runs (safe: keyed on HLO + flags).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TPU_SPEECH_TEST_CACHE", "/tmp/tpu_speech_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tests (run `pytest -m 'not slow'` for the quick tier)",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
