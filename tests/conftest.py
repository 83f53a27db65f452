"""Test harness configuration.

Mirrors the reference's multi-backend strategy (one suite, N array types —
/root/reference/test/runtests.jl:1-15): the suite runs on a virtual
8-device CPU mesh so sharding tests validate multi-chip semantics without
TPU hardware; the same tests pass unchanged on a real TPU when
RLS_TPU_TEST_PLATFORM=tpu is set.
"""

import os

# Force the CPU backend with a virtual 8-device mesh unless the user
# explicitly requests the real TPU (RLS_TPU_TEST_PLATFORM=tpu). The driver
# environment pins JAX_PLATFORMS to the tunneled TPU, which is both slow for
# a large unit-test suite and not multi-device.
_platform = os.environ.get("RLS_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
# "tpu" (or any other value): KEEP the environment's JAX_PLATFORMS — the
# attached chip's plugin may be named differently (e.g. the tunneled
# "axon" runtime), so forcing JAX_PLATFORMS=tpu would fail to initialize.

import jax  # noqa: E402

if _platform == "cpu":
    # jax may already be imported by a pytest plugin; the config update
    # still wins as long as no backend has been initialized yet.
    jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped on purpose: a shared (session-scoped) Generator makes
    # every test's data depend on which tests ran before it, so adding a
    # test anywhere silently changes unrelated tests' fixtures
    return np.random.default_rng(1234)


@pytest.fixture(scope="session", params=["float32", "complex64"])
def dtype(request):
    return np.dtype(request.param)
