"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on the CPU backend with 8 virtual devices so that sharding /
collective code paths (pjit over a ("data", "db") mesh) are exercised without
TPU hardware, per the multi-device test strategy in SURVEY.md §4.
"""

import os
import sys

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# f64 on the CPU test backend so LCA parity tests are bit-exact vs the
# reference's Python-float semantics. Device code must stay dtype-explicit —
# HYMET_TEST_X64=0 runs the suite in the production TPU x64-OFF regime to
# catch int-width bugs this divergence has already caused once (CLAUDE.md);
# see tests/test_x64_off.py for the in-suite lane.
_X64 = os.environ.get("HYMET_TEST_X64", "1") == "1"
os.environ.setdefault("JAX_ENABLE_X64", "1" if _X64 else "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# NOTE: `import pytest` already imports jax (jaxtyping's pytest plugin), so
# env vars alone are too late for jax.config defaults. Backends initialize
# lazily, so config.update still takes effect here.
jax.config.update("jax_enable_x64", _X64)
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mini_taxdb():
    """The curated Zymo-panel taxonomy (package asset)."""
    from hymet_tpu.data.zymo_taxonomy import zymo_taxdb

    return zymo_taxdb()
