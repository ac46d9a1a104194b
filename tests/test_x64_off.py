"""x64-OFF lane: run the device-path test modules in the production TPU
numeric regime (jax_enable_x64=False).

The main suite runs x64-ON for bit-exact parity with the reference's
Python-float semantics; production TPU runs x64-OFF, and that divergence
has already produced one real bug (a bare Python int > 2^31 reaching jit
args — CLAUDE.md). This meta-test subprocess-runs the device-path
modules with HYMET_TEST_X64=0 (tests/conftest.py wires it through to
jax.config) so the int-width bug class stays covered in-suite.

Scope: the modules exercising device compute paths (aligner, sketch,
LCA, hashing, minimizer/compaction, parallel sharding). Host-side
parsing/eval modules are numerically x64-independent and byte-parity
covered elsewhere.
"""

import os
import subprocess
import sys

import pytest

_DEVICE_PATH_MODULES = [
    "tests/test_aligner.py",
    "tests/test_sketch.py",
    "tests/test_lca.py",
    "tests/test_hashing.py",
    "tests/test_compaction.py",
]


@pytest.mark.slow
def test_device_paths_x64_off():
    env = dict(os.environ)
    env["HYMET_TEST_X64"] = "0"
    env.pop("JAX_ENABLE_X64", None)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider", *_DEVICE_PATH_MODULES],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        "x64-off device-path lane failed:\n" + proc.stdout[-4000:] + proc.stderr[-2000:]
    )
