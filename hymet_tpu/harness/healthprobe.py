"""Pre-bench compile-service health probe (round-4 review, weak #3).

The dev tunnel's remote compile service swings between ~40 s and 10-40+
minutes PER PROGRAM for hours at a time (docs/BENCH_NOTES.md), and the
aligner's per-bucket compile-failure markers (``dev_broken.json``)
previously healed only via a blind 4 h TTL — so a bench landing in a
healthy window could still run host-chain fallbacks for buckets the
service killed hours earlier. This probe de-randomizes both:

- ``run_probe()`` compiles ONE known-cost program (the unblocked
  chain-reduce at a ~1M-anchor, nonce-perturbed shape that can never hit
  the persistent XLA cache) in a KILLABLE subprocess and classifies the
  window: ``healthy`` when the compile lands under
  ``BENCH_HEALTH_HEALTHY_S`` (default 90 s), ``degraded`` on overrun or
  timeout. The verdict + timing land in ``~/.cache/hymet_tpu/health.json``.
- ``MinimizerAligner`` (``_load_dev_broken``) drops any broken-bucket
  marker RECORDED BEFORE the last healthy probe: the service healed
  since the failure, so the bucket deserves a fresh device-chain attempt
  with no human action and no TTL wait.

Run standalone: ``python -m hymet_tpu.harness.healthprobe`` (prints one
JSON line). The reference has no analog (its compiles are local);
this is dev-tunnel operational tooling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEALTH_PATH = os.path.expanduser("~/.cache/hymet_tpu/health.json")


def read_health() -> dict:
    """Last recorded probe verdict (empty dict when none)."""
    try:
        with open(HEALTH_PATH, encoding="utf-8") as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def last_healthy_ts() -> float:
    """Timestamp of the last ``healthy`` probe verdict, else 0.0."""
    h = read_health()
    return float(h.get("ts", 0.0)) if h.get("verdict") == "healthy" else 0.0


def _write_health(verdict: str, compile_s: float) -> dict:
    rec = {
        "ts": time.time(),
        "verdict": verdict,
        "compile_s": round(compile_s, 1),
    }
    try:
        os.makedirs(os.path.dirname(HEALTH_PATH), exist_ok=True)
        with open(HEALTH_PATH, "w", encoding="utf-8") as f:
            json.dump(rec, f)
    except OSError:
        pass
    return rec


def run_probe(timeout_s: float = 240.0) -> dict:
    """Probe the compile service in a killable child; record + return the
    verdict. Never raises; a timed-out or crashed child reads as
    ``degraded`` (and the child is killed, so no TPU client lingers —
    callers must invoke this BEFORE initializing jax themselves)."""
    env = dict(os.environ)
    env["_HEALTH_PROBE_CHILD"] = "1"
    # the child resolves `-m hymet_tpu...` from its cwd: pin it to the
    # package root so the probe works from any caller directory
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    t0 = time.time()
    try:
        proc = subprocess.Popen(
            [sys.executable, "-m", "hymet_tpu.harness.healthprobe"],
            env=env,
            cwd=pkg_root,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        out, _ = proc.communicate(timeout=timeout_s)
        took = time.time() - t0
        if proc.returncode != 0:
            return _write_health("degraded", took)
        child = json.loads(out.decode().strip().splitlines()[-1])
        return _write_health(child["verdict"], child["compile_s"])
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        return _write_health("degraded", time.time() - t0)
    except Exception:  # noqa: BLE001 — probe must never break a bench
        return _write_health("degraded", time.time() - t0)


def _child_main() -> None:
    """Compile the known-cost program and print one JSON line.

    The shape carries a time-derived nonce so neither the in-process jit
    cache nor the persistent XLA cache can serve it — the measurement is
    always a REAL remote compile. The program is the UNBLOCKED
    chain-reduce at ~1M anchors (log2 full-width scan layers): large
    enough to expose a degraded service within a couple of minutes,
    small enough to cost ~10-60 s in a healthy window."""
    import numpy as np

    from hymet_tpu.utils.jaxtools import (
        apply_platform_override,
        enable_compile_cache,
    )

    apply_platform_override()
    enable_compile_cache()  # the nonce shape misses it; hits cost nothing
    import jax.numpy as jnp

    from hymet_tpu.models.aligner import _KEY_BIG, _chain_reduce_fused

    base = int(os.environ.get("BENCH_HEALTH_ACAP", str(1 << 20)))
    acap = base + 128 * (int(time.time()) % 997 + 1)
    rng = np.random.default_rng(7)
    k1 = np.sort(rng.integers(0, 1 << 31, acap).astype(np.uint32))
    k2 = rng.integers(0, 1 << 24, acap).astype(np.uint32)
    s_p = rng.integers(0, 1 << 20, acap).astype(np.uint32)
    s_r = rng.integers(0, 1 << 20, acap).astype(np.uint32)
    k1[-1] = _KEY_BIG
    k2[-1] = _KEY_BIG
    t0 = time.time()
    rows, n = _chain_reduce_fused(
        jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(s_p), jnp.asarray(s_r),
        k=19, min_cnt=2, min_mlen=30, ccap=1024, block=0,
    )
    int(n)  # block until the program actually ran
    compile_s = time.time() - t0
    healthy_s = float(os.environ.get("BENCH_HEALTH_HEALTHY_S", "90"))
    verdict = "healthy" if compile_s < healthy_s else "degraded"
    print(json.dumps({"verdict": verdict, "compile_s": round(compile_s, 1)}))


if __name__ == "__main__":
    _child_main()
