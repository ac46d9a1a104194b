"""Benchmark timing core, importable so its semantics are testable.

bench.py's round-2 history shows measurement code has bugs of its own:
on the tunneled dev runtime, ``block_until_ready()`` on a
donation-aliased buffer returned BEFORE execution, yielding "0.000 s"
groups while a later stage absorbed the deferred work
(docs/BENCH_NOTES.md, large-F section). The two invariants that fix
classes of such bugs live here:

- :func:`force_readback` — timing must end with an actual device->host
  fetch of result bytes, because only a readback orders after execution
  on every runtime;
- :func:`timed_groups` — the repeat/deadline protocol (at least one
  run, aim for ``min_runs``, never exceed ``max_runs`` or run past the
  budget once a result exists) in one place instead of four hand-rolled
  loops.
"""

from __future__ import annotations

import time
from typing import Callable, List, Tuple

import numpy as np


def force_readback(out) -> None:
    """Fetch a few bytes of the first array leaf of ``out``.

    ``block_until_ready`` on a donation-aliased buffer can return before
    the producing program executes on remote runtimes; an actual
    readback cannot. The fetch is O(1) bytes (first element of the first
    leaf), so tunnel transfer time is never billed to the timed work.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    if getattr(leaf, "ndim", 0):
        leaf = leaf[(slice(0, 1),) * leaf.ndim]
    np.asarray(leaf)


def timed_groups(
    run_group: Callable[[], object],
    *,
    min_runs: int,
    max_runs: int,
    budget_s: float,
    clock: Callable[[], float] = time.monotonic,
) -> List[Tuple[float, object]]:
    """Run ``run_group`` repeatedly; return [(seconds, result)] per run.

    Protocol: always at least one run; keep running toward ``min_runs``
    and opportunistically up to ``max_runs``, but stop as soon as the
    wall-clock budget is spent and at least one timing exists (a bench
    on a 20x-variance device must bound its own wall time — CLAUDE.md).
    ``run_group`` itself must force execution of the work it times (see
    :func:`force_readback`).
    """
    if min_runs < 1 or max_runs < min_runs:
        raise ValueError("need 1 <= min_runs <= max_runs")
    runs: List[Tuple[float, object]] = []
    deadline = clock() + budget_s
    while len(runs) < min_runs or (clock() < deadline and len(runs) < max_runs):
        if runs and clock() > deadline:
            break
        t0 = clock()
        out = run_group()
        runs.append((clock() - t0, out))
    return runs


def best_run(runs: List[Tuple[float, object]]) -> Tuple[float, object]:
    """(seconds, result) of the fastest run."""
    return min(runs, key=lambda r: r[0])


def spread_note(runs: List[Tuple[float, object]]) -> str:
    """Human summary quoting best / median / worst over n runs — benches
    on this device must disclose run spread (ADVICE.md round 2)."""
    times = sorted(r[0] for r in runs)
    return (
        f"best {times[0]:.3f}s median {times[len(times) // 2]:.3f}s "
        f"worst {times[-1]:.3f}s over {len(times)} runs"
    )


def tag_fallback(result: dict, fell_back: bool) -> dict:
    """Suffix the metric name when the run fell back to the CPU backend,
    so the number can never be read as a TPU result."""
    if fell_back:
        result = dict(result)
        result["metric"] += "_cpu_fallback"
    return result


def warmup_reaction(timed_out: bool, returncode, wedge_wait_s: float = 600.0) -> dict:
    """Parent-side policy for the pipeline warmup child (bench.py).

    The e2e headline compiles the fused device-chain align program; on
    the dev tunnel a bad compile-service window can stall that compile
    for hours (round 3: two 2-hour rc=124 e2e attempts, queue r3f) with
    no way to abort an in-process ``jit`` call. bench.py therefore runs
    the warmup in a KILLABLE subprocess; this function is the (testable)
    decision table for what the parent does next:

    - child completed: every program is in the persistent XLA cache —
      proceed with defaults, nothing to wait for;
    - child timed out: the device-chain compile is presumed stalled.
      Fall back to ``HYMET_HOST_CHAINS=1`` (the compile-safe legacy
      path, byte-equal output) for THIS bench process — disclosed, the
      product default is unchanged — and wait ``wedge_wait_s`` first,
      because killing a TPU-attached process wedges the chip for a
      while (CLAUDE.md ~15 min);
    - child crashed (rc != 0): no evidence of a stall — proceed with
      defaults and let the parent surface the real error.

    Returns {"env": {...}, "wait_s": float, "note": str}.
    """
    if timed_out:
        return {
            "env": {"HYMET_HOST_CHAINS": "1"},
            "wait_s": float(wedge_wait_s),
            "note": (
                "device-chain warmup timed out; bench falls back to "
                "HYMET_HOST_CHAINS=1 (disclosed; product default unchanged)"
            ),
        }
    if returncode != 0:
        return {
            "env": {},
            "wait_s": 0.0,
            "note": f"warmup child exited rc={returncode}; proceeding without prewarm",
        }
    return {"env": {}, "wait_s": 0.0, "note": "warmup child ok"}
