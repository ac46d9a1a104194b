"""Regression tests for the bench timing core (VERDICT r2 weak #4: the
round-2 "0.000 s groups" deferred-execution bug shows measurement code
needs tests too)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hymet_tpu.harness.timing import (
    best_run,
    force_readback,
    spread_note,
    tag_fallback,
    timed_groups,
)


class FakeClock:
    """Deterministic clock: each call returns the next scripted tick."""

    def __init__(self, step=1.0):
        self.t = 0.0
        self.step = step

    def __call__(self):
        t = self.t
        self.t += self.step
        return t


def test_timed_groups_counts_and_times():
    clock = FakeClock(step=1.0)
    runs = timed_groups(
        lambda: "r", min_runs=3, max_runs=10, budget_s=1000.0, clock=clock
    )
    # each run brackets exactly two clock reads (plus loop checks)
    assert len(runs) >= 3
    assert all(dt == pytest.approx(1.0) for dt, _ in runs)
    assert all(res == "r" for _, res in runs)


def test_timed_groups_stops_at_budget_with_one_run():
    # budget so small the deadline passes during the first run: the
    # protocol still records that one run, then stops
    clock = FakeClock(step=10.0)
    runs = timed_groups(
        lambda: None, min_runs=4, max_runs=8, budget_s=5.0, clock=clock
    )
    assert len(runs) == 1


def test_timed_groups_max_runs_cap():
    clock = FakeClock(step=0.001)
    runs = timed_groups(
        lambda: None, min_runs=1, max_runs=5, budget_s=1e9, clock=clock
    )
    assert len(runs) == 5


def test_timed_groups_rejects_bad_bounds():
    with pytest.raises(ValueError):
        timed_groups(lambda: None, min_runs=0, max_runs=3, budget_s=1.0)
    with pytest.raises(ValueError):
        timed_groups(lambda: None, min_runs=4, max_runs=3, budget_s=1.0)


def test_best_run_and_spread():
    runs = [(3.0, "slow"), (1.0, "fast"), (2.0, "mid")]
    assert best_run(runs) == (1.0, "fast")
    note = spread_note(runs)
    assert "best 1.000s" in note and "worst 3.000s" in note and "3 runs" in note


def test_force_readback_shapes():
    # arrays, scalars, and nested pytrees must all be fetchable
    force_readback(jnp.zeros((4, 4)))
    force_readback(jnp.float32(3.0))
    force_readback((jnp.zeros((2, 3, 4)), jnp.ones((5,))))
    force_readback({"a": jnp.arange(10)})


def test_force_readback_orders_after_execution():
    # the regression the helper exists for: timing must observe the
    # produced VALUE, not just buffer metadata. Verify the fetched bytes
    # are the computed result (a lazily-deferred runtime would have to
    # run the program to satisfy this).
    x = jnp.arange(8, dtype=jnp.int32) + 1
    leaf = x[(slice(0, 1),)]
    assert np.asarray(leaf)[0] == 1
    force_readback(x)


def test_tag_fallback():
    r = {"metric": "m", "value": 1}
    assert tag_fallback(r, False)["metric"] == "m"
    tagged = tag_fallback(r, True)
    assert tagged["metric"] == "m_cpu_fallback"
    assert r["metric"] == "m"  # input not mutated


def test_warmup_reaction_ok():
    from hymet_tpu.harness.timing import warmup_reaction

    plan = warmup_reaction(False, 0)
    assert plan["env"] == {} and plan["wait_s"] == 0.0


def test_warmup_reaction_timeout_falls_back_to_host_chains():
    from hymet_tpu.harness.timing import warmup_reaction

    plan = warmup_reaction(True, None, wedge_wait_s=123.0)
    assert plan["env"] == {"HYMET_HOST_CHAINS": "1"}
    assert plan["wait_s"] == 123.0
    assert "host" in plan["note"].lower() or "HOST" in plan["note"]


def test_warmup_reaction_crash_proceeds_with_defaults():
    from hymet_tpu.harness.timing import warmup_reaction

    plan = warmup_reaction(False, 3)
    # a crash is not evidence of a compile stall: keep the shipping
    # device-chain default and surface the real error in the parent
    assert plan["env"] == {} and plan["wait_s"] == 0.0
    assert "rc=3" in plan["note"]
