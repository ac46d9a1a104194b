"""The bench hard-deadline watchdog (hymet_tpu/harness/deadline.py).

Round 3's driver record was ``rc=124, parsed=null`` — the bench printed
nothing inside the driver's window. These tests pin the guarantee that
fixes it: ONE parseable JSON line always appears, whether the bench
finishes, stalls past the deadline, or crashes. (Reference analog:
``bench/lib/measure.sh:46`` — every reference run yields a measurement.)
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

from hymet_tpu.harness import deadline


# ---------------------------------------------------------------------
# pure decision table


@pytest.mark.parametrize(
    "now,alive,status,expect",
    [
        (0.0, True, {}, "sleep"),  # far from deadline, parent healthy
        (0.0, True, {"done": True}, "exit_quiet"),  # bench printed its line
        (9941.0, True, {}, "kill_print_exit"),  # now >= epoch - margin
        (10_050.0, True, {"done": True}, "exit_quiet"),  # done wins over time
        (0.0, False, {}, "print_and_exit"),  # crash rescue
        (0.0, False, {"done": True}, "exit_quiet"),  # normal exit, no rescue
    ],
)
def test_watch_step(now, alive, status, expect):
    assert deadline.watch_step(now, 10_001.0, 60.0, alive, status) == expect


def test_degraded_line_skeleton():
    line = deadline.degraded_line({}, "pipeline")
    assert line["metric"] == "pipeline_contigs_per_s"
    assert line["value"] == 0.0
    assert line["degraded"] == "deadline_no_measurement"
    json.dumps(line)  # must be serializable


def test_degraded_line_partial():
    status = {
        "result": {
            "metric": "pipeline_contigs_per_s",
            "value": 12.5,
            "unit": "contigs/s",
            "vs_baseline": 2.2,
        },
        "degraded": "warmup_run_only",
    }
    line = deadline.degraded_line(status, "pipeline")
    assert line["value"] == 12.5
    assert line["degraded"] == "warmup_run_only"


def test_skeleton_covers_every_bench_mode():
    for mode in ("pipeline", "warm_pipeline", "sketch", "sketch_stages",
                 "sketch_large", "align", "align_stages", "unknown"):
        line = deadline.skeleton(mode)
        assert set(line) == {"metric", "value", "unit", "vs_baseline"}


# ---------------------------------------------------------------------
# status-file plumbing


def test_partial_and_children_roundtrip(tmp_path, monkeypatch):
    path = str(tmp_path / "status.json")
    monkeypatch.setenv(deadline.ENV_STATUS, path)
    deadline._write_status(path, {"done": False})
    deadline.report_partial({"metric": "m", "value": 1.0}, "warmup_run_only")
    deadline.register_child(123)
    deadline.register_child(456)
    deadline.register_child(123)  # dedupe
    status = deadline._read_status(path)
    assert status["result"]["value"] == 1.0
    assert status["degraded"] == "warmup_run_only"
    assert sorted(status["children"]) == [123, 456]
    deadline.unregister_child(123)
    assert deadline._read_status(path)["children"] == [456]


def test_helpers_noop_without_env(monkeypatch):
    monkeypatch.delenv(deadline.ENV_STATUS, raising=False)
    monkeypatch.delenv(deadline.ENV_WATCHDOG, raising=False)
    monkeypatch.delenv(deadline.ENV_EPOCH, raising=False)
    deadline.report_partial({"metric": "m"}, "x")  # no crash
    deadline.register_child(1)
    deadline.unregister_child(1)
    deadline.finish()
    assert deadline.remaining_s(42.0) == 42.0


# ---------------------------------------------------------------------
# live integration: a stalling "bench" gets killed and its watchdog
# prints the partial line; a crashing one is rescued too


_STALL = textwrap.dedent(
    """
    import os, sys, time
    sys.path.insert(0, {root!r})
    os.environ["HYMET_PLATFORM"] = "cpu"
    os.environ["BENCH_DEADLINE_S"] = "2"   # epoch 2s out, margin 60 -> fires now
    from hymet_tpu.harness import deadline
    # land the partial BEFORE arming so the watchdog (which fires on its
    # first poll here) can never observe an empty status file
    os.environ[deadline.ENV_STATUS] = os.path.join({cache!r}, "status.json")
    deadline._write_status(os.environ[deadline.ENV_STATUS], {{"done": False}})
    deadline.report_partial(
        {{"metric": "pipeline_contigs_per_s", "value": 7.0,
          "unit": "contigs/s", "vs_baseline": 1.26}}, "warmup_run_only")
    deadline.arm("pipeline", {cache!r})
    time.sleep(120)  # simulated wedge: never prints
    """
)

_CRASH = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {root!r})
    os.environ["HYMET_PLATFORM"] = "cpu"
    os.environ["BENCH_DEADLINE_S"] = "600"
    from hymet_tpu.harness import deadline
    deadline.arm("align", {cache!r})
    sys.exit(3)  # dies without finish(); watchdog must rescue
    """
)


def _run_fake_bench(tmp_path, script):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", script.format(root=root, cache=str(tmp_path))],
        capture_output=True,
        text=True,
        timeout=60,
        env={**os.environ, "HYMET_PLATFORM": "cpu"},
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"want exactly one line, got {proc.stdout!r}"
    return json.loads(lines[0])


def test_watchdog_kills_stalled_bench_and_prints_partial(tmp_path):
    line = _run_fake_bench(tmp_path, _STALL)
    assert line["metric"] == "pipeline_contigs_per_s"
    assert line["value"] == 7.0
    assert line["degraded"] == "warmup_run_only"


def test_watchdog_rescues_crashed_bench(tmp_path):
    line = _run_fake_bench(tmp_path, _CRASH)
    assert line["metric"] == "align_query_Gbp_per_s"
    assert line["degraded"] == "deadline_no_measurement"
