"""Compile-service health probe + dev_broken auto-heal wiring.

The probe itself targets the dev tunnel's remote compile service
(no reference analog); these tests cover the verdict file contract and
the marker-healing rule in ``aligner._load_dev_broken`` on CPU.
"""

import json
import os
import subprocess
import sys
import time

import hymet_tpu.harness.healthprobe as hp
import hymet_tpu.models.aligner as al


def test_probe_child_runs_and_classifies(tmp_path):
    """The probe child compiles its nonce-shaped program on CPU and
    prints a JSON verdict line."""
    env = dict(os.environ)
    env.update(
        HYMET_PLATFORM="cpu",
        BENCH_HEALTH_ACAP=str(1 << 12),
        BENCH_HEALTH_HEALTHY_S="300",
    )
    out = subprocess.run(
        [sys.executable, "-m", "hymet_tpu.harness.healthprobe"],
        env=env,
        capture_output=True,
        timeout=300,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    rec = json.loads(out.stdout.decode().strip().splitlines()[-1])
    assert rec["verdict"] == "healthy"
    assert rec["compile_s"] >= 0


def test_health_file_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(hp, "HEALTH_PATH", str(tmp_path / "health.json"))
    assert hp.read_health() == {}
    assert hp.last_healthy_ts() == 0.0
    rec = hp._write_health("healthy", 12.3)
    assert hp.read_health()["verdict"] == "healthy"
    assert hp.last_healthy_ts() == rec["ts"]
    hp._write_health("degraded", 500.0)
    assert hp.last_healthy_ts() == 0.0  # degraded never heals markers


def test_dev_broken_heals_on_healthy_probe(tmp_path, monkeypatch):
    """A broken-bucket marker recorded BEFORE the last healthy probe is
    dropped (service recovered); one recorded AFTER it survives."""
    monkeypatch.delenv("HYMET_RESET_DEV_BROKEN", raising=False)
    monkeypatch.setattr(hp, "HEALTH_PATH", str(tmp_path / "health.json"))
    broken_path = str(tmp_path / "dev_broken.json")
    monkeypatch.setattr(al, "_DEV_BROKEN_PATH", broken_path)

    now = time.time()
    with open(broken_path, "w") as f:
        json.dump([[64, 262144, now - 60.0]], f)

    # no probe recorded: TTL alone keeps it
    assert al._load_dev_broken() == {(64, 262144)}

    # healthy probe AFTER the failure: marker heals
    hp._write_health("healthy", 20.0)
    assert al._load_dev_broken() == set()

    # a NEW failure after the healthy probe survives
    with open(broken_path, "w") as f:
        json.dump([[64, 262144, time.time() + 1.0]], f)
    assert al._load_dev_broken() == {(64, 262144)}

    # degraded probe heals nothing
    hp._write_health("degraded", 500.0)
    assert al._load_dev_broken() == {(64, 262144)}

    # the TTL backstop still applies
    with open(broken_path, "w") as f:
        json.dump([[64, 262144, now - 5 * 3600.0]], f)
    assert al._load_dev_broken() == set()
