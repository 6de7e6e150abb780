"""Outage-resilience tests for the bench.py supervisor.

Round 3's headline artifact was erased by a tunnel outage (BENCH_r03.json
rc=1): bench.py had no probe, no retry, no fallback.  These tests simulate
a live backend, a mid-bench hang, and a dead backend via the
INNFER_BENCH_*_CMD overrides and assert ONE parseable JSON line in every
case (the contract the round driver depends on).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def run_supervised(tmp_path, *, probe_cmd, worker_cmd, run_timeout="5",
                   retry_s="1", seed_last_good=None, median="1"):
    env = dict(os.environ)
    env.update({
        "INNFER_BENCH_PROBE_CMD": probe_cmd,
        "INNFER_BENCH_WORKER_CMD": worker_cmd,
        "INNFER_BENCH_PROBE_TIMEOUT": "3",
        "INNFER_BENCH_RUN_TIMEOUT": run_timeout,
        "INNFER_BENCH_RETRY_S": retry_s,
        "INNFER_BENCH_BACKOFF_S": "0.2",
        "INNFER_BENCH_LASTGOOD_DIR": str(tmp_path),
        "INNFER_BENCH_MEDIAN": median,
    })
    if seed_last_good is not None:
        with open(tmp_path / "bench_last_good_esrgan.json", "w") as f:
            json.dump(seed_last_good, f)
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, env=env, timeout=120, cwd=REPO)
    lines = [ln for ln in r.stdout.strip().splitlines() if ln]
    assert len(lines) == 1, f"expected ONE stdout line, got {lines!r}"
    return r.returncode, json.loads(lines[0])


GOOD_LINE = ('{"metric": "output megapixels/sec/chip, test", '
             '"value": 21.0, "unit": "MP/s", "vs_baseline": 1.05}')


def test_success_path_prints_worker_line_and_records_last_good(tmp_path):
    rc, out = run_supervised(
        tmp_path, probe_cmd="true",
        worker_cmd=f"echo '{GOOD_LINE}'")
    assert rc == 0
    assert out["value"] == 21.0 and "outage" not in out
    lg = json.loads((tmp_path / "bench_last_good_esrgan.json").read_text())
    assert lg["value"] == 21.0 and "captured_at" in lg


def test_worker_hang_falls_back_to_last_good(tmp_path):
    seed = {"metric": "m", "value": 15.8, "unit": "MP/s",
            "vs_baseline": 0.79, "captured_at": "2026-08-01T00:00:00Z"}
    rc, out = run_supervised(
        tmp_path, probe_cmd="true", worker_cmd="sleep 60",
        run_timeout="2", retry_s="1", seed_last_good=seed)
    assert rc == 0
    assert out["outage"] is True
    assert out["value"] == 15.8
    assert out["last_good_at"] == "2026-08-01T00:00:00Z"


def test_dead_backend_with_last_good(tmp_path):
    seed = {"metric": "m", "value": 17.5, "unit": "MP/s",
            "vs_baseline": 0.88, "captured_at": "2026-08-02T00:00:00Z"}
    rc, out = run_supervised(
        tmp_path, probe_cmd="false", worker_cmd="echo never-runs",
        retry_s="1", seed_last_good=seed)
    assert rc == 0
    assert out["outage"] is True and out["value"] == 17.5


def test_dead_backend_no_last_good_still_parseable(tmp_path):
    rc, out = run_supervised(
        tmp_path, probe_cmd="false", worker_cmd="echo never-runs",
        retry_s="1")
    assert rc == 1  # genuinely nothing to report — but still one JSON line
    assert out["outage"] is True
    assert out["value"] == 0.0 and out["unit"] == "MP/s"


def test_worker_failure_then_recovery_retries(tmp_path):
    # worker fails until a marker file exists, then succeeds: the retry
    # loop must survive a transient failure and capture the good line
    marker = tmp_path / "up"
    script = (f"if [ -f {marker} ]; then echo '{GOOD_LINE}'; "
              f"else touch {marker}; exit 3; fi")
    rc, out = run_supervised(
        tmp_path, probe_cmd="true", worker_cmd=script, retry_s="60")
    assert rc == 0 and out["value"] == 21.0 and "outage" not in out


def test_worker_crash_with_live_backend_flags_worker_failed(tmp_path):
    """3 consecutive worker CRASHES under a live probe is a code
    regression, not an outage: the last-good line must be emitted with
    worker_failed (not outage) and a NONZERO exit so the driver can't
    record a stale number as a healthy capture."""
    seed = {"metric": "m", "value": 20.1, "unit": "MP/s",
            "vs_baseline": 1.0, "captured_at": "2026-08-03T00:00:00Z"}
    rc, out = run_supervised(
        tmp_path, probe_cmd="true", worker_cmd="exit 3",
        retry_s="60", seed_last_good=seed)
    assert rc == 1
    assert out["worker_failed"] is True and "outage" not in out
    assert out["value"] == 20.1
    assert out["last_good_at"] == "2026-08-03T00:00:00Z"


def test_median_protocol_reports_low_median_with_samples(tmp_path):
    """INNFER_BENCH_MEDIAN=3: three captures, the reported line is the
    median capture (a REAL one, not an average) with all samples listed."""
    counter = tmp_path / "n"
    # values 19.0, 22.0, 20.5 in sequence -> median 20.5
    script = (
        f"n=$(cat {counter} 2>/dev/null || echo 0); "
        f"echo $((n+1)) > {counter}; "
        "case $n in 0) v=19.0;; 1) v=22.0;; *) v=20.5;; esac; "
        "echo '{\"metric\": \"m\", \"value\": '$v', \"unit\": \"MP/s\", "
        "\"vs_baseline\": 1.0}'")
    rc, out = run_supervised(
        tmp_path, probe_cmd="true", worker_cmd=script, median="3",
        retry_s="60")
    assert rc == 0
    assert out["value"] == 20.5
    assert out["samples"] == [19.0, 22.0, 20.5]
    lg = json.loads((tmp_path / "bench_last_good_esrgan.json").read_text())
    assert lg["value"] == 20.5 and lg["samples"] == [19.0, 22.0, 20.5]


def test_median_partial_on_window_exhaustion(tmp_path):
    """If the retry window ends after >=1 success, the median of the
    collected samples is still reported (partial samples list visible)."""
    counter = tmp_path / "n"
    script = (
        f"n=$(cat {counter} 2>/dev/null || echo 0); "
        f"echo $((n+1)) > {counter}; "
        "if [ $n -lt 2 ]; then "
        "echo '{\"metric\": \"m\", \"value\": 21.'$n', \"unit\": \"MP/s\", "
        "\"vs_baseline\": 1.0}'; else sleep 30; fi")
    rc, out = run_supervised(
        tmp_path, probe_cmd="true", worker_cmd=script, median="5",
        retry_s="2", run_timeout="2")
    assert rc == 0
    assert out["samples"] == [21.0, 21.1]
    assert out["value"] == 21.0  # low median of two


def test_default_median_is_3_for_plain_esrgan(tmp_path):
    """The driver invocation (no flags) must default to the 3-capture
    median; non-default configs stay single-capture."""
    counter = tmp_path / "n"
    script = (
        f"n=$(cat {counter} 2>/dev/null || echo 0); "
        f"echo $((n+1)) > {counter}; "
        "echo '{\"metric\": \"m\", \"value\": 2'$n'.0, \"unit\": \"MP/s\", "
        "\"vs_baseline\": 1.0}'")
    env = dict(os.environ)
    env.update({
        "INNFER_BENCH_PROBE_CMD": "true",
        "INNFER_BENCH_WORKER_CMD": script,
        "INNFER_BENCH_PROBE_TIMEOUT": "3",
        "INNFER_BENCH_RUN_TIMEOUT": "5",
        "INNFER_BENCH_RETRY_S": "60",
        "INNFER_BENCH_BACKOFF_S": "0.2",
        "INNFER_BENCH_LASTGOOD_DIR": str(tmp_path),
    })
    env.pop("INNFER_BENCH_MEDIAN", None)
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, env=env, timeout=120, cwd=REPO)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["samples"] == [20.0, 21.0, 22.0] and out["value"] == 21.0
