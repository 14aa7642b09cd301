"""bench.py termination guarantee: the driver JSON line is ALWAYS emitted
within the wall-clock budget (round-2 regression: the official capture
timed out with rc=124 and no JSON, BENCH_r02.json).

Run as subprocesses because the watchdog path ends with os._exit(0).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env=None, args=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ntt_tpu_tests")
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--platform", "cpu",
         "--batch", "4", "--m", "8", "--q-bits", "27", "--reps", "1",
         "--inner", "4", *args],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env,
    )


def _json_lines(stdout: str):
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_bench_emits_single_json_line():
    r = _run_bench(args=("--budget-s", "180"))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = _json_lines(r.stdout)
    assert len(lines) == 1, r.stdout
    j = lines[0]
    assert j["unit"] == "transforms/s" and j["value"] > 0
    # metric name is self-describing: N, q width, and batch
    assert "N2^8" in j["metric"] and "q27bit" in j["metric"]
    assert "batch4" in j["metric"]
    # the min-of-2 refinement annotates its spread unless the budget cut
    # the second reading; either way the field is well-formed when present
    if "degraded" not in j:
        assert j.get("band_pct") is not None and j["band_pct"] >= 0, j


def test_bench_also_batch_row():
    """--also-batch N records a secondary comparability rate in the same
    JSON line (keyed also_batch{N}_tps) without changing the metric."""
    r = _run_bench(args=("--budget-s", "180", "--also-batch", "8"))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = _json_lines(r.stdout)
    assert len(lines) == 1, r.stdout
    j = lines[0]
    assert "batch4" in j["metric"]
    assert j.get("also_batch8_tps", 0) > 0, j


def test_bench_watchdog_emits_json_when_wedged():
    """A wedged measurement (simulated via the NTT_BENCH_HANG_S hook) must
    still produce rc=0 and a JSON line before the budget expires."""
    r = _run_bench(extra_env={"NTT_BENCH_HANG_S": "600"},
                   args=("--budget-s", "25"))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = _json_lines(r.stdout)
    assert len(lines) == 1, r.stdout
    assert lines[0]["unit"] == "transforms/s"
    assert "degraded" in lines[0]


def test_bench_tile_flag():
    """--tile runs the u64 headline as lax.map tiles (opt-in large-batch
    mode); the JSON line still self-describes the full batch."""
    r = _run_bench(args=("--q-bits", "62", "--batch", "256", "--tile", "128",
                         "--also-batch", "0", "--budget-s", "200"))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = _json_lines(r.stdout)
    assert len(lines) == 1, r.stdout
    j = lines[0]
    assert "q62bit" in j["metric"] and "batch256" in j["metric"]
    assert j["value"] > 0


def test_bench_suite_control_rows(tmp_path):
    """--suite writes the per-variant JSON with the interleaved-control
    header (name, readings, band_pct) and measures exactly the --only
    bodies.  Also the regression lock for the round-4 NameError: the w56
    q-gate refactor left modmath unimported inside _suite_bodies, which
    broke every --suite run."""
    sj = tmp_path / "suite.json"
    r = _run_bench(args=("--suite", "--suite-json", str(sj),
                         "--only", "radix2-u32,sixstep-u32",
                         "--controls", "1", "--budget-s", "200"))
    assert r.returncode == 0, r.stderr[-2000:]
    with open(sj) as f:
        data = json.load(f)
    assert set(data["variants"]) == {"radix2-u32", "sixstep-u32"}
    for row in data["variants"].values():
        assert row["us_per_transform"] > 0
    ctl = data["control"]
    assert ctl["name"] == "sixstep-u32"
    # --controls 1 with 2 rows: control before, between, and after
    assert len(ctl["readings"]) == 3
    assert ctl["band_pct"] >= 0
