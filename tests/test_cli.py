"""Smoke tests for the python -m ntt_tpu CLI (the analog of the
reference's ntt-variants binaries, tests/main.c)."""

import numpy as np

from ntt_tpu import __main__ as cli
from ntt_tpu import api


def test_list_runs(capsys):
    assert cli.cmd_list(None) == 0
    out = capsys.readouterr().out
    for name in api.variants():
        assert name in out


def test_bench_strips_leading_dashes(monkeypatch, capsys):
    """`python -m ntt_tpu bench -- --suite`-style argv must not leak the
    leading '--' into bench.py's parser (regression)."""
    import argparse

    import ntt_tpu.__main__ as cli_mod

    seen = {}

    class FakeBench:
        @staticmethod
        def main():
            import sys

            seen["argv"] = list(sys.argv)

    monkeypatch.setitem(__import__("sys").modules, "bench", FakeBench)
    cli_mod.cmd_bench(argparse.Namespace(rest=["--", "--batch", "8"]))
    assert seen["argv"] == ["bench.py", "--batch", "8"]


def test_correctness_subset(capsys, monkeypatch):
    """One small fixture through the real correctness driver."""
    from ntt_tpu import params as params_mod

    monkeypatch.setattr(params_mod, "FIXTURES", params_mod.FIXTURES[:1])
    # cmd_correctness imports FIXTURES by name from ntt_tpu.params
    import argparse

    args = argparse.Namespace(full=True, fixtures=None, seed=1,
                              skip="pallas-fused,r2-16")
    rc = cli.cmd_correctness(args)
    out = capsys.readouterr().out
    assert rc == 0 and "FAILURES: 0" in out
