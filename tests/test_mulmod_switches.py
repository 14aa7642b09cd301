"""End-to-end coverage of the trace-time multiply switches.

NTT_MULMOD=solinas and NTT_MULHI64=approx swap the butterfly multiply at
trace time (module globals read when programs are built), so in-process
pytest cannot flip them without poisoning every lru-cached jitted
program.  These tests run the documented check protocol
(tools/solinas_tpu_check.py) in a subprocess per mode instead -- the
same entry the on-chip verification uses.  full-tier: each mode compiles
the N=2^14 sixstep program from scratch on one CPU core.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_REPO, "tools", "solinas_tpu_check.py")


def _run(mode: str, env_extra: dict) -> None:
    env = dict(os.environ)
    env.pop("NTT_MULMOD", None)
    env.pop("NTT_MULHI64", None)
    env["NTT_CHECK_PLATFORM"] = "cpu"
    env.update(env_extra)
    r = subprocess.run([sys.executable, _TOOL, mode], env=env, cwd=_REPO,
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f"{mode} check failed:\n{r.stdout}\n{r.stderr}"
    assert "ALL OK" in r.stdout, r.stdout


@pytest.mark.full
def test_solinas_mulmod_e2e():
    _run("solinas", {"NTT_MULMOD": "solinas"})


@pytest.mark.full
def test_approx_mulhi_e2e():
    _run("approx", {"NTT_MULHI64": "approx"})
