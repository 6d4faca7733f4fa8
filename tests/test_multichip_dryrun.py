"""The driver's multi-chip gate, run as a test so it can't regress.

Round-1 postmortem: ``dryrun_multichip`` inherited a broken TPU backend
and the gate failed even though the sharded code was fine (VERDICT.md
Missing #1).  These tests pin both paths:

* the in-process path on the conftest-provided 8-device CPU mesh, and
* the CPU-fallback re-exec path when the ambient process has too few
  devices (stand-in for the single tunneled TPU chip).

Reference parity: any-rank-count bring-up robustness
(src/comms/commsQmp.nim:5-28).
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_inprocess():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as e
        e.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)


def test_dryrun_multichip_cpu_fallback():
    # Parent subprocess sees only ONE cpu device -> must re-exec itself
    # with an 8-device virtual CPU mesh and still succeed.
    env = dict(os.environ)
    env.pop("_QEX_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1").strip()
    code = (f"import sys; sys.path.insert(0, {REPO!r}); "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import __graft_entry__ as e; e.dryrun_multichip(8)")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8)" in r.stdout
