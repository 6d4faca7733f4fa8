"""Multi-process bootstrap smoke test: 2 CPU processes x 4 virtual
devices = one 8-device global runtime (VERDICT.md item 4).

Reference parity: QMP process bring-up (src/comms/qmp.nim:40,
src/comms/commsQmp.nim:5-28) and per-rank parallel IO
(src/io/parallelIo.nim), exercised as 2 real OS processes over the
jax.distributed gRPC runtime -- the analog of the reference CI running
everything under ``mpiexec -n 2``."""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_bootstrap(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("_QEX_DRYRUN_CHILD", None)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", "")).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port),
             str(tmp_path), REPO],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{out[-3000:]}"
        assert f"dist worker {pid}/2 ok" in out
