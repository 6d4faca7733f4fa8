"""App-level checkpoint/resume exactness (the reference's Markov-chain
restart contract, SURVEY.md §5.4): running N trajectories straight
must equal running k, checkpointing, and resuming for N-k."""

import subprocess
import sys

import pytest


def run_app(tmp_path, args):
    cmd = [sys.executable, "-m", "qex_tpu.apps.staghmc_spv", "--cpu",
           *args]
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=900, cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return [ln for ln in r.stdout.splitlines()
            if ln.startswith("MEASplaq ")]


@pytest.mark.slow
def test_resume_reproduces_chain(tmp_path):
    base = ["-ns=4", "-nt=4", "-beta=5.0", "-tau=0.3", "-g_steps=6",
            "-nf=0", "-num_pv=0", "-gauge_smearing=none",
            "-matter_smearing=none", "-start=hot",
            f"-save_path={tmp_path}", "-save_filename=cfg",
            "-no_metropolis_until=0"]
    # straight: 4 trajectories
    full = run_app(tmp_path, ["--ntraj", "4", *base, "-save_freq=2"])
    assert len(full) == 4
    # resume from checkpoint written after trajectory 2
    resumed = run_app(tmp_path, ["--ntraj", "2", *base,
                                 "-start_config=2"])
    assert resumed == full[2:], (full, resumed)
