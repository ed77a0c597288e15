"""CLI (runner.py) end-to-end: synth -> run -> resume after a real kill."""

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=300, **kw):
    env = dict(os.environ, RAY_GRAFT_CPUS="4", PYTHONPATH=REPO)
    return subprocess.run([sys.executable, os.path.join(REPO, "runner.py"), *args],
                          capture_output=True, text=True, timeout=timeout, env=env, **kw)


@pytest.mark.slow
def test_cli_synth_run_and_kill_resume(tmp_path):
    pages = str(tmp_path / "pages")
    out1 = _run(["synth", "--out", pages, "--pages", "3000"])
    assert out1.returncode == 0, out1.stderr[-2000:]

    ckpt = str(tmp_path / "ck")
    scores = str(tmp_path / "scores")
    # uninterrupted run
    r = _run(["run", "--pages", pages, "--algo", "pagerank", "--tol", "1e-9",
              "--num-parts", "8", "--out", scores, "--ckpt", str(tmp_path / "ck_full"),
              "--mode", "fused"])
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["n_vertices"] == 3000

    # killed run: SIGKILL mid-convergence (checkpoint every iteration)
    env = dict(os.environ, RAY_GRAFT_CPUS="4", PYTHONPATH=REPO)
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "runner.py"), "run", "--pages", pages,
         "--algo", "pagerank", "--tol", "1e-9", "--num-parts", "8", "--ckpt", ckpt,
         "--mode", "dataset"],  # dataset mode checkpoints every iteration
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    deadline = time.time() + 240
    while time.time() < deadline:
        done = [d for d in os.listdir(ckpt) if d.startswith("iter=")] if os.path.isdir(ckpt) else []
        if len(done) >= 2:
            break
        if p.poll() is not None:
            break
        time.sleep(0.5)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
        p.wait()
    assert os.path.isdir(ckpt) and any(d.startswith("iter=") for d in os.listdir(ckpt)), \
        "no checkpoint written before kill"

    # resume to convergence and compare against the uninterrupted scores
    r2 = _run(["run", "--pages", pages, "--algo", "pagerank", "--tol", "1e-9",
               "--num-parts", "8", "--ckpt", ckpt, "--out", str(tmp_path / "scores2"),
               "--mode", "dataset"])
    assert r2.returncode == 0, r2.stderr[-2000:]

    import glob

    import numpy as np

    def read_scores(d):
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        t = pq.read_table(files).sort_by("v")
        return t["v"].to_numpy(), t["score"].to_numpy()

    v1, s1 = read_scores(scores)
    v2, s2 = read_scores(str(tmp_path / "scores2"))
    assert (v1 == v2).all()
    # fused vs dataset mode differ only by FP rounding
    import numpy as np

    np.testing.assert_allclose(s1, s2, atol=1e-12)
