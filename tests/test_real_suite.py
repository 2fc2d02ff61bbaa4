"""The one-command real-data runbook must stay green (VERDICT r4 #8: the
dry-run path is the most likely thing to bit-rot while real data stays
environment-blocked). Exercises discovery, gt extraction, the per-variant
replay driver, and the comparison-table emit on a tiny synthesized ASL
sequence — the identical code path a real EuRoC/AR-Table folder takes."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_real_suite_protocol_on_synth_asl(tmp_path):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PALLAS_AXON_REMOTE_COMPILE="0")
    data = tmp_path / "data"
    seq = data / "synth_mini_01"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_synth_asl.py"),
         "--out", str(seq), "--duration", "4.0", "--num-pts", "50",
         "--num-pts-plane", "30"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    out = tmp_path / "suite"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_real_suite.py"),
         "--data-root", str(data), "--out", str(out),
         "--variants", "M-PL", "--max-frames", "20", "--sim-calib"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])

    est = out / "algorithms" / "M-PL" / "synth_mini_01" / "00_estimate.txt"
    assert est.exists() and est.stat().st_size > 0
    # gt extracted + egress probe recorded next to the results.
    assert (out / "truths" / "synth_mini_01.txt").exists()
    assert (out / "egress_probe.txt").exists()
