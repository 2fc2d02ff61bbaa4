"""ov_eval-equivalent trajectory/timing analysis CLI.

Parity target: the ov_eval binaries the reference's results scripts drive
(results/sim_general/plot.sh, results/exp_euroc_mav/plot.sh,
src/timing_custom.cpp):

  error_dataset      ATE (posyaw) + RPE for one or more runs vs one gt file
  error_comparison   per-algorithm mean/std ATE over sequence directories
  timing_comparison  per-column mean/std/99th/max of timing CSVs
                     (timing_custom.cpp:37-151 protocol, incl. LaTeX row)

Usage:
  python scripts/ov_eval.py error_dataset      <gt.txt> <est.txt> [...]
  python scripts/ov_eval.py error_comparison   <gt_dir> <algo_dir> [...]
  python scripts/ov_eval.py timing_comparison  <timing.csv> [...]

Trajectory files are TUM format (t x y z qx qy qz qw, JPL R_GtoI convention
as written by eval/io.write_tum). Ground truth is associated to estimate
timestamps by linear interpolation (slerp for orientation), matching
ov_eval's trajectory intersection semantics.
"""

import argparse
import os
import sys

# This is a host analysis tool: it must NOT touch the TPU. On this image a
# sitecustomize hook claims a TPU chip at interpreter startup whenever
# PALLAS_AXON_POOL_IPS is set in the environment — before any line of this
# script runs — so setting os.environ here is too late. Re-exec once with a
# clean CPU environment instead.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.eval.io import read_tum
from ov_plane_tpu.eval.metrics import ate_posyaw, rpe


def _slerp(q0, q1, u):
    d = np.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = np.where(d < 0, -q1, q1)
    d = np.abs(d)
    th = np.arccos(np.clip(d, -1.0, 1.0))
    sth = np.sin(th)
    w0 = np.where(sth > 1e-9, np.sin((1 - u) * th) / np.where(sth > 1e-9, sth, 1.0), 1 - u)
    w1 = np.where(sth > 1e-9, np.sin(u * th) / np.where(sth > 1e-9, sth, 1.0), u)
    q = w0 * q0 + w1 * q1
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def associate(t_est, t_gt, p_gt, q_gt, max_dt=0.02):
    """Interpolate gt at estimate timestamps; drop est stamps outside gt span."""
    keep = (t_est >= t_gt[0]) & (t_est <= t_gt[-1])
    t = t_est[keep]
    i1 = np.clip(np.searchsorted(t_gt, t), 1, len(t_gt) - 1)
    i0 = i1 - 1
    u = ((t - t_gt[i0]) / np.maximum(t_gt[i1] - t_gt[i0], 1e-12))[:, None]
    p = (1 - u) * p_gt[i0] + u * p_gt[i1]
    q = _slerp(q_gt[i0], q_gt[i1], u)
    near = np.minimum(np.abs(t - t_gt[i0]), np.abs(t_gt[i1] - t)) <= max_dt
    return keep, near, p, q


def eval_one(gt_path, est_path):
    t_g, p_g, q_g = (np.asarray(a) for a in read_tum(gt_path))
    t_e, p_e, q_e = (np.asarray(a) for a in read_tum(est_path))
    keep, near, p_gi, q_gi = associate(t_e, t_g, p_g, q_g)
    p_e, q_e = p_e[keep][near], q_e[keep][near]
    p_gi, q_gi = p_gi[near], q_gi[near]
    if len(p_e) < 10:
        return None
    ate_p, ate_o, _, _ = ate_posyaw(jnp.asarray(p_e), jnp.asarray(q_e),
                                    jnp.asarray(p_gi), jnp.asarray(q_gi))
    length = float(np.sum(np.linalg.norm(np.diff(p_gi, axis=0), axis=1)))
    segs = tuple(L for L in (8.0, 16.0, 24.0, 32.0, 40.0, 48.0) if L < 0.5 * length)
    rpes = rpe(jnp.asarray(p_e), jnp.asarray(q_e), jnp.asarray(p_gi), jnp.asarray(q_gi),
               segment_lengths=segs) if segs else {}
    return {
        "n": len(p_e), "length": length,
        "ate_pos": float(ate_p), "ate_ori_deg": float(ate_o),
        "rpe": {L: (float(o), float(p)) for L, (o, p) in rpes.items()},
    }


def cmd_error_dataset(args):
    print(f"ground truth: {args.paths[0]}")
    for est in args.paths[1:]:
        r = eval_one(args.paths[0], est)
        if r is None:
            print(f"  {os.path.basename(est)}: <too few associated poses>")
            continue
        print(f"  {os.path.basename(est)}: ATE {r['ate_ori_deg']:.3f} deg / "
              f"{r['ate_pos']:.3f} m   ({r['n']} poses, {r['length']:.1f} m path)")
        for L, (o, p) in r["rpe"].items():
            print(f"    RPE {L:>4.0f} m: {o:.3f} deg / {p:.3f} m")


def cmd_error_comparison(args):
    gt_dir = args.paths[0]
    gts = {os.path.splitext(f)[0]: os.path.join(gt_dir, f)
           for f in sorted(os.listdir(gt_dir)) if f.endswith(".txt")}
    print(f"{'algorithm':<24}" + "".join(f"{s:<22}" for s in gts))
    for algo_dir in args.paths[1:]:
        cells = []
        for seq, gt_path in gts.items():
            seq_dir = os.path.join(algo_dir, seq)
            runs = ([os.path.join(seq_dir, f) for f in sorted(os.listdir(seq_dir)) if f.endswith(".txt")]
                    if os.path.isdir(seq_dir) else
                    ([os.path.join(algo_dir, seq + ".txt")] if os.path.exists(os.path.join(algo_dir, seq + ".txt")) else []))
            vals = [r["ate_pos"] for r in (eval_one(gt_path, p) for p in runs) if r]
            oris = [r["ate_ori_deg"] for r in (eval_one(gt_path, p) for p in runs) if r]
            cells.append(f"{np.mean(oris):.3f}/{np.mean(vals):.3f}±{np.std(vals):.3f}" if vals else "-")
        print(f"{os.path.basename(algo_dir.rstrip('/')):<24}" + "".join(f"{c:<22}" for c in cells))
    print("(cells: ATE ori_deg / pos_m ± std over runs, posyaw alignment)")


def cmd_timing_comparison(args):
    """Per-column statistics of timing CSVs (timing_custom.cpp:37-151:
    mean/std/99th/max per column plus a LaTeX table row)."""
    for path in args.paths:
        with open(path) as f:
            header = f.readline().strip().lstrip("#").split(",")
        data = np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2)
        cols = header[1:] if data.shape[1] == len(header) else header
        vals = data[:, 1:] if data.shape[1] == len(header) else data
        print(f"{path} ({vals.shape[0]} frames)")
        print(f"  {'stage':<22}{'mean':>10}{'std':>10}{'99th':>10}{'max':>10}")
        latex = []
        for j, name in enumerate(cols):
            v = vals[:, j]
            mean, std = np.mean(v), np.std(v)
            p99, vmax = np.percentile(v, 99), np.max(v)
            print(f"  {name.strip():<22}{mean:>10.4f}{std:>10.4f}{p99:>10.4f}{vmax:>10.4f}")
            latex.append(f"{mean:.3f} $\\pm$ {std:.3f}")
        print("  LaTeX: " + " & ".join(latex) + r" \\")


def main():
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("error_dataset", "error_comparison", "timing_comparison"):
        p = sub.add_parser(name)
        p.add_argument("paths", nargs="+")
    args = ap.parse_args()
    {"error_dataset": cmd_error_dataset,
     "error_comparison": cmd_error_comparison,
     "timing_comparison": cmd_timing_comparison}[args.cmd](args)


if __name__ == "__main__":
    main()
