"""One-command real-data experiment protocol (VERDICT r3 #10).

Given a directory of EuRoC-style ASL sequence folders (each containing
``mav0/``) and/or ROS1 ``.bag`` files, this runs the reference's full
evaluation protocol unattended — the moment real EuRoC / rpng AR-Table data
lands on this machine, one command produces the ATE tables every accuracy
claim has been waiting on:

* per sequence × estimator variant (the four columns of the reference's
  experiment scripts, ``results/run_ros_eth.sh:31-52,86-99``):

      M-PT   points only, MSCKF        (num_slam=0,  planes off)
      MS-PT  points only, MSCKF+SLAM   (num_slam=15, planes off)
      M-PL   plane-aided MSCKF         (num_slam=0,  planes on)
      MS-PL  plane-aided MSCKF+SLAM    (num_slam=15, planes on)

  each replayed serially by ``scripts/run_euroc.py`` (the ros1_serial_msckf
  equivalent), saving TUM estimates + timing CSVs in the reference's results
  layout (``algorithms/<variant>/<seq>/<run>_estimate.txt``,
  ``launch/serial.launch:97-103`` recording protocol);
* a posyaw-aligned ATE comparison table over all variants
  (``scripts/ov_eval.py error_comparison`` ≡ ov_eval error_comparison) and
  per-stage timing statistics (``timing_comparison``);
* an egress re-probe recorded next to the results (real data has been
  environment-blocked every round — BASELINE.md logs each probe).

``--dry-run`` synthesizes two small ASL stand-ins (scripts/make_synth_asl.py)
and executes the identical protocol end-to-end on them, proving the runbook
green without the real datasets.

Usage:
    python scripts/run_real_suite.py --data-root /data/euroc --out /tmp/suite
    python scripts/run_real_suite.py --dry-run --out /tmp/suite_dry
"""

import argparse
import csv
import json
import os
import subprocess
import sys
import time

# CPU host tool: never let sitecustomize grab the TPU at interpreter boot
# (verify SKILL.md); child replays get the same clean env unless --platform
# tpu asks for the chip (then children keep the host's axon setting).
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               OVP_SUITE_TPU_ENV=json.dumps({
                   "PALLAS_AXON_POOL_IPS": os.environ.get("PALLAS_AXON_POOL_IPS", ""),
                   "JAX_PLATFORMS": os.environ.get("JAX_PLATFORMS", ""),
               }))
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# (variant, num_slam, use_planes) — run_ros_eth.sh's mode loop with
# sigma_constraint fixed at the protocol's 0.010.
VARIANTS = {
    "M-PT": (0, False),
    "MS-PT": (15, False),
    "M-PL": (0, True),
    "MS-PL": (15, True),
}

EGRESS_PROBES = [
    ("euroc_mav", "http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/"),
    ("rpng_ar_table", "https://drive.google.com/drive/folders/1U4K1bUjh8TdXqYqEZFFFkjFwNnd4vPHk"),
]


def probe_egress(out_path: str) -> dict:
    """Re-probe dataset endpoints; record the verdict (BASELINE.md protocol)."""
    import urllib.request

    results = {}
    for name, url in EGRESS_PROBES:
        t0 = time.time()
        try:
            with urllib.request.urlopen(url, timeout=8) as r:
                results[name] = f"reachable (HTTP {r.status}, {time.time()-t0:.1f}s)"
        except Exception as e:  # noqa: BLE001 — record any failure mode
            results[name] = f"unreachable ({type(e).__name__}: {e})"
    with open(out_path, "w") as f:
        f.write(f"# egress probe {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
        for name, verdict in results.items():
            f.write(f"{name}: {verdict}\n")
    return results


def discover_sequences(data_root: str):
    """ASL folders (contain mav0/) and .bag files under data_root."""
    seqs = []
    for entry in sorted(os.listdir(data_root)):
        p = os.path.join(data_root, entry)
        if os.path.isdir(p) and os.path.isdir(os.path.join(p, "mav0")):
            seqs.append(("asl", entry, p))
        elif entry.endswith(".bag"):
            seqs.append(("bag", os.path.splitext(entry)[0], p))
    return seqs


def extract_asl_gt_tum(seq_path: str, out_txt: str) -> bool:
    """mav0/state_groundtruth_estimate0/data.csv → TUM (t x y z qx qy qz qw).

    EuRoC gt columns: t[ns], p_RS_R(3), q_RS(w,x,y,z), v, bw, ba
    (DatasetReader-compatible; the reference's serial driver reads the same
    file for gt-alignment)."""
    gt_csv = os.path.join(seq_path, "mav0", "state_groundtruth_estimate0", "data.csv")
    if not os.path.exists(gt_csv):
        return False
    rows = []
    with open(gt_csv) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            v = line.strip().split(",")
            t = float(v[0]) * 1e-9
            px, py, pz = float(v[1]), float(v[2]), float(v[3])
            qw, qx, qy, qz = float(v[4]), float(v[5]), float(v[6]), float(v[7])
            rows.append((t, px, py, pz, qx, qy, qz, qw))
    with open(out_txt, "w") as f:
        f.write("# timestamp(s) tx ty tz qx qy qz qw\n")
        for r in rows:
            f.write(" ".join(f"{x:.9f}" for x in r) + "\n")
    return bool(rows)


def run_one(kind, seq_path, est_path, time_path, num_slam, use_planes, args):
    cmd = [sys.executable, os.path.join(REPO, "scripts", "run_euroc.py"),
           "--out", est_path, "--timing", time_path,
           "--max-slam", str(num_slam),
           "--plane-csv", os.path.splitext(time_path)[0] + "_planes.csv"]
    cmd += (["--bag", seq_path] if kind == "bag" else ["--data", seq_path])
    if use_planes:
        cmd.append("--use-planes")
    if args.config:
        cmd += ["--config", args.config]
    if args.max_frames:
        cmd += ["--max-frames", str(args.max_frames)]
    if args.fused:
        cmd.append("--fused")
    if args.sim_calib:
        cmd.append("--sim-calib")
    if args.extra:
        cmd += args.extra.split()
    env = dict(os.environ)
    if args.platform == "tpu" and os.environ.get("OVP_SUITE_TPU_ENV"):
        env.update(json.loads(os.environ["OVP_SUITE_TPU_ENV"]))
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=args.run_timeout)
    ok = r.returncode == 0 and os.path.exists(est_path)
    tail = "\n".join((r.stdout + r.stderr).strip().splitlines()[-4:])
    return ok, time.time() - t0, tail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="",
                    help="directory of ASL sequence folders and/or .bag files")
    ap.add_argument("--out", required=True, help="results root")
    ap.add_argument("--variants", default="M-PT,MS-PT,M-PL,MS-PL")
    ap.add_argument("--runs", type=int, default=1,
                    help="repeat runs per cell (the reference's euroc protocol "
                         "uses 1; the replay is deterministic)")
    ap.add_argument("--config", default="", help="estimator_config.yaml for all runs "
                    "(e.g. the reference's rpng_plane config for AR-Table bags)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--fused", action="store_true",
                    help="use the fused one-dispatch vision step in each replay")
    ap.add_argument("--sim-calib", action="store_true",
                    help="sequences were synthesized with the sim calibration "
                         "(make_synth_asl stand-ins); implied by --dry-run")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    ap.add_argument("--run-timeout", type=int, default=7200)
    ap.add_argument("--extra", default="", help="extra run_euroc.py args (verbatim)")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthesize two small ASL stand-ins and run the full "
                         "protocol on them (runbook readiness check)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    probes = probe_egress(os.path.join(args.out, "egress_probe.txt"))
    for name, verdict in probes.items():
        print(f"[suite] egress {name}: {verdict}")

    data_root = args.data_root
    if args.dry_run:
        args.sim_calib = True
        args.max_frames = args.max_frames or 60
        data_root = os.path.join(args.out, "synth_data")
        if not os.path.isdir(os.path.join(data_root, "synth_table_01", "mav0")):
            os.makedirs(data_root, exist_ok=True)
            for name, dur, npl in [("synth_table_01", 8.0, 40),
                                   ("synth_table_02", 8.0, 40)]:
                print(f"[suite] synthesizing {name} ...")
                subprocess.run(
                    [sys.executable, os.path.join(REPO, "scripts", "make_synth_asl.py"),
                     "--out", os.path.join(data_root, name),
                     "--duration", str(dur), "--num-pts", "60",
                     "--num-pts-plane", str(npl)],
                    check=True, timeout=1800, capture_output=True)
    if not data_root or not os.path.isdir(data_root):
        sys.exit(f"[suite] no data: --data-root {data_root!r} missing "
                 "(real data still environment-blocked? see egress_probe.txt)")

    seqs = discover_sequences(data_root)
    if not seqs:
        sys.exit(f"[suite] {data_root} holds no ASL folders or .bag files")
    print(f"[suite] {len(seqs)} sequences: {[s[1] for s in seqs]}")

    gt_dir = os.path.join(args.out, "truths")
    os.makedirs(gt_dir, exist_ok=True)
    have_gt = set()
    for kind, name, path in seqs:
        if kind == "asl" and extract_asl_gt_tum(path, os.path.join(gt_dir, name + ".txt")):
            have_gt.add(name)
    print(f"[suite] ground truth extracted for {sorted(have_gt)}")

    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    algo_root = os.path.join(args.out, "algorithms")
    time_root = os.path.join(args.out, "timings")
    manifest = []
    for variant in variants:
        num_slam, use_planes = VARIANTS[variant]
        for kind, name, path in seqs:
            for j in range(args.runs):
                est_dir = os.path.join(algo_root, variant, name)
                tim_dir = os.path.join(time_root, variant, name)
                os.makedirs(est_dir, exist_ok=True)
                os.makedirs(tim_dir, exist_ok=True)
                est = os.path.join(est_dir, f"{j:02d}_estimate.txt")
                tim = os.path.join(tim_dir, f"{j:02d}_timing.csv")
                print(f"[suite] {variant} / {name} / run {j:02d} ...", flush=True)
                ok, wall, tail = run_one(kind, path, est, tim, num_slam,
                                         use_planes, args)
                status = "ok" if ok else "FAILED"
                print(f"[suite]   {status} in {wall:.0f}s")
                if not ok:
                    print("[suite]   tail:\n" + tail)
                manifest.append({"variant": variant, "seq": name, "run": j,
                                 "ok": ok, "wall_s": round(wall, 1)})
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    n_fail = sum(1 for m in manifest if not m["ok"])

    # --- ATE comparison table (ov_eval error_comparison protocol) ----------
    if have_gt:
        cmp_cmd = [sys.executable, os.path.join(REPO, "scripts", "ov_eval.py"),
                   "error_comparison", gt_dir] + \
                  [os.path.join(algo_root, v) for v in variants]
        r = subprocess.run(cmp_cmd, capture_output=True, text=True, timeout=1200)
        table = r.stdout
        print(table)
        with open(os.path.join(args.out, "ate_comparison.txt"), "w") as f:
            f.write(table)

    # --- timing statistics --------------------------------------------------
    tim_files = []
    for variant in variants:
        for kind, name, _ in seqs:
            p = os.path.join(time_root, variant, name, "00_timing.csv")
            if os.path.exists(p):
                tim_files.append(p)
    if tim_files:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "ov_eval.py"),
             "timing_comparison"] + tim_files,
            capture_output=True, text=True, timeout=600)
        with open(os.path.join(args.out, "timing_comparison.txt"), "w") as f:
            f.write(r.stdout)

    print(f"[suite] done: {len(manifest) - n_fail}/{len(manifest)} runs ok; "
          f"results in {args.out}")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
