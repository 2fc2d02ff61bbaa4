"""Ground the bench.py baseline denominators with host measurements.

The reference binary cannot be built here (ROS + Ceres absent), so this
measures the two halves of its per-frame cost on THIS host, single-thread:

1. Filter workload — builds and runs ``native/refbench.cpp`` (Eigen, -O3):
   the reference's simulated-VIO frame loop's linear algebra at bench.py's
   exact sizes, with none of the reference's bookkeeping overheads. An
   UPPER bound on reference sim-mode fps on this host.
2. Frontend workload — the reference's tracker IS OpenCV
   (TrackPlane.cpp:1299-1357 calls cv::buildOpticalFlowPyramid /
   calcOpticalFlowPyrLK / FAST through Grider_FAST, plus CLAHE), so we time
   those exact calls via cv2 at the reference settings (15x15 window,
   5 levels, EuRoC-size frames, num_pts features) — what the reference's
   `feed_monocular` tracking stage costs here.

Combined: reference EuRoC-mode fps bound ~= 1 / (t_track + t_filter);
sim-mode fps bound = refbench fps. Both recorded in BASELINE.md.

Usage: python scripts/ground_baseline.py  (CPU-only; re-execs a clean env)
"""

import json
import os
import subprocess
import sys
import time

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

_EIGEN_CANDIDATES = [
    "/usr/include/eigen3",
    "/opt/venv/lib/python3.12/site-packages/tensorflow/include",
]


def run_refbench():
    src = os.path.join(os.path.dirname(__file__), "..", "ov_plane_tpu", "native",
                       "refbench.cpp")
    exe = "/tmp/ovp_refbench"
    eigen = next((p for p in _EIGEN_CANDIDATES if os.path.exists(os.path.join(p, "Eigen"))), None)
    if eigen is None:
        print("[ground] Eigen headers not found; skipping refbench")
        return None
    # x86-64-v3 (AVX2): -march=native trips a template bug in the TF-bundled
    # Eigen's AVX512-FP16 kernels under this g++; the bench is double-only.
    cmd = ["g++", "-O3", "-march=x86-64-v3", "-DNDEBUG", "-std=c++17",
           f"-I{eigen}", src, "-o", exe]
    print("[ground] building refbench:", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    # Three workloads: mean measured load (6 MSCKF feats/frame), p90 (10),
    # and the bench's static worst case (40) — each with the FeatureDatabase
    # bookkeeping model (last arg = observations/frame). The feature loads
    # were instrumented from the bench replay itself (BASELINE.md round 3).
    res = {}
    for tag, feats in (("mean6", 6), ("p90_10", 10), ("cap40", 40)):
        out = subprocess.run([exe, "12", str(feats), "8", "25", "2000", "60"],
                             check=True, capture_output=True, text=True).stdout
        print(out, end="")
        for line in out.splitlines():
            if line.startswith("JSON "):
                res[tag] = json.loads(line[5:])
    return res.get("p90_10")


def run_cv2_frontend(n_frames=60, num_pts=200, wh=(752, 480), win=15, levels=5,
                     fast_threshold=30, grid=(5, 3), clahe=True, threads=1):
    """Time the reference's OpenCV tracking calls at its EuRoC settings.

    Mirrors TrackPlane::feed_monocular's per-frame tracking stage: CLAHE
    (TrackBase), ONE buildOpticalFlowPyramid (TrackPlane.cpp:77), ONE forward
    calcOpticalFlowPyrLK with initial flow (:1329), findFundamentalMat RANSAC
    (:1344), and grid FAST top-up (Grider_FAST). cv2 5.0's python binding
    cannot take prebuilt pyramids, so the LK timing includes two internal
    pyramid builds — we SUBTRACT 2x the measured build cost so the bound
    stays reference-favoring (the C++ reference reuses cached pyramids)."""
    import cv2

    cv2.setNumThreads(threads)
    rng = np.random.default_rng(3)
    # Textured frames: band-limited noise (the tracker's cost is dominated by
    # pyramid/LK window ops; content affects only convergence iterations —
    # use smooth drifting texture so LK iterates realistically).
    base = rng.uniform(0, 255, (wh[1] + 64, wh[0] + 64)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 2.5)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX)
    frames = []
    for i in range(n_frames):
        ox, oy = int(2.0 * i), int(1.0 * i)
        fr = base[oy % 64:(oy % 64) + wh[1], ox % 64:(ox % 64) + wh[0]]
        frames.append(np.ascontiguousarray(fr).astype(np.uint8))

    clahe_op = cv2.createCLAHE(clipLimit=10.0, tileGridSize=(8, 8))
    lk_params = dict(winSize=(win, win), maxLevel=levels - 1,
                     criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
                     flags=cv2.OPTFLOW_USE_INITIAL_FLOW)

    t_hist, t_pyr, t_klt, t_rsc, t_fast = [], [], [], [], []
    prev = None
    pts = rng.uniform([20, 20], [wh[0] - 20, wh[1] - 20], (num_pts, 2)).astype(np.float32)
    fast = cv2.FastFeatureDetector_create(fast_threshold)
    for i, fr in enumerate(frames):
        t0 = time.perf_counter()
        eq = clahe_op.apply(fr) if clahe else fr
        t1 = time.perf_counter()
        cv2.buildOpticalFlowPyramid(eq, (win, win), levels - 1)
        t2 = time.perf_counter()
        t_rs = 0.0
        if prev is not None:
            p1, st, _ = cv2.calcOpticalFlowPyrLK(prev, eq, pts, pts.copy(), **lk_params)
            t_r0 = time.perf_counter()
            cv2.findFundamentalMat(pts, p1, cv2.FM_RANSAC, 2.0 / 460.0, 0.999)
            t_rs = time.perf_counter() - t_r0
        t3 = time.perf_counter()
        # Grid FAST (Grider_FAST::perform_griding: per-cell FAST + top-k).
        gh, gw = grid[1], grid[0]
        ch, cw = wh[1] // gh, wh[0] // gw
        for gy in range(gh):
            for gx in range(gw):
                cell = eq[gy * ch:(gy + 1) * ch, gx * cw:(gx + 1) * cw]
                fast.detect(cell)
        t4 = time.perf_counter()
        if i > 2:
            t_hist.append(t1 - t0)
            t_pyr.append(t2 - t1)
            t_klt.append(t3 - t2 - t_rs)
            t_rsc.append(t_rs)
            t_fast.append(t4 - t3)
        prev = eq
    pyr_ms = 1e3 * float(np.mean(t_pyr))
    res = {
        "clahe_ms": 1e3 * float(np.mean(t_hist)),
        "pyramid_ms": pyr_ms,
        # LK minus the 2 internal pyramid rebuilds python forces (see above).
        "klt_ms": max(1e3 * float(np.mean(t_klt)) - 2.0 * pyr_ms, 0.0),
        "ransac_ms": 1e3 * float(np.mean(t_rsc)),
        "fast_ms": 1e3 * float(np.mean(t_fast)),
    }
    res["track_total_ms"] = sum(res.values())
    return res


def main():
    print("=== filter workload (Eigen -O3, single thread) ===")
    fb = run_refbench()

    print("\n=== frontend workload (OpenCV = the reference's own tracker) ===")
    import cv2

    print(f"cv2 {cv2.__version__}")
    fe1 = run_cv2_frontend(threads=1)
    print("single-thread:", {k: round(v, 2) for k, v in fe1.items()})
    fe4 = run_cv2_frontend(threads=0)  # 0 = let OpenCV use all cores
    print("all-cores:   ", {k: round(v, 2) for k, v in fe4.items()})

    if fb:
        t_filter = fb["ms_per_frame"]
        t_track = fe1["track_total_ms"]
        print("\n=== derived reference-on-this-host bounds ===")
        print(f"sim-mode fps bound (filter only):      {1e3 / t_filter:8.1f} fps")
        print(f"euroc-mode fps bound (track + filter): {1e3 / (t_filter + t_track):8.1f} fps")
        print(json.dumps({
            "refbench_filter_ms": round(t_filter, 3),
            "cv2_track_ms_1thread": round(t_track, 2),
            "sim_fps_bound": round(1e3 / t_filter, 1),
            "euroc_fps_bound": round(1e3 / (t_filter + t_track), 1),
        }))


if __name__ == "__main__":
    main()
