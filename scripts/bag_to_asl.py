"""Convert a ROS1 bag to a EuRoC/ASL folder for `scripts/run_euroc.py`.

Pure python (ov_plane_tpu.eval.rosbag) — no ROS needed. This is how the
rpng_plane AR-Table sequences (BASELINE config 4, shipped only as bags —
reference replays them via rosbag::View, ros1_serial_msckf.cpp:132-190)
become replayable here.

Usage:
  python scripts/bag_to_asl.py --bag table_01.bag --out /tmp/table_01 \
      [--imu-topic /imu0] [--cam-topic /cam0/image_raw]
  python scripts/run_euroc.py --data /tmp/table_01 ...
"""

import argparse
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bag", required=True)
    ap.add_argument("--out", default="", help="output ASL folder (required unless --list)")
    ap.add_argument("--imu-topic", default="/imu0")
    ap.add_argument("--cam-topic", default="/cam0/image_raw")
    ap.add_argument("--list", action="store_true", help="print topics and exit")
    args = ap.parse_args()

    from ov_plane_tpu.eval.rosbag import BagReader, read_bag

    if args.list:
        for topic, typ in sorted(BagReader(args.bag).topics.items()):
            print(f"  {topic}: {typ}")
        return
    if not args.out:
        ap.error("--out is required unless --list")

    imu_t, imu_w, imu_a, cam_t, imgs = read_bag(args.bag, args.imu_topic, args.cam_topic)
    print(f"[bag2asl] {len(imu_t)} imu msgs, {len(cam_t)} frames from {args.bag}")

    base = os.path.join(args.out, "mav0")
    os.makedirs(os.path.join(base, "imu0"), exist_ok=True)
    os.makedirs(os.path.join(base, "cam0", "data"), exist_ok=True)

    with open(os.path.join(base, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,a_RS_S_x,a_RS_S_y,a_RS_S_z\n")
        for t, w, a in zip(imu_t, imu_w, imu_a):
            f.write(f"{int(round(t * 1e9))}," + ",".join(f"{v:.9f}" for v in (*w, *a)) + "\n")

    import cv2

    with open(os.path.join(base, "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for t, img in zip(cam_t, imgs):
            name = f"{int(round(t * 1e9))}.png"
            cv2.imwrite(os.path.join(base, "cam0", "data", name),
                        np.clip(img * 255.0, 0, 255).astype(np.uint8))
            f.write(f"{int(round(t * 1e9))},{name}\n")

    print(f"[bag2asl] wrote {base}")


if __name__ == "__main__":
    main()
