#!/usr/bin/env bash
# Fetch real evaluation datasets (EuRoC MAV + RPNG AR-Table).
#
# NOTE: this build environment has ZERO NETWORK EGRESS (DNS resolution fails;
# verified 2026-08-17: `curl http://robotics.ethz.ch` -> "Could not resolve
# host"). Run this script on a connected machine, then copy the folders in.
#
# EuRoC replay:   python scripts/run_euroc.py --data <dir>/V1_01_easy
# AR-Table bags:  python scripts/bag_to_asl.py --bag table_01.bag --out <dir>/table_01
#                 python scripts/run_euroc.py --data <dir>/table_01
#
# Reference protocol: results/run_ros_eth.sh:12-19 (EuRoC V1/V2),
# results/run_ros_rpng_plane.sh (AR-Table table_01..08).
set -euo pipefail

DEST="${1:-/root/data}"
mkdir -p "$DEST"

EUROC_BASE="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"
EUROC_SEQS=(
  "vicon_room1/V1_01_easy/V1_01_easy.zip"
  "vicon_room1/V1_02_medium/V1_02_medium.zip"
  "vicon_room1/V1_03_difficult/V1_03_difficult.zip"
  "vicon_room2/V2_01_easy/V2_01_easy.zip"
  "vicon_room2/V2_02_medium/V2_02_medium.zip"
  "vicon_room2/V2_03_difficult/V2_03_difficult.zip"
)

for seq in "${EUROC_SEQS[@]}"; do
  name="$(basename "$seq" .zip)"
  if [ -d "$DEST/$name" ]; then
    echo "[fetch] $name already present"
    continue
  fi
  echo "[fetch] $EUROC_BASE/$seq"
  curl -L --fail -o "$DEST/$name.zip" "$EUROC_BASE/$seq"
  mkdir -p "$DEST/$name"
  unzip -q "$DEST/$name.zip" -d "$DEST/$name"
  rm "$DEST/$name.zip"
done

# RPNG AR-Table (rpng_plane paper datasets; bags). Mirror list from
# https://github.com/rpng/ar_table_dataset
ARTABLE_BASE="https://drive.google.com/drive/folders/1G_0R3asxTsDvbFJw7gDGEvUMqCYFzTTT"
echo "[fetch] AR-Table sequences are hosted on Google Drive: $ARTABLE_BASE"
echo "[fetch] download table_01_okvis.bag .. table_08_okvis.bag manually, then:"
echo "        python scripts/bag_to_asl.py --bag table_01.bag --out $DEST/table_01"

# ---- Replay protocol (run after the data is in place) --------------------
# Reference-equivalent posyaw ATE per sequence (results/run_ros_eth.sh +
# ov_eval error_dataset); --use-planes for the plane-aided variant.
if [ "${REPLAY:-0}" = "1" ]; then
  for name in V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult; do
    [ -d "$DEST/$name/mav0" ] || continue
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
      python scripts/run_euroc.py --data "$DEST/$name" \
        --out "/tmp/${name}_traj.txt" --timing "/tmp/${name}_timing.csv" --use-planes
    python scripts/ov_eval.py error_dataset posyaw \
      "$DEST/$name/mav0/state_groundtruth_estimate0/data.csv" "/tmp/${name}_traj.txt"
  done
fi
