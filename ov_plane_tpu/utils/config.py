"""Configuration tree for the TPU VIO engine.

Dataclass mirror of the reference's config surface (``VioManagerOptions`` and
its nested structs — VioManagerOptions.h:62, StateOptions.h:41-154,
TrackPlaneOptions.h:38-81, NoiseManager.h:39-72, UpdaterOptions.h:37-53,
SURVEY.md §5.6), loadable from the *same YAML files* so reference configs run
unmodified. On top of the reference keys it adds the TPU-specific static
capacity knobs (max feature slots, padding sizes, dtypes, mesh axes) that a
fixed-shape XLA program needs.
"""

from __future__ import annotations

import dataclasses
import io
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


@dataclass
class StateOptions:
    """Filter flags (reference: state/StateOptions.h:41-154)."""

    do_fej: bool = True
    use_rk4_integration: bool = True
    imu_avg: bool = True
    do_calib_camera_pose: bool = False
    do_calib_camera_intrinsics: bool = False
    do_calib_camera_timeoffset: bool = False
    max_clone_size: int = 11
    max_slam_features: int = 25
    max_slam_in_update: int = 25
    max_msckf_in_update: int = 40
    num_cameras: int = 1
    feat_rep_msckf: str = "GLOBAL_3D"
    feat_rep_slam: str = "GLOBAL_3D"

    # Plane options (reference: StateOptions.h "16 plane-specific options").
    use_plane_constraint: bool = True
    use_plane_constraint_msckf: bool = True
    use_plane_constraint_slamu: bool = True
    use_plane_constraint_slamd: bool = True
    use_plane_slam_feats: bool = True
    use_refine_plane_feat: bool = True
    use_plane_ransac: bool = False
    use_groundtruths: bool = False
    sigma_constraint: float = 0.05
    const_init_multi: float = 5.0
    const_init_chi2: float = 1.0
    max_msckf_plane: int = 20
    sigma_plane_merge: float = 0.1
    plane_merge_chi2: float = 1.0
    plane_merge_deg_max: float = 1.0
    plane_collect_init_feats: bool = True
    plane_collect_msckf_feats: bool = True
    plane_init_min_feat: int = 10
    plane_init_max_cond: float = 50.0
    plane_msckf_min_feat: int = 5
    plane_msckf_max_cond: float = 50.0
    # Robust plane refinement (reference hardcodes these in optimize_plane:
    # CauchyLoss(1.0) on every factor, PlaneFitting.cpp:256,367; post-opt
    # inlier re-acceptance at 0.03 m with ≥max(4, 0.8·n) survivors,
    # :452-495). Exposed as config so sweeps can ablate them; 0 disables.
    plane_refine_cauchy: float = 1.0
    plane_refine_max_error: float = 0.03
    plane_refine_min_inlier_ratio: float = 0.80
    # Plane-feature triangulation gates (plane_feat_* keys in YAML).
    plane_feat_min_obs: int = 2
    plane_min_dist: float = 0.10
    plane_max_dist: float = 60.0
    plane_max_cond_number: float = 20000.0


@dataclass
class NoiseManager:
    """IMU continuous-time noise densities (reference: utils/NoiseManager.h)."""

    sigma_w: float = 1.6968e-04
    sigma_wb: float = 1.9393e-05
    sigma_a: float = 2.0000e-3
    sigma_ab: float = 3.0000e-03

    @property
    def sigma_w_2(self):
        return self.sigma_w**2

    @property
    def sigma_wb_2(self):
        return self.sigma_wb**2

    @property
    def sigma_a_2(self):
        return self.sigma_a**2

    @property
    def sigma_ab_2(self):
        return self.sigma_ab**2


@dataclass
class UpdaterOptions:
    """Per-updater chi2 multiplier + pixel sigma (reference: update/UpdaterOptions.h)."""

    chi2_multipler: float = 5.0
    sigma_pix: float = 1.0


@dataclass
class FeatureInitializerOptions:
    """Triangulation options (reference: external ov_core FeatureInitializerOptions)."""

    triangulate_1d: bool = False
    refine_features: bool = True
    max_runs: int = 5
    init_lamda: float = 1e-3
    max_lamda: float = 1e10
    min_dx: float = 1e-6
    min_dcost: float = 1e-6
    lam_mult: float = 10.0
    min_dist: float = 0.10
    max_dist: float = 60.0
    max_baseline: float = 40.0
    max_cond_number: float = 10000.0


@dataclass
class TrackPlaneOptions:
    """Plane-frontend thresholds (reference: track_plane/TrackPlaneOptions.h:38-81)."""

    max_tri_side_px: float = 200.0
    max_norm_count: int = 8
    max_norm_avg_max: float = 20.0
    max_norm_avg_var: float = 20.0
    max_norm_deg: float = 25.0
    max_dist_between_z: float = 0.30
    max_pairwise_px: float = 100.0
    min_norms: int = 5
    check_old_feats: bool = True
    filter_num_feat: int = 4
    filter_z_thresh: float = 5.0
    # Incremental whole-track triangulation gates (TrackPlaneOptions.h:77-80).
    feat_init_min_obs: int = 4
    min_dist: float = 0.10
    max_dist: float = 60.0
    max_cond_number: float = 8000.0
    # Whole-track ray-intersection RMS gate: reject triangulations whose
    # accumulated perpendicular ray distances don't meet.
    # Gate = max(rel · depth, abs) meters. The floor must absorb the
    # pose-drift component of the ray miss (clone position error enters the
    # accumulated centers directly, ~cm-dm regardless of depth); gross
    # mistracks measure >=0.5 m RMS, so 0.10 m keeps full discrimination.
    max_ray_rms_rel: float = 0.03
    max_ray_rms_abs: float = 0.10


@dataclass
class SimOptions:
    """Simulator options (reference: VioManagerOptions.h sim_* block)."""

    seed_state_init: int = 0
    seed_perturb: int = 0
    seed_measurements: int = 0
    do_perturbation: bool = False
    traj_path: str = ""  # empty -> procedural trajectory
    # Seconds of a LOADED trajectory to skip before replay starts (segment
    # isolation for consistency bisects; procedural kinds ignore it).
    traj_start: float = 0.0
    distance_threshold: float = 1.2
    freq_cam: float = 10.0
    freq_imu: float = 400.0
    min_feature_gen_distance: float = 2.0
    max_feature_gen_distance: float = 5.0
    # Procedural trajectory fallback knobs (no reference analogue).
    traj_duration: float = 60.0
    traj_kind: str = "room_scan"
    # Rigid world translation applied to the procedural trajectory (the
    # planes follow via the traj bbox): places the scene away from the world
    # origin like the reference's datasets, which changes the raw-coordinate
    # conditioning the plane-fit gate measures (PlaneFitting.cpp:59-66).
    world_offset: tuple = (0.0, 0.0, 0.0)


@dataclass
class TpuOptions:
    """Static capacities + numeric policy for the fixed-shape XLA program.

    These have no reference analogue: the C++ code grows/shrinks Eigen
    matrices at runtime, which XLA cannot do. All paddings here bound the
    live set; masked slots cost compute but not correctness.
    """

    max_features: int = 768        # feature-bank slots (tracked features alive at once)
    max_obs_per_frame: int = 512   # per-frame measurement slots fed by frontend/sim
    max_planes: int = 8            # CP plane state slots
    max_msckf_update: int = 64     # features per MSCKF update batch
    # Grouped out-of-state plane updates per frame (the reference processes
    # every group, UpdaterMSCKF.cpp:411-649; this static bound is unreachable
    # at default gates — see PlaneMsckfOptions — and overflow is counted in
    # StepOutput.n_plane_dropped + the plane CSV, never silent).
    max_planes_per_frame: int = 8
    # Static landmark slots reserved for ArUco corners when use_aruco is on:
    # aruco landmarks live OUTSIDE the max_slam budget and are never
    # marginalized (VioManager.cpp:438-452, StateHelper.cpp:638-652).
    max_aruco_landmarks: int = 16
    max_imu_per_frame: int = 64    # IMU samples per camera frame (400/10 Hz = 40 + slack)
    dtype_filter: str = "float64"  # covariance/EKF math dtype
    dtype_frontend: str = "float32"  # image/feature math dtype
    mesh_axes: Dict[str, int] = field(default_factory=dict)  # e.g. {"seq": 8}
    # Information-form measurement compression (fused Pallas HᵀH on TPU)
    # instead of QR — much faster; squares conditioning (fine for whitened rows).
    # In-loop sharded Schur reduction: mesh axis name for sharding the MSCKF
    # measurement rows (empty = off). Requires running under jax.set_mesh.
    shard_axis: str = ""
    use_info_compression: bool = False
    # Tilt-aware adaptive constraint sigma (TPU-native extension, no
    # reference analogue — the reference computes the support's scatter but
    # only prints it, PlaneFitting.cpp:498-505): each plane group's
    # constraint rows are whitened with
    # sqrt(sigma_c² + σ_z² + (‖cp‖·σ_z/s_lat)²) — scatter PLUS the
    # patch-geometry tilt error a small close-range support cannot
    # constrain (the round-5 tabletop mechanism; see BASELINE.md).
    sigma_c_adaptive: bool = False


@dataclass
class VioConfig:
    """Master config aggregate (reference: core/VioManagerOptions.h:62)."""

    state: StateOptions = field(default_factory=StateOptions)
    imu_noises: NoiseManager = field(default_factory=NoiseManager)
    msckf_options: UpdaterOptions = field(default_factory=lambda: UpdaterOptions(chi2_multipler=5.0, sigma_pix=1.0))
    slam_options: UpdaterOptions = field(default_factory=lambda: UpdaterOptions(chi2_multipler=5.0, sigma_pix=1.0))
    zupt_options: UpdaterOptions = field(default_factory=lambda: UpdaterOptions(chi2_multipler=1.0, sigma_pix=1.0))
    featinit: FeatureInitializerOptions = field(default_factory=FeatureInitializerOptions)
    trackplane: TrackPlaneOptions = field(default_factory=TrackPlaneOptions)
    sim: SimOptions = field(default_factory=SimOptions)
    tpu: TpuOptions = field(default_factory=TpuOptions)

    # Console verbosity (YAML `verbosity`, applied to utils.printer on load).
    verbosity: str = "INFO"

    gravity_mag: float = 9.81
    calib_camimu_dt: float = 0.0
    # Per-camera intrinsics: model ("radtan"/"equi"), [fx fy cx cy d0..d3], (w, h).
    cam_model: str = "radtan"
    cam_intrinsics: List[float] = field(
        default_factory=lambda: [458.654, 457.296, 367.215, 248.375, -0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]
    )
    cam_wh: List[int] = field(default_factory=lambda: [752, 480])
    # Extrinsics: JPL quaternion q_ItoC (x,y,z,w) + p_IinC.
    cam_extrinsics: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])

    # Frontend knobs (reference: VioManagerOptions tracker block).
    num_pts: int = 150
    num_pts_plane: int = 150
    fast_threshold: int = 15
    use_aruco: bool = False
    downsize_aruco: bool = True
    grid_x: int = 20
    grid_y: int = 20
    min_px_dist: int = 15
    track_frequency: float = 21.0
    histogram_method: str = "HISTOGRAM"  # NONE, HISTOGRAM, CLAHE

    # ZUPT.
    try_zupt: bool = False
    zupt_max_velocity: float = 0.1
    zupt_noise_multiplier: float = 50.0
    zupt_max_disparity: float = 0.5
    zupt_only_at_beginning: bool = True
    zupt_integrated_accel: bool = False
    zupt_explicit_zero_motion: bool = False

    @property
    def gravity(self) -> np.ndarray:
        return np.array([0.0, 0.0, self.gravity_mag])


# ---------------------------------------------------------------------------
# YAML loading (reference-format compatible)
# ---------------------------------------------------------------------------

# Mapping: reference YAML key -> (dataclass path, field).
_YAML_MAP = {
    "use_fej": ("state", "do_fej"),
    "use_rk4int": ("state", "use_rk4_integration"),
    "use_imuavg": ("state", "imu_avg"),
    "calib_cam_extrinsics": ("state", "do_calib_camera_pose"),
    "calib_cam_intrinsics": ("state", "do_calib_camera_intrinsics"),
    "calib_cam_timeoffset": ("state", "do_calib_camera_timeoffset"),
    "max_clones": ("state", "max_clone_size"),
    "max_slam": ("state", "max_slam_features"),
    "max_slam_in_update": ("state", "max_slam_in_update"),
    "max_msckf_in_update": ("state", "max_msckf_in_update"),
    "max_cameras": ("state", "num_cameras"),
    "feat_rep_msckf": ("state", "feat_rep_msckf"),
    "feat_rep_slam": ("state", "feat_rep_slam"),
    "use_plane_constraint": ("state", "use_plane_constraint"),
    "use_plane_constraint_msckf": ("state", "use_plane_constraint_msckf"),
    "use_plane_constraint_slamu": ("state", "use_plane_constraint_slamu"),
    "use_plane_constraint_slamd": ("state", "use_plane_constraint_slamd"),
    "use_plane_slam_feats": ("state", "use_plane_slam_feats"),
    "use_refine_plane_feat": ("state", "use_refine_plane_feat"),
    "use_plane_ransac": ("state", "use_plane_ransac"),
    "use_groundtruths": ("state", "use_groundtruths"),
    "sigma_constraint": ("state", "sigma_constraint"),
    "const_init_multi": ("state", "const_init_multi"),
    "const_init_chi2": ("state", "const_init_chi2"),
    "max_msckf_plane": ("state", "max_msckf_plane"),
    "sigma_plane_merge": ("state", "sigma_plane_merge"),
    "plane_merge_chi2": ("state", "plane_merge_chi2"),
    "plane_merge_deg_max": ("state", "plane_merge_deg_max"),
    "plane_collect_init_feats": ("state", "plane_collect_init_feats"),
    "plane_collect_msckf_feats": ("state", "plane_collect_msckf_feats"),
    "plane_init_min_feat": ("state", "plane_init_min_feat"),
    "plane_init_max_cond": ("state", "plane_init_max_cond"),
    "plane_msckf_min_feat": ("state", "plane_msckf_min_feat"),
    "plane_msckf_max_cond": ("state", "plane_msckf_max_cond"),
    "plane_feat_min_obs": ("state", "plane_feat_min_obs"),
    "plane_min_dist": ("state", "plane_min_dist"),
    "plane_max_dist": ("state", "plane_max_dist"),
    "plane_max_cond_number": ("state", "plane_max_cond_number"),
    "plane_max_tri_side_px": ("trackplane", "max_tri_side_px"),
    "plane_max_norm_count": ("trackplane", "max_norm_count"),
    "plane_max_norm_avg_max": ("trackplane", "max_norm_avg_max"),
    "plane_max_norm_avg_var": ("trackplane", "max_norm_avg_var"),
    "plane_max_norm_deg": ("trackplane", "max_norm_deg"),
    "plane_max_dist_between_z": ("trackplane", "max_dist_between_z"),
    "plane_max_pairwise_px": ("trackplane", "max_pairwise_px"),
    "plane_min_norms": ("trackplane", "min_norms"),
    "plane_check_old_feats": ("trackplane", "check_old_feats"),
    "plane_feat_min_obs": ("trackplane", "feat_init_min_obs"),
    "plane_min_dist": ("trackplane", "min_dist"),
    "plane_max_dist": ("trackplane", "max_dist"),
    "plane_max_cond_number": ("trackplane", "max_cond_number"),
    "plane_filter_num_feat": ("trackplane", "filter_num_feat"),
    "plane_filter_z_thresh": ("trackplane", "filter_z_thresh"),
    "verbosity": (None, "verbosity"),
    "gravity_mag": (None, "gravity_mag"),
    "num_pts": (None, "num_pts"),
    "num_pts_plane": (None, "num_pts_plane"),
    "fast_threshold": (None, "fast_threshold"),
    "use_aruco": (None, "use_aruco"),
    "downsize_aruco": (None, "downsize_aruco"),
    "grid_x": (None, "grid_x"),
    "grid_y": (None, "grid_y"),
    "min_px_dist": (None, "min_px_dist"),
    "track_frequency": (None, "track_frequency"),
    "histogram_method": (None, "histogram_method"),
    "try_zupt": (None, "try_zupt"),
    "zupt_max_velocity": (None, "zupt_max_velocity"),
    "zupt_noise_multiplier": (None, "zupt_noise_multiplier"),
    "zupt_max_disparity": (None, "zupt_max_disparity"),
    "zupt_only_at_beginning": (None, "zupt_only_at_beginning"),
    "zupt_integrated_accel": (None, "zupt_integrated_accel"),
    "zupt_explicit_zero_motion": (None, "zupt_explicit_zero_motion"),
    "up_msckf_sigma_px": ("msckf_options", "sigma_pix"),
    "up_msckf_chi2_multipler": ("msckf_options", "chi2_multipler"),
    "up_slam_sigma_px": ("slam_options", "sigma_pix"),
    "up_slam_chi2_multipler": ("slam_options", "chi2_multipler"),
    "zupt_chi2_multipler": ("zupt_options", "chi2_multipler"),
    "sim_seed_state_init": ("sim", "seed_state_init"),
    "sim_seed_preturb": ("sim", "seed_perturb"),
    "sim_seed_measurements": ("sim", "seed_measurements"),
    "sim_do_perturbation": ("sim", "do_perturbation"),
    "sim_traj_path": ("sim", "traj_path"),
    "sim_distance_threshold": ("sim", "distance_threshold"),
    "sim_freq_cam": ("sim", "freq_cam"),
    "sim_freq_imu": ("sim", "freq_imu"),
    "sim_min_feature_gen_dist": ("sim", "min_feature_gen_distance"),
    "sim_max_feature_gen_dist": ("sim", "max_feature_gen_distance"),
}


def _parse_opencv_yaml(text: str) -> Dict[str, Any]:
    """Parse an OpenCV-style YAML ("%YAML:1.0" header) into a plain dict."""
    if yaml is None:  # pragma: no cover
        raise RuntimeError("pyyaml not available")
    lines = [ln for ln in text.splitlines() if not ln.strip().startswith("%YAML")]
    return yaml.safe_load(io.StringIO("\n".join(lines))) or {}


def load_yaml(path: str, base: Optional[VioConfig] = None, overrides: Optional[Dict[str, Any]] = None) -> VioConfig:
    """Load a reference-format estimator_config.yaml into a VioConfig.

    Unknown keys are collected (reference behavior: the YamlParser fails on
    unread keys, VioManagerOptions print-on-load; we expose them to the caller
    instead of exiting).
    """
    cfg = dataclasses.replace(base) if base is not None else VioConfig()
    with open(path) as f:
        raw = _parse_opencv_yaml(f.read())
    if overrides:
        raw.update(overrides)
    unknown = {}
    for key, value in raw.items():
        if key in _YAML_MAP:
            section, fieldname = _YAML_MAP[key]
            target = cfg if section is None else getattr(cfg, section)
            cast = type(getattr(target, fieldname))
            if cast is bool and isinstance(value, (int, float)):
                value = bool(value)
            elif cast in (int, float):
                value = cast(value)
            setattr(target, fieldname, value)
        else:
            unknown[key] = value
    cfg._unknown_keys = unknown  # type: ignore[attr-defined]
    # NOTE: the YAML `verbosity` key is parsed into cfg.verbosity but NOT
    # applied here — a config loader mutating process-wide logging state is a
    # hidden side effect (a later load would clobber a CLI override). Entry
    # points apply it: printer.set_print_level(cfg.verbosity) +
    # printer.print_config(cfg) reproduce the reference's startup behavior
    # (run_simulation.cpp:77-79, VioManagerOptions.h:68-201).
    return cfg


def sim_config(**overrides) -> VioConfig:
    """Config matching the reference's config/sim/estimator_config.yaml defaults.

    If the reference tree is mounted, loads the actual YAML; otherwise uses
    the baked-in equivalents. Keyword overrides are applied on top.
    """
    ref = "/root/reference/config/sim/estimator_config.yaml"
    if os.path.exists(ref) and yaml is not None:
        cfg = load_yaml(ref)
    else:
        cfg = VioConfig()
        cfg.state.max_slam_features = 50
        cfg.msckf_options.chi2_multipler = 99999
        cfg.slam_options.chi2_multipler = 99999
    # Sim cameras: 752x480 radtan with EuRoC-like intrinsics (the reference's
    # kalibr_imucam_chain.yaml for sim); IMU noises from kalibr_imu_chain.yaml.
    cfg.cam_model = "radtan"
    cfg.cam_wh = [752, 480]
    cfg.cam_intrinsics = [458.654, 457.296, 367.215, 248.375, -0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]
    cfg.cam_extrinsics = [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
    for key, value in overrides.items():
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], value)
    return cfg
