"""ov_plane_tpu — a TPU-native plane-aided visual-inertial odometry (VIO) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of rpng/ov_plane
(Chen et al., "Monocular Visual-Inertial Odometry with Planar Regularities",
ICRA 2023): MSCKF visual-inertial estimation with closest-point (CP) plane
landmarks and point-on-plane constraints.

Unlike the reference (single-threaded C++/Eigen/ROS1), this framework is built
TPU-first:

* the EKF state is a fixed-shape structure-of-arrays pytree with static
  covariance layout and slot recycling (no dynamic resizing, XLA-friendly);
* every per-feature loop of the reference is a batched/vmapped op over padded,
  masked arrays;
* the whole per-frame pipeline is a single jittable pure function, vmappable
  over Monte-Carlo seeds and data-parallel over sequences on a device mesh;
* the measurement compression / nullspace projection (sequential Givens chains
  in the reference) are batched QR factorizations;
* the simulator is pure JAX (seeded counter-based RNG), so 20-seed Monte-Carlo
  consistency sweeps run as one batch.

Subpackage map (reference analogue in parentheses):

* ``ops``       — math kernels: JPL quaternions/SO(3) (ov_core quat_ops),
                  camera models (ov_core CamRadtan/CamEqui), EKF core
                  (StateHelper), QR compression (UpdaterHelper Givens),
                  triangulation (FeatureInitializer), plane fitting
                  (PlaneFitting), SE(3) B-splines (ov_core BsplineSE3).
* ``state``     — static state layout + VioState pytree (State) and the IMU
                  propagator (Propagator).
* ``models``    — the estimator pipeline: feature bank, triage, MSCKF /
                  SLAM / plane updaters, the VIO manager step function
                  (VioManager + Updater*).
* ``sim``       — vectorized simulator (Simulator, SimPlane).
* ``frontend``  — vision frontend: KLT tracking, FAST, Delaunay plane
                  detection (TrackPlane).
* ``parallel``  — mesh/sharding utilities, distributed Schur reduction,
                  batched replay (new; no reference analogue).
* ``eval``      — trajectory alignment, ATE/RPE/NEES metrics (ov_eval).
* ``utils``     — config tree (VioManagerOptions), chi2 tables, timing.
"""

__version__ = "0.1.0"
