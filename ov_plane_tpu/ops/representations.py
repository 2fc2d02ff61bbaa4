"""Landmark representations: all six parameterizations of the reference.

Parity target: ``UpdaterHelper::get_feature_jacobian_representation``
(update/UpdaterHelper.cpp:35-193) and the ov_core ``LandmarkRepresentation``
enum — GLOBAL_3D, GLOBAL_FULL_INVERSE_DEPTH, ANCHORED_3D,
ANCHORED_FULL_INVERSE_DEPTH, ANCHORED_MSCKF_INVERSE_DEPTH,
ANCHORED_INVERSE_DEPTH_SINGLE.

TPU-first design note: the reference hand-writes each 3x3 chain-rule block.
Here each representation is defined ONCE as a pure function
``params -> p_FinG`` and every Jacobian (wrt params, wrt the anchor-pose
error state, wrt the extrinsic calib error state) is produced by ``jacfwd``
on the perturbation map — exact to machine precision, fused by XLA into the
surrounding update, and impossible to let drift out of sync with the
transform itself. Error-state conventions match the filter: JPL attitude
perturbation R <- (I - skew(dth)) R.

Anchored representations parameterize the feature in an anchor CAMERA frame
(anchor clone pose R_GtoI/p_IinG plus extrinsic R_ItoC/p_IinC):
p_FinG = R_CtoG (p_FinA - p_IinC) ... following the reference's composition
p_FinG = R_GtoI^T R_ItoC^T (p_FinA - p_IinC) + p_IinG.

FEJ semantics follow UpdaterHelper.cpp:92-105: the current best global
estimate is re-expressed in the FEJ anchor frame before differentiating.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops.quat import skew

GLOBAL_3D = 0
GLOBAL_FULL_INVERSE_DEPTH = 1
ANCHORED_3D = 2
ANCHORED_FULL_INVERSE_DEPTH = 3
ANCHORED_MSCKF_INVERSE_DEPTH = 4
ANCHORED_INVERSE_DEPTH_SINGLE = 5

_NAMES = {
    "GLOBAL_3D": GLOBAL_3D,
    "GLOBAL_FULL_INVERSE_DEPTH": GLOBAL_FULL_INVERSE_DEPTH,
    "ANCHORED_3D": ANCHORED_3D,
    "ANCHORED_FULL_INVERSE_DEPTH": ANCHORED_FULL_INVERSE_DEPTH,
    "ANCHORED_MSCKF_INVERSE_DEPTH": ANCHORED_MSCKF_INVERSE_DEPTH,
    "ANCHORED_INVERSE_DEPTH_SINGLE": ANCHORED_INVERSE_DEPTH_SINGLE,
}


def from_name(name: str) -> int:
    return _NAMES[name.strip().upper()]


def is_anchored(rep: int) -> bool:
    return rep >= ANCHORED_3D


def dof(rep: int) -> int:
    """Error-state dof of the representation (1 for single inverse depth)."""
    return 1 if rep == ANCHORED_INVERSE_DEPTH_SINGLE else 3


class AnchorFrame(NamedTuple):
    """Anchor camera frame = anchor IMU clone pose + IMU->camera extrinsic."""

    R_GtoI: jnp.ndarray   # [3,3]
    p_IinG: jnp.ndarray   # [3]
    R_ItoC: jnp.ndarray   # [3,3]
    p_IinC: jnp.ndarray   # [3]

    def point_to_global(self, p_FinA):
        R_CtoG = self.R_GtoI.T @ self.R_ItoC.T
        return R_CtoG @ (p_FinA - self.p_IinC) + self.p_IinG

    def point_to_anchor(self, p_FinG):
        R_GtoC = self.R_ItoC @ self.R_GtoI
        return R_GtoC @ (p_FinG - self.p_IinG) + self.p_IinC


# --------------------------------------------------------------------------
# params <-> 3D point (in the representation's base frame: global for the
# GLOBAL_* reps, anchor camera frame for ANCHORED_*). Matches Landmark.cpp's
# set_from_xyz/get_xyz spherical convention: theta = atan2(y, x),
# phi = acos(z/|p|), rho = 1/|p|.
# --------------------------------------------------------------------------

def _xyz_to_invdepth(p):
    rho = 1.0 / jnp.linalg.norm(p)
    return jnp.stack([jnp.arctan2(p[1], p[0]), jnp.arccos(rho * p[2]), rho])


def _invdepth_to_xyz(v):
    th, phi, rho = v[0], v[1], v[2]
    return jnp.stack([jnp.cos(th) * jnp.sin(phi), jnp.sin(th) * jnp.sin(phi), jnp.cos(phi)]) / rho


def _xyz_to_msckf_inv(p):
    return jnp.stack([p[0] / p[2], p[1] / p[2], 1.0 / p[2]])


def _msckf_inv_to_xyz(v):
    return jnp.stack([v[0], v[1], 1.0]) / v[2]


def params_from_point(rep: int, p_base):
    """Representation parameters from a point in the base frame.

    For ANCHORED_INVERSE_DEPTH_SINGLE the 1-dof state is rho = 1/z; the fixed
    bearing rho*p_FinA is carried separately (see ``single_depth_bearing``).
    Returns a length-3 vector except for the single-depth rep (length 1).
    """
    if rep in (GLOBAL_3D, ANCHORED_3D):
        return p_base
    if rep in (GLOBAL_FULL_INVERSE_DEPTH, ANCHORED_FULL_INVERSE_DEPTH):
        return _xyz_to_invdepth(p_base)
    if rep == ANCHORED_MSCKF_INVERSE_DEPTH:
        return _xyz_to_msckf_inv(p_base)
    if rep == ANCHORED_INVERSE_DEPTH_SINGLE:
        return jnp.stack([1.0 / p_base[2]])
    raise ValueError(f"unknown representation {rep}")


def single_depth_bearing(p_base):
    """Fixed bearing for ANCHORED_INVERSE_DEPTH_SINGLE: b = p/z (so p = b/rho)."""
    return p_base / p_base[2]


def point_from_params(rep: int, params, bearing=None):
    """Point in the base frame from representation parameters."""
    if rep in (GLOBAL_3D, ANCHORED_3D):
        return params
    if rep in (GLOBAL_FULL_INVERSE_DEPTH, ANCHORED_FULL_INVERSE_DEPTH):
        return _invdepth_to_xyz(params)
    if rep == ANCHORED_MSCKF_INVERSE_DEPTH:
        return _msckf_inv_to_xyz(params)
    if rep == ANCHORED_INVERSE_DEPTH_SINGLE:
        return bearing / params[0]
    raise ValueError(f"unknown representation {rep}")


@functools.partial(jax.jit, static_argnames=("rep",))
def rep_to_global(rep: int, params, anchor: AnchorFrame | None = None, bearing=None):
    p_base = point_from_params(rep, params, bearing)
    if is_anchored(rep):
        return anchor.point_to_global(p_base)
    return p_base


@functools.partial(jax.jit, static_argnames=("rep",))
def global_to_rep(rep: int, p_FinG, anchor: AnchorFrame | None = None):
    p_base = anchor.point_to_anchor(p_FinG) if is_anchored(rep) else p_FinG
    return params_from_point(rep, p_base)


# --------------------------------------------------------------------------
# Error-state Jacobians (the get_feature_jacobian_representation equivalent).
# --------------------------------------------------------------------------

class RepJacobians(NamedTuple):
    p_FinG: jnp.ndarray    # linearization-point global position [3]
    H_f: jnp.ndarray       # d p_FinG / d params            [3, dof]
    H_anchor: jnp.ndarray  # d p_FinG / d (dth, dp) anchor  [3, 6] (zero for global reps)
    H_calib: jnp.ndarray   # d p_FinG / d (dth, dp) extrinsic [3, 6] (zero unless calib on)


@functools.partial(jax.jit, static_argnames=("rep", "fej", "calib_extrinsic"))
def rep_jacobians(rep: int, p_FinG, p_FinG_fej, anchor: AnchorFrame | None,
                  anchor_fej: AnchorFrame | None, fej: bool = True,
                  calib_extrinsic: bool = False) -> RepJacobians:
    """All representation Jacobians, by autodiff of the perturbation map.

    Mirrors UpdaterHelper.cpp:35-193 exactly in semantics:
    * global reps: H_f only (H_anchor/H_calib zero);
    * anchored reps: H_anchor = d p_FinG/d(anchor clone error), H_calib wrt
      the IMU->cam extrinsic (returned zero unless ``calib_extrinsic``);
    * FEJ: the best current global point is re-anchored in the FEJ anchor
      frame before linearization (:92-105), and global inverse-depth
      linearizes at the FEJ point (:49-50).
    """
    dtype = p_FinG.dtype

    if not is_anchored(rep):
        p_lin = p_FinG_fej if fej else p_FinG
        params = params_from_point(rep, p_lin)

        def f(dparams):
            return point_from_params(rep, params + dparams)

        H_f = jax.jacfwd(f)(jnp.zeros(3, dtype))
        z6 = jnp.zeros((3, 6), dtype)
        return RepJacobians(point_from_params(rep, params), H_f, z6, z6)

    anc = anchor_fej if fej else anchor
    # Re-express the best global estimate in the (FEJ) anchor frame
    # (UpdaterHelper.cpp:97-104 — p_FinG_best through the fej clone pose).
    p_FinA = anc.point_to_anchor(p_FinG)
    params = params_from_point(rep, p_FinA)
    bearing = single_depth_bearing(p_FinA) if rep == ANCHORED_INVERSE_DEPTH_SINGLE else None

    def f(dparams, dth_anc, dp_anc, dth_cal, dp_cal):
        # JPL error states: R_GtoI <- (I - skew(dth)) R_GtoI, p <- p + dp.
        R_GtoI = (jnp.eye(3, dtype=dtype) - skew(dth_anc)) @ anc.R_GtoI
        p_IinG = anc.p_IinG + dp_anc
        R_ItoC = (jnp.eye(3, dtype=dtype) - skew(dth_cal)) @ anc.R_ItoC
        p_IinC = anc.p_IinC + dp_cal
        p_A = point_from_params(rep, params + dparams, bearing)
        return R_GtoI.T @ R_ItoC.T @ (p_A - p_IinC) + p_IinG

    d = dof(rep)
    zeros = (jnp.zeros(d, dtype), jnp.zeros(3, dtype), jnp.zeros(3, dtype),
             jnp.zeros(3, dtype), jnp.zeros(3, dtype))
    p_lin = f(*zeros)
    J = jax.jacfwd(f, argnums=(0, 1, 2, 3, 4))(*zeros)
    H_f = J[0].reshape(3, d)
    H_anchor = jnp.concatenate([J[1], J[2]], axis=1)
    if calib_extrinsic:
        H_calib = jnp.concatenate([J[3], J[4]], axis=1)
    else:
        H_calib = jnp.zeros((3, 6), dtype)
    return RepJacobians(p_lin, H_f, H_anchor, H_calib)
