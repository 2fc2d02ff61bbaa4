"""Vectorized visual-inertial simulator (reference: ov_plane/src/sim)."""
