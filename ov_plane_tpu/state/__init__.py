"""State containers: static covariance layout, VioState pytree, IMU propagator."""

from ov_plane_tpu.state.layout import StateLayout  # noqa: F401
from ov_plane_tpu.state.vio_state import VioState  # noqa: F401
