#!/bin/bash
# Run the test suite on the CPU backend without touching the axon TPU plugin.
#
# /root/.axon_site/sitecustomize.py (on PYTHONPATH) registers and initializes
# the remote-TPU PJRT plugin in EVERY python process at interpreter boot when
# PALLAS_AXON_POOL_IPS is set; under chip contention that init blocks for
# minutes. Clearing the variable skips the hook entirely for CPU-only work.
cd "$(dirname "$0")/.."
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
