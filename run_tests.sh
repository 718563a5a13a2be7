#!/bin/bash
# Run the test suite on the host CPU backend (8 virtual devices).
# The axon remote-TPU plugin is disabled so tests never touch the real chip
# (it is single-client; bench.py owns it).
#
# test_ec_msm (the device-kernel oracle file) runs in its own process: its
# large force_device XLA graphs abort intermittently when compiled after the
# rest of the suite in the same process.
set -e
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ \
    --ignore=tests/test_ec_msm.py "$@"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest \
    tests/test_ec_msm.py "$@"
