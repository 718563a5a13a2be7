#!/bin/bash
# Run the test suite on the host CPU backend (8 virtual devices).
# The axon remote-TPU plugin is disabled so tests never touch the real chip
# (it is single-client; bench.py owns it).
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ "$@"
