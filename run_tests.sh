#!/bin/bash
# Run the test suite on the host CPU backend (8 virtual devices).
#
# Each test FILE runs in its own process, NPROC files at a time:
#  - isolation avoids the XLA:CPU compiler segfaults that appear when many
#    large limb-kernel graphs compile in one long-lived process
#    (seen in test_recursion / test_ec_msm when run after the full suite);
#  - parallelism cuts wall time ~NPROC-fold (compile-bound workload);
#  - the axon remote-TPU plugin is disabled so tests never touch the real
#    chip (it is single-client; bench.py owns it).
#
# Usage: ./run_tests.sh [pytest args...]
set -u
cd "$(dirname "$0")"
NPROC=${NPROC:-$(nproc)}
LOGDIR=$(mktemp -d /tmp/mpc_jf_suite.XXXX)

run_one() {
    f=$1; shift
    log="$LOGDIR/$(basename "$f" .py).log"
    # drop caller-supplied -q/-qq: the runner already passes -q, and -qq
    # would hide the "N passed" summary the accounting below parses
    args=()
    for a in "$@"; do case "$a" in -q|-qq) ;; *) args+=("$a");; esac; done
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -m pytest "$f" -q -p no:cacheprovider ${args[@]+"${args[@]}"} \
        > "$log" 2>&1
    rc=$?
    # interpreter crash (segfault/abort under parallel compile load, not a
    # test failure): retry once
    if [ $rc -ge 128 ] || grep -q "Fatal Python error" "$log"; then
        env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
            python -m pytest "$f" -q -p no:cacheprovider "$@" > "$log" 2>&1
        rc=$?
    fi
    tail -1 "$log" | sed "s|^|$f: |"
    return $rc
}
export -f run_one
export LOGDIR

# longest files first (greedy makespan): the sharded/mesh and MSM-oracle
# files dominate, so they must start immediately
ORDER="tests/test_plonk_2e12.py tests/test_sharded_prove.py tests/test_sharded.py tests/test_ec_msm.py \
tests/test_recursion.py tests/test_ultraplonk_e2e.py tests/test_curves_e2e.py \
tests/test_network_fabric.py tests/test_multiprover.py"
FILES=$(for f in $ORDER; do [ -f "$f" ] && echo "$f"; done;
        ls tests/test_*.py | grep -vxF -f <(printf '%s\n' $ORDER))
echo "$FILES" | xargs -P "$NPROC" -I{} bash -c 'run_one "$@"' _ {} "$@"
fail=0
for log in "$LOGDIR"/*.log; do
    if ! grep -qE "[0-9]+ passed" "$log" || grep -qE "failed|error" "$log"; then
        echo "FAILURE in $log:"; tail -20 "$log"; fail=1
    fi
done
total=$(grep -hoE "[0-9]+ passed" "$LOGDIR"/*.log | awk '{s+=$1} END {print s}')
echo "TOTAL: $total passed across $(ls "$LOGDIR" | wc -l) files (fail=$fail)"
exit $fail
