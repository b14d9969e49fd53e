#!/bin/bash
# Shared-tail depth + batch-size sweep on the real TPU chip (one at a time;
# bench.py asserts golden verdicts, so every line is also a TPU parity check
# of the configuration it measures -- including the MXU agreement path,
# default-on under jax.default_backend() == tpu).
set -u
cd /root/repo
LOG=${1:-/tmp/bench_sweep.log}
: > "$LOG"
run() {
    echo "=== $* ===" >> "$LOG"
    env "$@" timeout 1500 python -u bench.py "$BATCH" 8 >> "$LOG" 2>&1
    echo >> "$LOG"
}
BATCH=4096
run STARK_SHARED_TAIL=4
run STARK_SHARED_TAIL=6
run STARK_SHARED_TAIL=8
run STARK_SHARED_TAIL=10
run STARK_SHARED_TAIL=4 STARK_CHUNK=512
run STARK_SHARED_TAIL=4 STARK_CHUNK=2048
BATCH=8192
run STARK_SHARED_TAIL=4
BATCH=16384
run STARK_SHARED_TAIL=4
echo DONE >> "$LOG"
