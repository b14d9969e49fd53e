#!/bin/bash
# Populate the persistent XLA compile cache (.jax_cache/) for the test suite,
# one test file per FRESH pytest process.
#
# Why: executable.serialize() segfaults late in long multi-compile processes
# (see tests/conftest.py), so plain `pytest tests/` runs the cache read-only.
# Per-file processes keep each serialize early-process, where it is reliable.
# Run this after any kernel/protocol change; the next plain suite run is then
# warm (~20 min instead of ~60).
set -u -o pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/repo/tests
export JAX_PLATFORMS=cpu
export STARK_CACHE_WRITE=1
fail=0
for f in tests/test_*.py; do
    echo "=== $f ==="
    timeout 3000 python -m pytest "$f" -q --no-header 2>&1 | tail -2
    rc=${PIPESTATUS[0]}
    [ "$rc" -ne 0 ] && { echo "FAILED: $f (rc=$rc)"; fail=1; }
done
exit $fail
