#!/usr/bin/env bash
# End-to-end smoke gate (role parity with the reference scripts/smoke_test.sh):
# import -> native build -> fast tests -> CLI demo path -> entry compile.
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}"

echo "== import =="
python -c "import pde_tpu; print('pde_tpu', pde_tpu.__version__)"

echo "== native build =="
python -c "from pde_tpu import native; print('native available:', native.is_available())"

echo "== entry compile =="
python -c "
import jax
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
print('entry OK:', out.shape)
"

echo "== multichip dryrun =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
"

echo "== fast tests =="
python -m pytest tests/test_heston.py tests/test_tridiag.py tests/test_native.py -q

echo "== cli =="
python -m pde_tpu.cli status > /dev/null && echo "cli status OK"

echo "SMOKE TEST PASSED"
