#!/bin/sh
# TPU post-outage battery: run when the tunnel recovers from a wedge.
# Order matters — each stage is a fresh process (single-chip exclusivity),
# cheapest signal first so a re-wedge is caught early.  Logs to stdout.
#
#   sh tools/tpu_recovery.sh [--fast]   # --fast: skip the real-TPU pytest
set -e
cd "$(dirname "$0")/.."

echo "== 1. smoke (fresh process, 120 s cap) =="
timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu', jax.default_backend()
x = jax.device_put(jnp.arange(1024, dtype=jnp.int32))
assert int(x.sum()) == 523776
print('TUNNEL_OK', jax.devices()[0])
"

echo "== 2. headline bench (cold-file + sustained_e2e) =="
timeout 3000 python bench.py

echo "== 3. front-half experiment timings =="
timeout 1800 python tools/exp_demod_front.py --time

echo "== 3b. headline A/B under the packed front (pick the winner) =="
DUMP1090_TPU_FRONT=packed timeout 3000 python bench.py

if [ "$1" != "--fast" ]; then
    echo "== 4. real-TPU suite =="
    DUMP1090_TEST_TPU=1 timeout 3600 python -m pytest tests/ -q
fi

echo "== 5. on-device differential fuzz (real chip) =="
REF=$(python tools/refbuild.py "${REF:-/tmp/refbuild/dump1090}")
timeout 1800 python tools/fuzz_diff.py --ref "$REF" --n 4 --seed 31 \
    --mode device --backend tpu
timeout 1800 python tools/fuzz_diff.py --ref "$REF" --n 4 --seed 32 \
    --mode sharded-device --backend tpu

echo "RECOVERY BATTERY PASSED"
