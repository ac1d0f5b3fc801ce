#!/bin/sh
# Run the full differential-verification campaign against the reference
# binary (one command for everything beyond `pytest tests/`).  ~25 min on
# CPU; every stage exits nonzero on the first byte difference.
#
#   REF=/tmp/refbuild/dump1090 sh tools/campaign.sh
#
# Builds the reference out-of-tree first if $REF is missing.
set -e
cd "$(dirname "$0")/.."
REF=${REF:-/tmp/refbuild/dump1090}

# shared out-of-tree stub-librtlsdr build (tools/refbuild.py)
REF=$(python tools/refbuild.py "$REF")

echo "== IQ-stream differential fuzz (host + device-twin + sharded paths) =="
python tools/fuzz_diff.py --ref "$REF" --n 10 --seed 11 --mode raw
python tools/fuzz_diff.py --ref "$REF" --n 10 --seed 12 --mode aggressive
python tools/fuzz_diff.py --ref "$REF" --n 10 --seed 13 --mode nofix
python tools/fuzz_diff.py --ref "$REF" --n 10 --seed 14 --mode verbose
python tools/fuzz_diff.py --ref "$REF" --n 6 --seed 15 --mode device
python tools/fuzz_diff.py --ref "$REF" --n 6 --seed 16 --mode sharded-device
# the packed demod front (DUMP1090_TPU_FRONT) must stay bit-identical
DUMP1090_TPU_FRONT=packed python tools/fuzz_diff.py --ref "$REF" --n 4 \
    --seed 17 --mode device

echo "== network hex-grammar fuzz (raw relay + SBS + stdout) =="
python tools/fuzz_hex.py --ref "$REF" --n 300 --rounds 2 --seed 21
python tools/fuzz_hex.py --ref "$REF" --n 300 --rounds 1 --seed 22 --mode aggressive
python tools/fuzz_hex.py --ref "$REF" --n 300 --rounds 1 --seed 23 --mode no-fix

echo "== exhaustive field-domain sweeps =="
python tools/sweep_hex.py --ref "$REF" --sweep all

echo "== live /data.json differential =="
python tools/http_diff.py --ref "$REF"

echo "== --debug n network-event log differential =="
python tools/netdebug_diff.py --ref "$REF"

echo "== sensitivity parity (16-point SNR table) =="
python tools/snr_sweep.py --ref "$REF"

echo "CAMPAIGN PASSED"
