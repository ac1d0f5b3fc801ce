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

if [ ! -x "$REF" ]; then
    echo "== building reference binary =="
    mkdir -p "$(dirname "$REF")"
    BUILD=$(mktemp -d)
    # same stub-librtlsdr build recipe as tools/make_goldens.sh
    (
        cat > "$BUILD/rtl-sdr.h" <<'EOF'
#include <stdint.h>
typedef struct rtlsdr_dev rtlsdr_dev_t;
typedef void (*rtlsdr_read_async_cb_t)(unsigned char *buf, uint32_t len, void *ctx);
static inline uint32_t rtlsdr_get_device_count(void) { return 0; }
static inline int rtlsdr_get_device_usb_strings(uint32_t i, char *v, char *p, char *s) { (void)i;(void)v;(void)p;(void)s; return -1; }
static inline int rtlsdr_open(rtlsdr_dev_t **dev, uint32_t index) { (void)dev;(void)index; return -1; }
static inline int rtlsdr_close(rtlsdr_dev_t *dev) { (void)dev; return 0; }
static inline int rtlsdr_set_tuner_gain_mode(rtlsdr_dev_t *d, int m) { (void)d;(void)m; return 0; }
static inline int rtlsdr_set_tuner_gain(rtlsdr_dev_t *d, int g) { (void)d;(void)g; return 0; }
static inline int rtlsdr_get_tuner_gain(rtlsdr_dev_t *d) { (void)d; return 0; }
static inline int rtlsdr_get_tuner_gains(rtlsdr_dev_t *d, int *g) { (void)d; if(g) g[0]=0; return 1; }
static inline int rtlsdr_set_freq_correction(rtlsdr_dev_t *d, int p) { (void)d;(void)p; return 0; }
static inline int rtlsdr_set_agc_mode(rtlsdr_dev_t *d, int o) { (void)d;(void)o; return 0; }
static inline int rtlsdr_set_center_freq(rtlsdr_dev_t *d, uint32_t f) { (void)d;(void)f; return 0; }
static inline int rtlsdr_set_sample_rate(rtlsdr_dev_t *d, uint32_t r) { (void)d;(void)r; return 0; }
static inline int rtlsdr_reset_buffer(rtlsdr_dev_t *d) { (void)d; return 0; }
static inline int rtlsdr_read_async(rtlsdr_dev_t *d, rtlsdr_read_async_cb_t cb, void *ctx, uint32_t n, uint32_t len) { (void)d;(void)cb;(void)ctx;(void)n;(void)len; return 0; }
EOF
        cp /root/reference/dump1090.c /root/reference/anet.c \
           /root/reference/anet.h "$BUILD/"
        gcc -O2 -I"$BUILD" "$BUILD/dump1090.c" "$BUILD/anet.c" \
            -o "$REF" -lpthread -lm
    )
    rm -rf "$BUILD"
fi

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
