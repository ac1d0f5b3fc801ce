#!/bin/sh
# Regenerate the golden fixtures in tests/golden/ from the reference binary.
#
# The reference (antirez/dump1090, mounted read-only at /root/reference) is
# built out-of-tree with a stubbed librtlsdr (the --ifile path never touches
# the device, see dump1090.c:2947-2954), then run on testfiles/modes1.bin in
# every output mode we lock behavior against.
set -e
REF=${REF:-/root/reference}
OUT=$(cd "$(dirname "$0")/../tests/golden" && pwd)
BUILD=$(mktemp -d)
trap 'rm -rf "$BUILD"' EXIT

cat > "$BUILD/rtl-sdr.h" <<'EOF'
#ifndef RTL_SDR_STUB_H
#define RTL_SDR_STUB_H
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
#endif
EOF

cp "$REF/dump1090.c" "$REF/anet.c" "$REF/anet.h" "$BUILD/"
gcc -O2 -I"$BUILD" "$BUILD/dump1090.c" "$BUILD/anet.c" -o "$BUILD/dump1090" -lpthread -lm

FIX="$REF/testfiles/modes1.bin"
"$BUILD/dump1090" --ifile "$FIX" --raw                > "$OUT/golden_raw.txt"
"$BUILD/dump1090" --ifile "$FIX" --stats              > "$OUT/golden_stats.txt"
"$BUILD/dump1090" --ifile "$FIX" --onlyaddr           > "$OUT/golden_onlyaddr.txt"
"$BUILD/dump1090" --ifile "$FIX" --raw --no-fix       > "$OUT/golden_raw_nofix.txt"
"$BUILD/dump1090" --ifile "$FIX" --raw --aggressive   > "$OUT/golden_raw_aggressive.txt"
"$BUILD/dump1090" --ifile "$FIX" --raw --no-crc-check > "$OUT/golden_raw_nocrccheck.txt"
"$BUILD/dump1090" --ifile "$FIX"                      > "$OUT/golden_verbose.txt"
"$BUILD/dump1090" --ifile "$FIX" --debug c            > "$OUT/golden_debug_c.txt"
"$BUILD/dump1090" --ifile "$FIX" --debug d            > "$OUT/golden_debug_d.txt"
# synthetic fixture for the --debug p (rejected preamble) dump path: one
# clean DF17 frame + a small noise blob (kept tiny; real captures produce
# gigabytes of reject dumps)
python3 - "$OUT" <<'PYEOF'
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from dump1090_tpu.utils.synth import make_df17_frame, frame_to_iq
stream = np.full(60000, 127, dtype=np.uint8)
iq = frame_to_iq(make_df17_frame(addr=0x4D2023, metype=4), amplitude=90.0,
                 pad_before=0, pad_after=0)
stream[10000:10000 + len(iq)] = iq
rng = np.random.default_rng(7)
stream[30000:30060] = (127 + rng.normal(0, 30, 60)).clip(0, 255).astype(np.uint8)
stream.tofile(sys.argv[1] + "/debug_p_input.bin")
PYEOF
"$BUILD/dump1090" --ifile "$OUT/debug_p_input.bin" --debug p > "$OUT/golden_debug_p.txt"
# D (every zero-error demod) and C (good CRC) on the same small synthetic
# capture: on the full fixture those dumps run 4 MB / 2 MB
"$BUILD/dump1090" --ifile "$OUT/debug_p_input.bin" --debug D > "$OUT/golden_debug_D_synth.txt"
"$BUILD/dump1090" --ifile "$OUT/debug_p_input.bin" --debug C > "$OUT/golden_debug_C_synth.txt"
(cd "$BUILD" && rm -f frames.js && ./dump1090 --ifile "$FIX" --debug Dj > /dev/null \
  && cp frames.js "$OUT/golden_frames_Dj.js")
# Live-socket goldens: raw (30002) and SBS (30003) streams from a --net run
# fed over stdin.  Captured twice; the raw stream must be byte-identical and
# the SBS stream identical after MSG,3 position canonicalization (the
# reference's CPR newer-latch choice is wall-clock racy — see
# tools/net_capture.py).
python3 tools/net_capture.py --cmd "$BUILD/dump1090" --iq "$FIX" \
  --out-raw "$OUT/golden_net_raw.txt" --out-sbs "$OUT/golden_sbs.txt"
python3 tools/net_capture.py --cmd "$BUILD/dump1090" --iq "$FIX" \
  --out-raw /tmp/net_raw_check.txt --out-sbs /tmp/sbs_check.txt
cmp "$OUT/golden_net_raw.txt" /tmp/net_raw_check.txt
python3 - "$OUT" <<'PYEOF'
import sys
sys.path.insert(0, "/root/repo/tools")
from pathlib import Path
from net_capture import canonicalize_sbs
a = canonicalize_sbs(Path(sys.argv[1] + "/golden_sbs.txt").read_bytes())
b = canonicalize_sbs(Path("/tmp/sbs_check.txt").read_bytes())
assert a == b, "SBS capture not stable after canonicalization"
PYEOF
echo "goldens written to $OUT"
