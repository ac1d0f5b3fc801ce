#!/bin/sh
# Regenerate tests/golden/golden_cpr.txt: a bit-exact differential table of
# the reference's CPR decoders over deterministic fuzz vectors.
#
# A C harness #includes the reference source (out-of-tree, stub librtlsdr —
# the make_goldens.sh pattern) and evaluates decodeCPR (airborne global,
# dump1090.c:1952) and decodeCPRSurface (surface local, :2004) on vectors a
# Python generator emits: realistic encoded positions, raw 17-bit randoms,
# NL-threshold straddles, pole/negative/zone-boundary edges.  Results are
# recorded as IEEE-754 bit patterns so tests/test_cpr.py can assert our
# models/cpr.py matches the C doubles EXACTLY, not within a tolerance.
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

cat > "$BUILD/cpr_harness.c" <<'EOF'
/* Evaluate the reference CPR decoders on stdin vectors.
 *   A <even_lat> <even_lon> <odd_lat> <odd_lon> <use_even>
 *   S <ref_lat_hexfloat> <ref_lon_hexfloat> <fflag> <raw_lat> <raw_lon>
 * Output: the input line, " -> ", then "NONE" or "<latbits> <lonbits>"
 * (IEEE-754 doubles as 16-digit hex).  NaN sentinels detect the decoders'
 * early returns (they leave a->lat/lon untouched). */
#define main dump1090_main
#include "dump1090.c"
#undef main

#include <inttypes.h>

static void print_result(double lat, double lon) {
    if (isnan(lat) || isnan(lon)) {
        printf("NONE\n");
    } else {
        uint64_t bl, bg;
        memcpy(&bl, &lat, 8);
        memcpy(&bg, &lon, 8);
        printf("%016" PRIx64 " %016" PRIx64 "\n", bl, bg);
    }
}

int main(void) {
    char kind[8];
    while (scanf("%7s", kind) == 1) {
        struct aircraft a;
        memset(&a, 0, sizeof(a));
        a.lat = a.lon = NAN;
        if (kind[0] == 'A') {
            int el, eg, ol, og, use_even;
            if (scanf("%d %d %d %d %d", &el, &eg, &ol, &og, &use_even) != 5)
                return 1;
            a.even_cprlat = el; a.even_cprlon = eg;
            a.odd_cprlat = ol;  a.odd_cprlon = og;
            a.even_cprtime = use_even ? 2 : 1;
            a.odd_cprtime  = use_even ? 1 : 2;
            decodeCPR(&a);
            printf("A %d %d %d %d %d -> ", el, eg, ol, og, use_even);
            print_result(a.lat, a.lon);
        } else if (kind[0] == 'S') {
            char rlat[64], rlon[64];
            int fflag, raw_lat, raw_lon;
            if (scanf("%63s %63s %d %d %d",
                      rlat, rlon, &fflag, &raw_lat, &raw_lon) != 5)
                return 1;
            Modes.ref_lat = strtod(rlat, NULL);
            Modes.ref_lon = strtod(rlon, NULL);
            Modes.ref_count = 1;
            decodeCPRSurface(&a, fflag, raw_lat, raw_lon);
            printf("S %s %s %d %d %d -> ", rlat, rlon, fflag,
                   raw_lat, raw_lon);
            print_result(a.lat, a.lon);
        } else {
            return 1;
        }
    }
    return 0;
}
EOF
gcc -O2 -I"$BUILD" "$BUILD/cpr_harness.c" "$BUILD/anet.c" \
    -o "$BUILD/cpr_harness" -lpthread -lm

python3 tools/gen_cpr_vectors.py > "$BUILD/vectors.txt"
"$BUILD/cpr_harness" < "$BUILD/vectors.txt" > "$OUT/golden_cpr.txt"
wc -l "$OUT/golden_cpr.txt"
echo "golden_cpr.txt written to $OUT"
