#!/usr/bin/env python3
"""Build (once) and locate the reference dump1090 binary for the diff tools.

Every differential tool (fuzz_diff, fuzz_hex, sweep_hex, http_diff,
netdebug_diff, snr_sweep, soak_device) compares against the reference binary
built out-of-tree from /root/reference with a stubbed librtlsdr — the --ifile
path never touches the device (dump1090.c:2947-2954), so the stub only has to
satisfy the linker.  Historically the build recipe lived in campaign.sh and
the tools crashed with a raw FileNotFoundError when run standalone; this
module makes each entry point self-sufficient:

    from refbuild import ensure_reference
    ref = ensure_reference(args.ref)   # builds /tmp/refbuild/dump1090 if absent

Run directly, it prints the binary path:  REF=$(python tools/refbuild.py)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

DEFAULT_BIN = "/tmp/refbuild/dump1090"
REF_SRC = os.environ.get("DUMP1090_REF_SRC", "/root/reference")

# Minimal librtlsdr stub: declarations dump1090.c uses, all inert (the file
# path never calls them; modesInitRTLSDR only runs without --ifile).
RTLSDR_STUB = """\
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
"""


def ensure_reference(path: str | None = None, quiet: bool = False) -> str:
    """Return the path to an executable reference binary, building it if
    missing.  Exits with a one-line instruction if the build is impossible
    (reference source not mounted, or no C compiler)."""
    path = path or DEFAULT_BIN
    if os.access(path, os.X_OK):
        return path
    src = os.path.join(REF_SRC, "dump1090.c")
    if not os.path.exists(src):
        sys.exit(
            f"reference binary missing at {path} and source not found at "
            f"{src} — mount the reference repo (or set DUMP1090_REF_SRC) "
            f"and re-run, or pass --ref <path-to-built-dump1090>"
        )
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        sys.exit(
            f"reference binary missing at {path} and no C compiler on PATH — "
            f"build it elsewhere with tools/make_goldens.sh's recipe and "
            f"pass --ref <path>"
        )
    if not quiet:
        print(
            f"refbuild: building reference binary {path} from {REF_SRC} "
            f"(stub librtlsdr, {os.path.basename(gcc)} -O2)",
            file=sys.stderr, flush=True,
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with tempfile.TemporaryDirectory() as build:
        with open(os.path.join(build, "rtl-sdr.h"), "w") as f:
            f.write(RTLSDR_STUB)
        for name in ("dump1090.c", "anet.c", "anet.h"):
            shutil.copy(os.path.join(REF_SRC, name), build)
        tmp_bin = os.path.join(build, "dump1090")
        r = subprocess.run(
            [gcc, "-O2", "-I", build,
             os.path.join(build, "dump1090.c"), os.path.join(build, "anet.c"),
             "-o", tmp_bin, "-lpthread", "-lm"],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            sys.exit(f"refbuild: reference build failed:\n{r.stderr}")
        # atomic move so a concurrent tool never sees a half-written binary
        staged = path + f".tmp.{os.getpid()}"
        shutil.move(tmp_bin, staged)
        os.replace(staged, path)
    return path


if __name__ == "__main__":
    print(ensure_reference(sys.argv[1] if len(sys.argv) > 1 else None))
