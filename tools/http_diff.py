#!/usr/bin/env python3
"""Live /data.json differential: reference binary vs this framework.

Drives a scripted position scenario into BOTH decoders over the raw-input
port and byte-diffs the resulting /data.json (aircraftsToJson,
dump1090.c:2505-2551) — the tracker + CPR global decode + JSON %f
formatting, end-to-end over real sockets.

Tracking only runs when an HTTP request or SBS client has been seen
(useModesMessage gate, dump1090.c:1806), so /data.json is fetched once
BEFORE the messages to arm tracking on both sides.  Even/odd CPR frames
are spaced 60 ms apart so the newer-latch choice (even_cprtime >
odd_cprtime, millisecond clock) is deterministic — unlike full-speed file
decode, which is why the SBS goldens canonicalize MSG,3 but this diff is
exact.

Usage: python tools/http_diff.py [--ref /tmp/refbuild/dump1090]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import fuzz_hex  # noqa: E402


def scenario() -> list[bytes | float]:
    """Messages (hex lines) interleaved with sleeps (seconds)."""
    from dump1090_tpu.utils.synth import make_df17_frame

    def line(frame: bytes) -> bytes:
        return b"*" + frame.hex().encode() + b";\n"

    out: list[bytes | float] = []
    # Aircraft 1: ident, even+odd airborne position, velocity.
    a1 = 0x4D2023
    out.append(line(make_df17_frame(
        addr=a1, metype=4, mesub=0,
        me_payload=bytes([0x04, 0xD1, 0x06, 0x20, 0x82, 0x08]))))  # "ABC123"
    # Airborne position metype 11, alt code 0x530 (Q=1), even then odd.
    # ME bits: [altitude 12][T 1][F 1][lat 17][lon 17]
    def pos(fflag: int, lat17: int, lon17: int) -> bytes:
        # Field layout per the reference extraction (dump1090.c:1262-1272).
        me = bytes([
            0x53,                                               # AC12 hi
            0x00 | (fflag << 2) | ((lat17 >> 15) & 3),          # AC12 lo|T|F
            (lat17 >> 7) & 0xFF,
            ((lat17 & 0x7F) << 1) | ((lon17 >> 16) & 1),
            (lon17 >> 8) & 0xFF,
            lon17 & 0xFF,
        ])
        return make_df17_frame(addr=a1, metype=11, mesub=0, me_payload=me)

    out.append(line(pos(0, 92095, 39846)))
    out.append(0.06)
    out.append(line(pos(1, 88385, 125818)))
    out.append(0.06)
    out.append(line(make_df17_frame(
        addr=a1, metype=19, mesub=1,
        me_payload=bytes([0x01, 0x99, 0x44, 0x22, 0x80, 0x30]))))
    # Aircraft 2: positionless (must be OMITTED from the JSON).
    out.append(line(make_df17_frame(addr=0x111111, metype=4,
                                    me_payload=b"\x04\xd1\x06 \x82\x08")))
    return out


def run_one(cmd: list[str], cwd: str | None = None,
            extra: list[str] | None = None) -> bytes:
    ports = fuzz_hex._free_ports(4)
    ro, ri, http_p, sbs = ports
    full = cmd + ["--net-only", "--net-ro-port", str(ro),
                  "--net-ri-port", str(ri), "--net-http-port", str(http_p),
                  "--net-sbs-port", str(sbs)] + (extra or [])
    proc = subprocess.Popen(full, stdin=subprocess.DEVNULL,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, cwd=cwd)
    try:
        in_s = fuzz_hex._connect(ri, proc)
        url = f"http://127.0.0.1:{http_p}/data.json"
        deadline = time.monotonic() + 20
        while True:  # arm tracking (stat_http_requests > 0) on both sides
            try:
                urllib.request.urlopen(url, timeout=2).read()
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.1)
        for item in scenario():
            if isinstance(item, float):
                time.sleep(item)
            else:
                in_s.sendall(item)
        time.sleep(0.5)
        return urllib.request.urlopen(url, timeout=5).read()
    finally:
        proc.kill()
        proc.wait()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/dump1090")
    args = ap.parse_args()
    from refbuild import ensure_reference
    args.ref = ensure_reference(args.ref)
    for extra in ([], ["--metric"]):
        ref = run_one([args.ref], extra=extra)
        ours = run_one([sys.executable, "-m", "dump1090_tpu",
                        "--tpu-backend", "cpu"], cwd=str(REPO), extra=extra)
        if ref != ours:
            print(f"DIFF ({extra})\nref:  {ref!r}\nours: {ours!r}")
            sys.exit(1)
        assert ref.count(b'"hex"') == 1, ref  # positionless aircraft omitted
        assert b'"lat":0' not in ref
        print(f"ok: /data.json identical with {extra or 'defaults'} ({ref!r})")


if __name__ == "__main__":
    main()
