#!/usr/bin/env python3
"""Capture a decoder's live TCP output streams (raw 30002 + SBS 30003)
byte-for-byte, deterministically, for golden diffing against the reference.

Works for both the reference binary and this framework's CLI: the decoder is
spawned with ``--net --ifile -`` and fed IQ over stdin using a protocol that
removes every timing race the reference has (dump1090.c):

1. **Silence prefix.** The reference only accepts pending TCP clients inside
   ``backgroundTasks`` (dump1090.c:2831-2847), which runs once per decoded
   256 KiB buffer — a client connected at startup is therefore invisible
   until buffer 1 has been decoded, and any message in buffer 1 would be
   broadcast by this framework (immediate asyncio accept) but not by the
   reference.  Feeding one full buffer of 127s (= zero signal, identical to
   the reference's own initial buffer memset, dump1090.c:343) first, then
   pausing, guarantees both decoders see the clients connected before the
   first real sample — and decodes nothing during the window.
2. **Whole-buffer padding.** The reference's EOF handling races the decode
   loop and usually drops the final partial buffer (dump1090.c:496-507 vs
   2968-2990).  Padding the payload with 127s to a whole 256 KiB multiple
   makes the racy buffer pure silence, so the race can't change the output.

SBS output is fully deterministic (no wall-clock fields in
modesSendSBSOutput, dump1090.c:2397-2448), so the captured streams are
stable golden material; they pin tracker + CPR + SBS formatting end-to-end,
which the stdout goldens never exercise.

Usage:
  python tools/net_capture.py --cmd /tmp/refbuild/dump1090 --iq <file> \
      --out-raw golden_net_raw.txt --out-sbs golden_sbs.txt
  python tools/net_capture.py --ours --iq <file> ...
"""

from __future__ import annotations

import argparse
import re
import socket
import subprocess
import sys
import threading
import time
from pathlib import Path

BUF = 256 * 1024  # MODES_DATA_LEN (dump1090.c:54)

# MSG,3 latitude/longitude come from the reference's CPR pair decode, which
# picks the NEWER of the even/odd latches by wall-clock *millisecond*
# timestamps (dump1090.c:2113-2125, mstime :278-287).  At full decode speed
# both latches usually land in the same millisecond and the comparison ties;
# whether a ms boundary happens to fall between them varies run to run — the
# reference's own SBS stream differs across identical invocations on exactly
# these fields (verified 2026-08-17: 5 of 271 lines flipped between two
# back-to-back captures).  Golden comparisons therefore canonicalize the two
# position fields of MSG,3 lines; everything else is byte-exact.
_MSG3_POS = re.compile(
    rb"^(MSG,3,,,[0-9A-F]+,,,,,,,-?\d+,,,)-?[\d.]+,-?[\d.]+(,.*)$")


def canonicalize_sbs(data: bytes) -> bytes:
    lines = data.split(b"\n")
    return b"\n".join(_MSG3_POS.sub(rb"\g<1><pos>\g<2>", ln) for ln in lines)


def free_ports(n: int) -> list[int]:
    socks = []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def capture_streams(cmd: list[str], iq: bytes, raw_port: int, sbs_port: int,
                    timeout: float = 180.0, settle_s: float = 1.0,
                    cwd: str | None = None) -> dict[str, bytes]:
    """Run ``cmd`` (which must listen on the given ports and read IQ from
    stdin until EOF, then exit), return {"raw": ..., "sbs": ...} streams."""
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, cwd=cwd)
    socks: dict[str, socket.socket] = {}
    try:
        for name, port in (("raw", raw_port), ("sbs", sbs_port)):
            deadline = time.monotonic() + 30
            while True:
                try:
                    s = socket.create_connection(("127.0.0.1", port),
                                                 timeout=2)
                    break
                except OSError:
                    if time.monotonic() > deadline or proc.poll() is not None:
                        raise RuntimeError(
                            f"decoder never listened on {name}:{port}")
                    time.sleep(0.05)
            s.settimeout(timeout)
            socks[name] = s

        out: dict[str, bytes] = {}

        def drain(name: str, s: socket.socket) -> None:
            chunks = []
            try:
                while True:
                    b = s.recv(1 << 16)
                    if not b:
                        break
                    chunks.append(b)
            except OSError:
                pass
            out[name] = b"".join(chunks)

        threads = [threading.Thread(target=drain, args=(n, s), daemon=True)
                   for n, s in socks.items()]
        for t in threads:
            t.start()

        # Silence prefix buffer: lets the reference's per-buffer accept run
        # before any decodable sample arrives.
        proc.stdin.write(b"\x7f" * BUF)
        proc.stdin.flush()
        time.sleep(settle_s)
        proc.stdin.write(iq + b"\x7f" * (-len(iq) % BUF))
        proc.stdin.close()
        proc.wait(timeout=timeout)
        for t in threads:
            t.join(timeout=30)
        return out
    finally:
        for s in socks.values():
            try:
                s.close()
            except OSError:
                pass
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def build_cmd(base: list[str], raw_port: int, sbs_port: int,
              ri_port: int, http_port: int) -> list[str]:
    return base + [
        "--ifile", "-", "--net",
        "--net-ro-port", str(raw_port), "--net-sbs-port", str(sbs_port),
        "--net-ri-port", str(ri_port), "--net-http-port", str(http_port),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cmd", help="decoder binary (e.g. the reference)")
    ap.add_argument("--ours", action="store_true",
                    help="capture this framework's CLI (CPU backend)")
    ap.add_argument("--iq", required=True)
    ap.add_argument("--out-raw", required=True)
    ap.add_argument("--out-sbs", required=True)
    args = ap.parse_args()

    if args.ours:
        base = [sys.executable, "-m", "dump1090_tpu", "--tpu-backend", "cpu"]
    elif args.cmd:
        base = [args.cmd]
    else:
        ap.error("need --cmd or --ours")

    iq = Path(args.iq).read_bytes()
    raw_p, sbs_p, ri_p, http_p = free_ports(4)
    streams = capture_streams(build_cmd(base, raw_p, sbs_p, ri_p, http_p),
                              iq, raw_p, sbs_p)
    Path(args.out_raw).write_bytes(streams["raw"])
    Path(args.out_sbs).write_bytes(streams["sbs"])
    nl = b"\n"
    print(f"raw: {len(streams['raw'])} bytes, {streams['raw'].count(nl)} "
          f"lines; sbs: {len(streams['sbs'])} bytes, "
          f"{streams['sbs'].count(nl)} lines")


if __name__ == "__main__":
    main()
