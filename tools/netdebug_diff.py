#!/usr/bin/env python3
"""Differential test for --debug n (network-event logging) vs the reference.

Runs one scripted, deterministic network session against each decoder in
--net-only --debug n mode and byte-diffs the stdout logs after canonicalizing
file-descriptor numbers (the only legitimately process-specific content:
"Created new client %d" / "Closing client %d", dump1090.c:2334,2345).

The session exercises every MODES_DEBUG_NET print site that a healthy run
can reach (dump1090.c:2334-2335, 2345-2346, 2569-2570, 2590-2592,
2638-2639): client accepts on the raw-in/raw-out/HTTP services, a raw relay,
an HTTP keep-alive request for /data.json, a second HTTP/1.0 close request
for the map page (both processes share one scratch CWD so the page bytes —
and therefore the logged reply header's Content-Length — are identical),
and reads-detected client closes.  The "Accept %d: %s" errno print
(dump1090.c:2309) is unreachable without fault injection and is not driven.

Usage: python tools/netdebug_diff.py [--ref /tmp/refbuild/dump1090]
Exit 0 = canonicalized logs byte-identical.
"""

from __future__ import annotations

import argparse
import re
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

FRAME = b"*8f4d2023991093ad287c148accdc;\n"      # good CRC: relays verbatim
SENTINEL = b"*8d4d202358792453ef858bae7fc9;\n"   # good CRC

HTTP_KEEPALIVE = (b"GET /data.json HTTP/1.1\r\nHost: t\r\n"
                  b"User-Agent: netdebug-diff\r\n\r\n")
HTTP_CLOSE = (b"GET / HTTP/1.0\r\nHost: t\r\n"
              b"User-Agent: netdebug-diff\r\n\r\n")

PAGE = b"<html><body>netdebug fixture page</body></html>\n"


def _free_ports(n: int) -> list[int]:
    socks, ports = [], []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def _connect(port: int, proc, timeout: float = 10.0) -> socket.socket:
    deadline = time.monotonic() + timeout
    while True:
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=2)
            s.settimeout(5)
            return s
        except OSError:
            if proc.poll() is not None:
                raise RuntimeError("decoder exited before serving")
            if time.monotonic() > deadline:
                raise
            time.sleep(0.05)


def _recv_until(sock: socket.socket, token: bytes, timeout: float = 10.0) -> bytes:
    buf = b""
    deadline = time.monotonic() + timeout
    while token not in buf:
        if time.monotonic() > deadline:
            raise RuntimeError(f"never received {token!r}; got {buf!r}")
        try:
            b_ = sock.recv(1 << 14)
        except socket.timeout:
            continue
        if not b_:
            raise RuntimeError(f"socket closed waiting for {token!r}")
        buf += b_
    return buf


def run_session(cmd: list[str], cwd: str, env: dict | None = None) -> bytes:
    """One deterministic --debug n session; returns the decoder's stdout."""
    ro, ri, http_p, sbs = _free_ports(4)
    full = cmd + ["--net-only", "--debug", "n",
                  "--net-ro-port", str(ro), "--net-ri-port", str(ri),
                  "--net-http-port", str(http_p), "--net-sbs-port", str(sbs)]
    proc = subprocess.Popen(full, stdin=subprocess.DEVNULL,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, cwd=cwd, env=env)
    try:
        # pacing: the reference's accept/read loop polls every ~100 ms
        # (backgroundTasks + usleep); generous gaps keep event ORDER stable
        gap = 0.4
        out_s = _connect(ro, proc)
        time.sleep(gap)
        in_s = _connect(ri, proc)
        time.sleep(gap)
        in_s.sendall(FRAME)
        _recv_until(out_s, FRAME.strip().upper())
        time.sleep(gap)

        # HTTP: keep-alive /data.json, then a 1.0 close request for the
        # shared CWD page on the SAME connection
        h = _connect(http_p, proc)
        time.sleep(gap)
        h.sendall(HTTP_KEEPALIVE)
        _recv_until(h, b"\r\n\r\n")
        time.sleep(gap)
        h.sendall(HTTP_CLOSE)
        _recv_until(h, PAGE)
        time.sleep(gap)
        h.close()          # already closing server-side (HTTP/1.0)
        time.sleep(gap)

        # raw-input close is read-detected by both decoders
        in_s.close()
        time.sleep(gap)

        # sentinel relay proves the event loop drained everything above
        in2 = _connect(ri, proc)
        time.sleep(gap)
        in2.sendall(SENTINEL)
        _recv_until(out_s, SENTINEL.strip().upper())
        time.sleep(gap)
        in2.close()
        # out_s stays open: the reference only detects a raw-OUT client's
        # death at the next broadcast write, so a read-detected close here
        # would log an event the reference never produces
        time.sleep(2 * gap)
    finally:
        proc.terminate()
        try:
            out, _ = proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
    return out


_CLIENT_RE = re.compile(rb"^(Created new|Closing) client (\d+)$", re.M)


def canonicalize(log: bytes) -> bytes:
    """Map fd numbers to sequential ids by first appearance."""
    ids: dict[bytes, bytes] = {}

    def sub(m: re.Match) -> bytes:
        fd = m.group(2)
        if fd not in ids:
            ids[fd] = b"%d" % len(ids)
        return m.group(1) + b" client " + ids[fd]

    return _CLIENT_RE.sub(sub, log)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/dump1090")
    args = ap.parse_args()
    from refbuild import ensure_reference
    args.ref = ensure_reference(args.ref)

    with tempfile.TemporaryDirectory() as cwd:
        # both decoders serve the SAME page bytes from this CWD, so the
        # logged HTTP reply headers carry identical Content-Lengths
        (Path(cwd) / "gmap.html").write_bytes(PAGE)
        # PYTHONPATH is safe here: it only breaks the tunneled TPU plugin
        # in subprocesses, and this run is pinned to the CPU backend
        import os

        env = dict(os.environ, PYTHONPATH=str(REPO))
        ours = run_session(
            [sys.executable, "-u", "-m", "dump1090_tpu",
             "--tpu-backend", "cpu"], cwd=cwd, env=env)
        ref = run_session(["stdbuf", "-oL", args.ref], cwd=cwd)

    a, b = canonicalize(ours), canonicalize(ref)
    if a != b:
        sys.stdout.write("OURS (canonicalized):\n" + a.decode("latin-1"))
        sys.stdout.write("\nREFERENCE (canonicalized):\n" + b.decode("latin-1"))
        sys.exit("--debug n logs diverged")
    n_events = len(_CLIENT_RE.findall(ours))
    print(f"ok: --debug n logs identical after fd canonicalization "
          f"({n_events} client events, {len(a)} bytes)")


if __name__ == "__main__":
    main()
