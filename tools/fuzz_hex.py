#!/usr/bin/env python3
"""Differential fuzzing of the hex raw-input path (port 30001 → 30002 relay).

Spawns the reference binary and this framework's CLI in ``--net-only`` mode,
feeds BOTH the same randomized byte stream on the raw-input port, and
byte-diffs the raw-output relay streams.  Covers the grammar of
decodeHexMessage (dump1090.c:2472-2502) — framing, whitespace trim, hex
case, length/parity rejects, NUL-truncation — the 1 KiB client-buffer reset
(dump1090.c:2708-2714), the CRC fix path, the ICAO-cache / bruteForceAP
acceptance chain for DF0/4/5/20/21, and the DF11-IID rule, under sequences
where cache state chains across lines.

Grammar restriction for determinism: the reference decodes hex payloads
SHORTER than the DF-implied message length by reading uninitialized stack
bytes (decodeHexMessage fills only l/2 bytes of a 14-byte stack buffer and
decodeModesMessage reads to the DF length — dump1090.c:2475, 2493-2499).
Recipes therefore always supply >= the DF-implied byte count; behavior on
shorter-than-DF payloads is undefined in the reference, not a contract.

Usage: python tools/fuzz_hex.py [--ref /tmp/refbuild/dump1090] [--n 400]
                                [--seed 0] [--rounds 3]
"""

from __future__ import annotations

import argparse
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

SENTINEL = b"*8f4d2023991093ad087c133060d1;"  # clean DF17 from the golden set
SENTINEL_OUT = b"*" + SENTINEL[1:-1].upper() + b";"


def _crc(msg: bytes, bits: int) -> int:
    from dump1090_tpu.ops.crc import compute_crc

    return compute_crc(np.frombuffer(msg, dtype=np.uint8), bits)


def make_df17(rng: np.random.Generator, addr: int | None = None) -> bytes:
    from dump1090_tpu.utils.synth import make_df17_frame

    return make_df17_frame(
        addr=int(rng.integers(1, 1 << 24)) if addr is None else addr,
        metype=int(rng.integers(1, 23)),
        mesub=int(rng.integers(0, 8)),
        me_payload=rng.integers(0, 256, 6, dtype=np.uint8).tobytes(),
    )


def make_short_ap(rng: np.random.Generator, addr: int, df: int) -> bytes:
    """A 7-byte DF0/4/5/24 frame whose Address/Parity field targets ``addr`` —
    accepted iff addr is in the ICAO cache (bruteForceAP, dump1090.c:942)."""
    head = bytes([df << 3]) + rng.integers(0, 256, 3, dtype=np.uint8).tobytes()
    crc = _crc(head + b"\x00\x00\x00", 56)
    ap = crc ^ addr
    return head + bytes([(ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF])


def make_long_ap(rng: np.random.Generator, addr: int, df: int) -> bytes:
    """A 14-byte DF16/20/21 frame AP-keyed to ``addr`` (long bruteForceAP
    branch, dump1090.c:955-960); carries a random MB field."""
    head = (bytes([df << 3])
            + rng.integers(0, 256, 10, dtype=np.uint8).tobytes())
    crc = _crc(head + b"\x00\x00\x00", 112)
    ap = crc ^ addr
    return head + bytes([(ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF])


def hexline(frame: bytes, rng: np.random.Generator) -> bytes:
    h = frame.hex()
    style = rng.integers(0, 4)
    if style == 1:
        h = h.upper()
    elif style == 2:
        h = "".join(c.upper() if rng.integers(0, 2) else c for c in h)
    pre = bytes(rng.choice([32, 9, 13], size=int(rng.integers(0, 3))).astype(np.uint8))
    post = bytes(rng.choice([32, 9, 13], size=int(rng.integers(0, 3))).astype(np.uint8))
    return pre + b"*" + h.encode() + b";" + post + b"\n"


def gen_stream(rng: np.random.Generator, n: int) -> bytes:
    """A byte stream of n 'lines' mixing valid, fixable, and garbage input."""
    out = []
    cached: list[int] = []
    for _ in range(n):
        r = int(rng.integers(0, 100))
        if r < 30:  # clean DF17 (enters ICAO cache)
            f = make_df17(rng)
            cached.append(int.from_bytes(f[1:4], "big"))
            out.append(hexline(f, rng))
        elif r < 45:  # DF17 with 1-2 bit flips (fix path; not cached by ref)
            f = bytearray(make_df17(rng))
            for _ in range(int(rng.integers(1, 3))):
                b = int(rng.integers(5, 112))
                f[b // 8] ^= 0x80 >> (b % 8)
            out.append(hexline(bytes(f), rng))
        elif r < 60 and cached:  # AP-keyed frame targeting a cached address
            addr = cached[int(rng.integers(0, len(cached)))]
            if rng.integers(0, 3):  # short DF0/4/5/24 (DF24 = Comm-C ELM,
                # 56 bits per modesMessageLenByType, dump1090.c:746-753)
                df = int(rng.choice([0, 4, 5, 24]))
                out.append(hexline(make_short_ap(rng, addr, df), rng))
            else:  # long DF16/20/21 (air-air + Comm-B bruteForceAP branch)
                df = int(rng.choice([16, 20, 21]))
                out.append(hexline(make_long_ap(rng, addr, df), rng))
        elif r < 68:  # short frame AP-keyed to an UNcached address (reject)
            out.append(hexline(make_short_ap(
                rng, int(rng.integers(1, 1 << 24)), 4), rng))
        elif r < 74:  # random full-length hex (random DF, usually bad CRC)
            nb = 14 if rng.integers(0, 2) else 7
            raw = bytearray(rng.integers(0, 256, nb, dtype=np.uint8).tobytes())
            if nb == 7:  # force a short DF so no uninit read in the ref
                raw[0] = (int(rng.choice([0, 4, 5, 11])) << 3) | (raw[0] & 7)
            out.append(hexline(bytes(raw), rng))
        elif r < 80:  # grammar rejects: bad framing / odd length / bad chars
            k = int(rng.integers(0, 5))
            if k == 0:
                out.append(b"*8d4d2023991093ad087c133060d\n")     # no ';'
            elif k == 1:
                out.append(b"8d4d2023991093ad087c133060d1;\n")    # no '*'
            elif k == 2:
                out.append(b"*8d4d2023991093ad087c133060d;\n")    # odd length
            elif k == 3:
                out.append(b"*8d4d2023991093ad087c133060dg;\n")   # bad hex
            else:
                out.append(b"*" + b"ab" * 15 + b";\n")            # >28 chars
        elif r < 86:  # embedded NUL: poisons strstr framing until the
            #           1 KiB reset — the message is NOT decoded and later
            #           lines are swallowed until 1024 bytes accumulate
            f = make_df17(rng)
            tail = bytes(rng.integers(32, 127, int(rng.integers(1, 8)),
                                      dtype=np.uint8).tolist())
            out.append(b"*" + f.hex().encode() + b";\x00" + tail + b"\n")
        elif r < 94:  # unterminated junk (1 KiB buffer-reset differential)
            jl = int(rng.integers(1, 3000))
            junk = bytes(rng.choice(
                list(b"ZXYWV@#$%^&()qwerty"), size=jl).astype(np.uint8))
            if rng.integers(0, 2):  # sometimes junk||valid on one line
                out.append(junk + hexline(make_df17(rng), rng))
            else:
                out.append(junk + b"\n")
        else:  # empty-ish lines
            out.append(bytes(rng.choice([32, 9, 13], size=int(
                rng.integers(0, 4))).astype(np.uint8)) + b"\n")
    return b"".join(out)


def run_decoder(cmd: list[str], stream: bytes, cwd: str | None = None,
                timeout: float = 120.0) -> tuple[bytes, bytes, bytes]:
    """Spawn a --net-only decoder, relay `stream` + sentinel, return the
    (raw 30002, SBS 30003, verbose stdout) output streams.

    stdout is the displayModesMessage text for every accepted message —
    line-buffered (stdbuf -oL / python -u) so the buffered tail isn't lost
    when the process is killed after the sentinel relays."""
    for attempt in range(3):
        ports = _free_ports(4)
        ro, ri, http_p, sbs = ports
        full = cmd + ["--net-only", "--net-ro-port", str(ro),
                      "--net-ri-port", str(ri), "--net-http-port",
                      str(http_p), "--net-sbs-port", str(sbs)]
        proc = subprocess.Popen(full, stdin=subprocess.DEVNULL,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, cwd=cwd)
        try:
            out_s = _connect(ro, proc)
            sbs_s = _connect(sbs, proc)
            in_s = _connect(ri, proc)
            time.sleep(0.2)
            # Drain the outputs CONCURRENTLY with feeding input: both
            # decoders drop (reference) or bound-then-drop (ours) a client
            # whose output socket stalls, so a send-then-read harness
            # loses data.
            import threading

            chunks: list[bytes] = []
            sbs_chunks: list[bytes] = []
            std_chunks: list[bytes] = []
            done = threading.Event()
            out_s.settimeout(None)  # _connect leaves a 2 s connect timeout
            sbs_s.settimeout(None)

            def drain(sock, sink, signal=None) -> None:
                try:
                    while True:
                        b_ = sock.recv(1 << 16)
                        if not b_:
                            break
                        sink.append(b_)
                except OSError:
                    pass
                finally:
                    if signal is not None:
                        signal.set()

            def drain_pipe(pipe, sink) -> None:
                try:
                    while True:
                        b_ = pipe.read1(1 << 16)  # read() would block to EOF
                        if not b_:
                            break
                        sink.append(b_)
                except OSError:
                    pass

            threading.Thread(target=drain, args=(out_s, chunks, done),
                             daemon=True).start()
            threading.Thread(target=drain, args=(sbs_s, sbs_chunks),
                             daemon=True).start()
            threading.Thread(target=drain_pipe, args=(proc.stdout, std_chunks),
                             daemon=True).start()
            in_s.sendall(stream)
            # 2 KiB whitespace pad: forces >=1 full-buffer reset so a
            # NUL-poisoned pending buffer (see gen_stream) is flushed and
            # the sentinel is guaranteed to frame on both decoders.
            in_s.sendall(b"\n" + b" " * 2048 + b"\n" + SENTINEL + b"\n")
            deadline = time.monotonic() + timeout
            while SENTINEL_OUT not in b"".join(chunks):
                if time.monotonic() > deadline:
                    raise RuntimeError("sentinel never relayed")
                if done.is_set():
                    raise RuntimeError("relay closed early")
                time.sleep(0.05)
            time.sleep(0.4)  # settle any queued trailing output
            return b"".join(chunks), b"".join(sbs_chunks), b"".join(std_chunks)
        except RuntimeError:
            if attempt == 2:
                raise
        finally:
            proc.kill()
            proc.wait()
    raise AssertionError("unreachable")


def _free_ports(n: int) -> list[int]:
    socks = []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def _connect(port: int, proc) -> socket.socket:
    deadline = time.monotonic() + 20
    while True:
        try:
            return socket.create_connection(("127.0.0.1", port), timeout=2)
        except OSError:
            if time.monotonic() > deadline or proc.poll() is not None:
                raise RuntimeError(f"decoder not listening on {port}")
            time.sleep(0.05)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/dump1090")
    ap.add_argument("--n", type=int, default=400, help="lines per round")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--mode", default="default",
                    choices=["default", "aggressive", "no-fix"],
                    help="CRC-fix policy passed to BOTH decoders")
    args = ap.parse_args()
    from refbuild import ensure_reference
    args.ref = ensure_reference(args.ref)

    mode_flags = {"default": [], "aggressive": ["--aggressive"],
                  "no-fix": ["--no-fix"]}[args.mode]
    ref_cmd = ["stdbuf", "-oL", args.ref] + mode_flags
    ours_cmd = ([sys.executable, "-u", "-m", "dump1090_tpu",
                 "--tpu-backend", "cpu"] + mode_flags)
    from net_capture import canonicalize_sbs  # MSG,3 CPR latch is racy

    fails = 0
    for k in range(args.rounds):
        rng = np.random.default_rng(args.seed + k)
        stream = gen_stream(rng, args.n)
        ref, ref_sbs, ref_std = run_decoder(ref_cmd, stream)
        ours, ours_sbs, ours_std = run_decoder(ours_cmd, stream,
                                               cwd=str(REPO))
        diffs = [name for name, a, b in (
            ("raw", ref, ours),
            ("sbs", canonicalize_sbs(ref_sbs), canonicalize_sbs(ours_sbs)),
            ("stdout", ref_std, ours_std),
        ) if a != b]
        if diffs:
            fails += 1
            for tag, data in (("bin", stream), ("ref", ref), ("ours", ours),
                              ("ref_sbs", ref_sbs), ("ours_sbs", ours_sbs),
                              ("ref_std", ref_std), ("ours_std", ours_std)):
                Path(f"/tmp/fuzz_hex_fail_{args.seed + k}.{tag}"
                     ).write_bytes(data)
            which = diffs[0]
            rl, ol = {"raw": (ref, ours), "sbs": (ref_sbs, ours_sbs),
                      "stdout": (ref_std, ours_std)}[which]
            rl, ol = rl.split(b"\n"), ol.split(b"\n")
            for i, (a, b) in enumerate(zip(rl, ol)):
                if a != b:
                    print(f"[{k}] FIRST {which} DIFF line {i}: "
                          f"ref={a!r} ours={b!r}")
                    break
            else:
                print(f"[{k}] {which} length diff: ref={len(rl)} "
                      f"ours={len(ol)}")
            print(f"[{k}] FAIL on {diffs} (saved to /tmp/fuzz_hex_fail_*)")
        else:
            print(f"[{k}] ok ({ref.count(b';')} relayed, "
                  f"{ref_sbs.count(b'MSG')} sbs, "
                  f"{ref_std.count(b'CRC')} displayed)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
