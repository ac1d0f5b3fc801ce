#!/usr/bin/env python3
"""Soak test: a large concatenated capture through the on-device resolver
vs the reference binary, byte for byte.

Validates cross-batch ICAO-cache chaining and overflow behavior at scale on
whatever backend is active (run on the real chip for the hardware Pallas
kernel, or with JAX_PLATFORMS=cpu for the XLA scan backend).

Usage: python tools/soak_device.py [--reps 60] [--ref /tmp/refbuild/dump1090]

Wall-clock mode (round 4): `--wall-minutes 30` streams a deterministic
dense/quiet traffic pattern through the REAL-clock device pipeline for the
requested duration — crossing ICAO-cache TTL horizons (60 s) and candidate
adapt-down/sticky-growth cycles under live time — while recording the `now`
value of every dispatch and the per-group dispatch/fetch wall times (the
D2H "mood" regime detector).  A CPU-oracle subprocess then replays the
IDENTICAL byte stream through the XLA-twin resolver with the RECORDED clock
sequence and the raw streams + all 8 counters are diffed byte-for-byte.
"""

import argparse
import io
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FIXTURE = "/root/reference/testfiles/modes1.bin"


class PatternSource:
    """Deterministic looping IQ byte stream: `dense` repetitions of the
    fixture followed by `quiet` buffer-lengths of dead air (127s), repeated.
    Byte content is a pure function of the stream offset, so a second
    instance with the same total_bytes replays the identical stream.  A
    rate cap (bytes/s) paces reads so a soak spans real wall time."""

    def __init__(self, total_bytes=None, rate_bytes_s=None,
                 deadline_s=None, dense_reps=4, quiet_bufs=48):
        raw = np.fromfile(FIXTURE, dtype=np.uint8)
        quiet = np.full(quiet_bufs * 262144, 127, dtype=np.uint8)
        self.period = np.concatenate([np.tile(raw, dense_reps), quiet])
        self.total = total_bytes  # None = unbounded until deadline
        self.rate = rate_bytes_s
        self.deadline_s = deadline_s
        self.deadline = None  # set at FIRST read: compile / syndrome-table
        self.pos = 0          # build time must not eat the soak window
        self._t0 = None

    def seekable(self):
        return False

    def read(self, n: int) -> bytes:
        if self._t0 is None:
            self._t0 = time.monotonic()
            if self.deadline_s:
                self.deadline = self._t0 + self.deadline_s
        if self.total is not None:
            n = min(n, self.total - self.pos)
        if n <= 0:
            return b""
        if self.deadline is not None and time.monotonic() >= self.deadline:
            return b""
        if self.rate:
            ahead = (self.pos / self.rate) - (time.monotonic() - self._t0)
            if ahead > 0:
                time.sleep(ahead)
        p = self.pos % len(self.period)
        chunk = self.period[p : p + n]
        if len(chunk) < n:  # wrap
            chunk = np.concatenate(
                [chunk, self.period[: n - len(chunk)]])
        self.pos += n
        return chunk.tobytes()


def _run_device_pass(spec: dict, clocks_out: list, paced: bool):
    """Decode the pattern stream through stream_raw_device, recording every
    dispatch's clock value and per-yield wall times.  Returns (raw bytes,
    stats tuple, bytes consumed, yield timing list)."""
    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    if spec.get("clocks") is not None:
        it = iter(spec["clocks"])
        clock = lambda: next(it)
    else:
        def clock():
            v = int(time.time())
            clocks_out.append(v)
            return v

    src = PatternSource(
        total_bytes=spec.get("total_bytes"),
        rate_bytes_s=spec["rate"] if paced else None,
        deadline_s=spec.get("deadline_s") if paced else None,
        dense_reps=spec["dense_reps"], quiet_bufs=spec["quiet_bufs"],
    )
    cfg = PipelineConfig(batch_buffers=spec["batch"],
                         dispatch_groups=spec["groups"])
    p = DemodPipeline(cfg, clock=clock)
    out = []
    yields = []  # (t_monotonic, n_bytes) per fetched batch
    for chunk in p.stream_raw_device(src):
        out.append(chunk)
        yields.append((time.monotonic(), len(chunk)))
    stats = (p.stats.valid_preamble, p.stats.out_of_phase,
             p.stats.demodulated, p.stats.goodcrc, p.stats.badcrc,
             p.stats.fixed, p.stats.single_bit_fix, p.stats.two_bits_fix)
    return b"".join(out), stats, src.pos, yields


def soak_wall(args) -> int:
    """Wall-clock soak: device decode under live time for --wall-minutes,
    then a CPU-oracle replay of the identical stream + clock sequence."""
    spec = {
        "batch": args.batch, "groups": args.groups,
        "dense_reps": 4, "quiet_bufs": 48,
        # pace so the run spans the requested wall time with plenty of TTL
        # horizons: ~32 MB/s keeps the device mostly busy through the
        # tunnel while quiet stretches let density adaptation shrink shapes
        "rate": args.rate_mb_s * 1e6,
        "deadline_s": args.wall_minutes * 60,
    }
    clocks: list = []
    t0 = time.monotonic()
    raw_dev, stats_dev, nbytes, yields = _run_device_pass(
        spec, clocks, paced=True)
    wall = time.monotonic() - t0
    n_groups = len(clocks)
    print(f"device pass: {wall/60:.1f} min, {nbytes/1e6:.0f} MB "
          f"({nbytes//2/1e6:.0f} M samples), {n_groups} dispatches, "
          f"{len(raw_dev.splitlines())} messages, clock span "
          f"{clocks[-1]-clocks[0]}s ({(clocks[-1]-clocks[0])//60} TTL "
          f"horizons of 60s)", file=sys.stderr)

    # regime shifts: inter-yield gaps way above the running median mark
    # link-mood changes (the round-3 D2H collapse was found by accident)
    gaps = [b[0] - a[0] for a, b in zip(yields, yields[1:])]
    if gaps:
        med = sorted(gaps)[len(gaps) // 2]
        shifts = [(i, g) for i, g in enumerate(gaps) if g > max(4 * med, 1.0)]
        print(f"yield gaps: median {med*1e3:.0f} ms, max {max(gaps)*1e3:.0f} "
              f"ms, {len(shifts)} regime-shift candidates "
              f"(>{max(4*med,1.0)*1e3:.0f} ms): "
              f"{[(i, round(g,2)) for i, g in shifts[:8]]}", file=sys.stderr)

    # oracle replay in a subprocess (the axon TPU plugin does not register
    # in children, so JAX_PLATFORMS=cpu works there — CLAUDE.md)
    oracle_spec = dict(spec, total_bytes=nbytes, clocks=clocks)
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as sf:
        json.dump(oracle_spec, sf)
        spec_path = sf.name
    out_path = spec_path + ".out"
    try:
        t0 = time.monotonic()
        r = subprocess.run(
            [sys.executable, __file__, "--oracle-spec", spec_path,
             "--oracle-out", out_path],
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
            capture_output=True, text=True, timeout=7200,
        )
        if r.returncode != 0:
            print(f"oracle subprocess failed:\n{r.stderr[-2000:]}")
            return 1
        print(f"oracle pass (CPU XLA twin, replayed clocks): "
              f"{(time.monotonic()-t0)/60:.1f} min", file=sys.stderr)
        with open(out_path, "rb") as f:
            stats_line = f.readline()
            raw_or = f.read()
        stats_or = tuple(json.loads(stats_line))
    finally:
        os.unlink(spec_path)
        if os.path.exists(out_path):
            os.unlink(out_path)

    ok = True
    if not raw_dev or nbytes == 0:
        print("SOAK FAIL: vacuous run (no bytes decoded / no messages)")
        ok = False
    if stats_or != stats_dev:
        print(f"SOAK FAIL: counters diverged dev={stats_dev} oracle={stats_or}")
        ok = False
    if raw_or != raw_dev:
        a, b = raw_dev.splitlines(), raw_or.splitlines()
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"SOAK FAIL at line {i}: dev {x!r} oracle {y!r}")
                break
        print(f"SOAK FAIL: dev {len(a)} oracle {len(b)} lines")
        ok = False
    if ok:
        print(f"WALL SOAK PASS: {wall/60:.1f} min, {n_groups} dispatches, "
              f"{nbytes/1e6:.0f} MB, {len(raw_dev.splitlines())} messages, "
              f"{(clocks[-1]-clocks[0])//60} TTL horizons crossed, "
              f"stream + 8 counters identical to the CPU oracle replay")
    return 0 if ok else 1


def oracle_main(spec_path: str, out_path: str) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    with open(spec_path) as f:
        spec = json.load(f)
    raw, stats, _, _ = _run_device_pass(spec, [], paced=False)
    with open(out_path, "wb") as f:
        f.write(json.dumps(list(stats)).encode() + b"\n")
        f.write(raw)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=60)
    ap.add_argument("--ref", default="/tmp/refbuild/dump1090")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--wall-minutes", type=float, default=0,
                    help="run the wall-clock soak for this many minutes "
                    "instead of the fixed-reps byte-diff")
    ap.add_argument("--rate-mb-s", type=float, default=32.0,
                    help="ingest pacing for the wall-clock soak")
    ap.add_argument("--oracle-spec", help="(internal) CPU oracle replay")
    ap.add_argument("--oracle-out", help="(internal) oracle output path")
    ap.add_argument("--backend", default=None,
                    help="pin the JAX platform (e.g. cpu for a logic "
                    "check: a direct run otherwise targets the tunneled "
                    "TPU — the sitecustomize plugin beats JAX_PLATFORMS)")
    args = ap.parse_args()
    from refbuild import ensure_reference
    args.ref = ensure_reference(args.ref)

    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)
    if args.oracle_spec:
        return oracle_main(args.oracle_spec, args.oracle_out)
    if args.wall_minutes:
        return soak_wall(args)

    raw = np.fromfile("/root/reference/testfiles/modes1.bin", dtype=np.uint8)
    stream = np.tile(raw, args.reps)
    print(f"soak input: {stream.nbytes/1e6:.0f} MB "
          f"({stream.nbytes//2/1e6:.0f} M samples)", file=sys.stderr)

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    cfg = PipelineConfig(batch_buffers=args.batch,
                         dispatch_groups=args.groups)
    p = DemodPipeline(cfg)
    t0 = time.perf_counter()
    ours = b"".join(p.stream_raw_device(io.BytesIO(stream.tobytes())))
    dt = time.perf_counter() - t0
    print(f"ours: {len(ours.splitlines())} messages in {dt:.2f}s "
          f"(cold: includes program compile)", file=sys.stderr)
    p2 = DemodPipeline(cfg)
    t0 = time.perf_counter()
    ours2 = b"".join(p2.stream_raw_device(io.BytesIO(stream.tobytes())))
    dt = time.perf_counter() - t0
    assert ours2 == ours
    print(f"warm pass: {dt:.2f}s -> {p2.samples_in/dt/1e6:.0f} Msamples/s "
          f"wall through this harness's tunnel (whose host->device link "
          f"runs ~50 MB/s once any program has executed — see CLAUDE.md; "
          f"bench.py measures the chip-speed protocol)", file=sys.stderr)

    with tempfile.NamedTemporaryFile(suffix=".bin") as tf:
        stream.tofile(tf.name)
        t0 = time.perf_counter()
        ref = subprocess.run(
            [args.ref, "--ifile", tf.name, "--raw"],
            capture_output=True, timeout=600,
        ).stdout
        print(f"reference: {len(ref.splitlines())} messages in "
              f"{time.perf_counter()-t0:.2f}s", file=sys.stderr)

    if ours == ref:
        print(f"SOAK PASS: {len(ours.splitlines())} messages, "
              f"{len(ours)} bytes identical")
        return 0
    a, b = ours.splitlines(), ref.splitlines()
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            print(f"SOAK FAIL at line {i}: ours {x!r} ref {y!r}")
            break
    print(f"SOAK FAIL: ours {len(a)} ref {len(b)} lines")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
