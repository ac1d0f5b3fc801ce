#!/usr/bin/env python3
"""Soak test: a large concatenated capture through the on-device resolver
vs the reference binary, byte for byte.

Validates cross-batch ICAO-cache chaining and overflow behavior at scale on
whatever backend is active (run on the real chip for the hardware Pallas
kernel, or with JAX_PLATFORMS=cpu for the XLA scan backend).

Usage: python tools/soak_device.py [--reps 60] [--ref /tmp/refbuild/dump1090]
"""

import argparse
import io
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=60)
    ap.add_argument("--ref", default="/tmp/refbuild/dump1090")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--groups", type=int, default=8)
    args = ap.parse_args()

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
