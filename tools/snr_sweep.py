#!/usr/bin/env python3
"""Decode-rate vs SNR sweep: this framework vs the reference binary.

The reference publishes no sensitivity numbers (README.md:103-113 "no formal
test was performed"); this makes the comparison measurable.  For each SNR a
batch of known DF17 frames is modulated at 2 Msps with AWGN and random
carrier phase (utils/synth.py), written as a uint8 IQ stream, and decoded by
both implementations; the score is the fraction of planted frames whose
exact 112-bit payload comes back with a good CRC.

Usage:
    python tools/snr_sweep.py [--ref /path/to/reference/dump1090]
                              [--frames 200] [--snrs 0,2,4,...]

Output: one markdown table on stdout.  Both decoders see the *identical*
byte stream, so any difference is decoder sensitivity, not luck.
"""

from __future__ import annotations

import argparse
import io
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_stream(snr_db: float, n_frames: int, rng) -> tuple[np.ndarray, list[str]]:
    from dump1090_tpu.utils.synth import frame_to_iq, make_df17_frame

    noise_sigma = 10.0
    amplitude = noise_sigma * (10 ** (snr_db / 20.0))
    spacing = 2000 * 2  # samples apart (bytes: x2)
    frames, hexes = [], []
    for k in range(n_frames):
        f = make_df17_frame(addr=0x100000 + k, metype=4)
        hexes.append(f.hex())
        frames.append(f)
    # pad to a whole number of 256 KiB reader buffers: the final partial
    # buffer's decode is RACY in the reference (the reader thread sets
    # Modes.exit while the decoder may or may not have reached it,
    # dump1090.c:497 vs :2989 — measured: usually dropped, sometimes not),
    # so planted frames must never live there for a fair comparison
    n = n_frames * spacing + 8000
    n = -(-n // (256 * 1024)) * (256 * 1024)
    stream = (127 + rng.normal(0, noise_sigma, n)).clip(0, 255).astype(np.uint8)
    for k, f in enumerate(frames):
        iq = frame_to_iq(
            f,
            amplitude=min(amplitude, 126.0),
            noise_sigma=noise_sigma,
            phase=float(rng.uniform(0, 2 * np.pi)),
            pad_before=0,
            pad_after=0,
            rng=rng,
        )
        stream[k * spacing : k * spacing + len(iq)] = iq
    return stream, hexes


def decode_ours(stream: np.ndarray, device_resolve: bool = False) -> set[str]:
    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    p = DemodPipeline(PipelineConfig(batch_buffers=8))
    got = set()
    sink = lambda mm: got.add(mm.msg.hex()) if mm.crcok else None
    if device_resolve:
        # the PRODUCT TPU path: fused demod + Pallas sequential resolve on
        # the device (what --raw runs on the chip), not the host oracle
        p.run_device(io.BytesIO(stream.tobytes()), sink)
    else:
        p.run(io.BytesIO(stream.tobytes()), sink)
    return got


def decode_reference(stream: np.ndarray, ref_bin: str) -> set[str]:
    with tempfile.NamedTemporaryFile(suffix=".bin") as tf:
        stream.tofile(tf.name)
        out = subprocess.run(
            [ref_bin, "--ifile", tf.name, "--raw"],
            capture_output=True, text=True, timeout=300,
        ).stdout
    return {line.strip()[1:-1] for line in out.splitlines() if line.startswith("*")}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/dump1090",
                    help="reference binary (skipped if missing)")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--snrs", default="-2,0,2,4,6,8,10,14,20")
    ap.add_argument("--backend", default="cpu",
                    help="JAX platform for our decoder (default cpu: the "
                    "sweep is a parity check, and a direct run must not "
                    "silently target — and hang with — the tunneled TPU)")
    ap.add_argument("--device-resolve", action="store_true",
                    help="drive the on-device sequential resolver "
                    "(DemodPipeline.run_device, the path --raw uses on the "
                    "chip) instead of the host oracle")
    args = ap.parse_args()

    import jax

    # jax.config.update beats the axon sitecustomize; the env var does not.
    # "tpu"/"auto" must NOT pin the platform: the tunneled chip registers
    # through a plugin, and forcing jax_platforms=tpu invokes the stock
    # libtpu init instead (fails with "no jellyfish device").
    if args.backend not in ("tpu", "auto"):
        jax.config.update("jax_platforms", args.backend)

    snrs = [float(s) for s in args.snrs.split(",")]
    try:  # build the reference on demand; sweep solo only if impossible
        from refbuild import ensure_reference

        args.ref = ensure_reference(args.ref)
        have_ref = True
    except SystemExit as e:
        print(f"snr_sweep: {e} — reference column skipped", file=sys.stderr)
        have_ref = False
    rows = []
    exact_sets = True
    for snr in snrs:
        rng = np.random.default_rng(int(snr * 10) + 12345)
        stream, hexes = build_stream(snr, args.frames, rng)
        planted = set(hexes)
        got = decode_ours(stream, device_resolve=args.device_resolve)
        ours = len(got & planted) / len(planted)
        if have_ref:
            ref_got = decode_reference(stream, args.ref)
            ref = len(ref_got & planted) / len(planted)
            if got & planted != ref_got & planted:
                exact_sets = False
            rows.append((snr, ours, ref))
        else:
            rows.append((snr, ours, None))

    print("| SNR (dB) | dump1090-tpu | reference |")
    print("|---|---|---|")
    for snr, ours, ref in rows:
        r = f"{ref:.1%}" if ref is not None else "n/a"
        print(f"| {snr:g} | {ours:.1%} | {r} |")
    if have_ref:
        path = "device resolve" if args.device_resolve else "host resolve"
        print(f"\nexact recovered-frame SETS identical at every point "
              f"({path}, backend {jax.default_backend()}): {exact_sets}")
        if not exact_sets:
            sys.exit(1)


if __name__ == "__main__":
    main()
