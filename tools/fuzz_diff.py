#!/usr/bin/env python3
"""Differential fuzzing: random IQ streams through this framework and the
reference binary; any byte difference in the --raw stream is a finding.

Stream recipes mix the hard cases: pure noise at several levels, clean and
noisy synthetic frames (random DF17 payloads, swept SNR and carrier phase),
overlapping/adjacent frames (exercises the good-CRC skip rule), frames
planted at buffer boundaries (the 476-byte carry), DC offsets, and saturated
samples.  Streams pad to whole 256 KiB buffers so the reference's racy
final-partial-buffer decode can't flake the comparison (see snr_sweep.py).

Usage: python tools/fuzz_diff.py [--ref /tmp/refbuild/dump1090] [--n 50]
                                 [--seed 0] [--mode raw|nofix|aggressive]
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

BUF = 256 * 1024


def random_stream(rng: np.random.Generator) -> np.ndarray:
    from dump1090_tpu.utils.synth import frame_to_iq, make_df17_frame

    recipe = rng.integers(0, 6)
    n = int(rng.integers(1, 4)) * BUF
    if recipe == 0:  # pure noise, random level
        sigma = float(rng.uniform(1, 40))
        s = 127 + rng.normal(0, sigma, n)
    elif recipe == 1:  # uniform garbage (includes saturation)
        s = rng.integers(0, 256, n)
    else:  # noise floor + planted frames
        sigma = float(rng.uniform(2, 15))
        s = 127 + rng.normal(0, sigma, n)
        n_frames = int(rng.integers(1, 60))
        for _ in range(n_frames):
            f = make_df17_frame(
                addr=int(rng.integers(1, 1 << 24)),
                metype=int(rng.integers(1, 23)),
                mesub=int(rng.integers(0, 8)),
                me_payload=rng.integers(0, 256, 6, dtype=np.uint8).tobytes(),
            )
            amp = float(rng.uniform(sigma * 1.5, 120))
            iq = frame_to_iq(
                f, amplitude=amp, noise_sigma=0.0,
                phase=float(rng.uniform(0, 2 * np.pi)),
                pad_before=0, pad_after=0, rng=rng,
            ).astype(np.float64) - 127
            if recipe == 4:  # cluster frames tightly (skip-rule stress)
                at = int(rng.integers(0, max(1, n // 4))) * 2
            elif recipe == 5:  # straddle a buffer boundary
                b = int(rng.integers(1, n // BUF + 1)) * BUF
                at = b - int(rng.integers(1, len(iq))) // 2 * 2
            else:
                at = int(rng.integers(0, n - len(iq))) // 2 * 2
            at = max(0, min(at, n - len(iq)))
            s[at : at + len(iq)] += iq  # superpose on the noise floor
    return np.clip(s, 0, 255).astype(np.uint8)


def decode_ours(stream: np.ndarray, mode: str) -> list[str]:
    from dump1090_tpu.models.decoder import DecoderConfig
    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    if mode.endswith("verbose"):
        # full field-decode + display formatting, via the real CLI (with
        # device-verbose: the on-device resolver feeding the hub path)
        args = ["--tpu-device-resolve",
                "on" if mode.startswith("device") else "off"]
        with tempfile.NamedTemporaryFile(suffix=".bin") as tf:
            stream.tofile(tf.name)
            env = {k: v for k, v in __import__("os").environ.items()
                   if k != "PYTHONPATH"}
            env["JAX_PLATFORMS"] = "cpu"
            out = subprocess.run(
                [sys.executable, "-m", "dump1090_tpu", "--ifile", tf.name,
                 *args],
                capture_output=True, text=True, timeout=600, env=env,
                cwd=str(Path(__file__).resolve().parent.parent),
            ).stdout
        return out.splitlines()

    cfg = DecoderConfig(
        fix_errors=not mode.endswith("nofix"),
        aggressive=mode.endswith("aggressive"),
    )
    if mode.startswith("sharded"):
        # the time-sharded multi-chip path (requires a multi-device mesh,
        # e.g. XLA_FLAGS=--xla_force_host_platform_device_count=8);
        # sharded-device additionally resolves the merged candidate stream
        # on device (ops/resolve.py resolve_candidate_segments)
        from dump1090_tpu.api import decode_capture_sharded

        msgs = decode_capture_sharded(
            stream.tobytes(), config=cfg, crcok_only=True,
            device_resolve=mode.endswith("device"),
        )
        return ["*" + m.msg[: m.msgbits // 8].hex() + ";" for m in msgs]
    p = DemodPipeline(PipelineConfig(decoder=cfg, batch_buffers=4))
    if mode.startswith("device"):
        # the fully-fused on-device resolver path (ops/resolve.py)
        raw = b"".join(p.stream_raw_device(io.BytesIO(stream.tobytes())))
        return raw.decode().split()
    out = []
    p.run(
        io.BytesIO(stream.tobytes()),
        lambda m: out.append("*" + m.msg[: m.msgbits // 8].hex() + ";")
        if m.crcok
        else None,
    )
    return out


def decode_ref(stream: np.ndarray, ref: str, mode: str) -> list[str]:
    args = [ref]
    if mode.endswith("nofix"):
        args += ["--raw", "--no-fix"]
    elif mode.endswith("aggressive"):
        args += ["--raw", "--aggressive"]
    elif mode.endswith("verbose"):
        pass  # full decoded-field display
    else:
        args.append("--raw")
    with tempfile.NamedTemporaryFile(suffix=".bin") as tf:
        stream.tofile(tf.name)
        out = subprocess.run(
            args + ["--ifile", tf.name], capture_output=True, text=True,
            timeout=600,
        ).stdout
    if mode.endswith("verbose"):
        return out.splitlines()
    return [l.strip() for l in out.splitlines() if l.startswith("*")]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/dump1090")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mode", default="raw",
                    choices=["raw", "nofix", "aggressive", "verbose",
                             "device", "device-nofix", "device-aggressive",
                             "device-verbose", "sharded", "sharded-device"])
    ap.add_argument("--backend", default="cpu",
                    help="JAX platform (default cpu: differential fuzzing "
                    "is a correctness tool, and a direct run would "
                    "otherwise grab the TPU — which hangs the whole sweep "
                    "when the tunnel is wedged)")
    args = ap.parse_args()
    from refbuild import ensure_reference
    args.ref = ensure_reference(args.ref)

    if args.backend != "auto":
        # must beat the axon sitecustomize, which registers the TPU plugin
        # programmatically and wins over the JAX_PLATFORMS env var
        import jax

        jax.config.update("jax_platforms", args.backend)

    rng = np.random.default_rng(args.seed)
    fails = 0
    for k in range(args.n):
        stream = random_stream(rng)
        ours = decode_ours(stream, args.mode)
        ref = decode_ref(stream, args.ref, args.mode)
        if ours != ref:
            fails += 1
            path = f"/tmp/fuzz_fail_{args.seed}_{k}.bin"
            stream.tofile(path)
            print(f"[{k}] MISMATCH ours={len(ours)} ref={len(ref)} -> {path}")
            for a, b in zip(ours, ref):
                if a != b:
                    print(f"    first diff: ours {a} ref {b}")
                    break
        else:
            print(f"[{k}] ok ({len(ours)} msgs, {len(stream)//BUF} buffers)")
    print(f"\n{args.n - fails}/{args.n} identical")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
