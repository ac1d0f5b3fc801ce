"""Generative tests: synthesize IQ for known frames, decode through the full
pipeline, assert recovery (SURVEY §4 — test infrastructure the reference
lacks entirely)."""

import io

import numpy as np
import pytest

from dump1090_tpu.models.decoder import DecoderConfig
from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig
from dump1090_tpu.utils import synth


def decode_iq(iq: np.ndarray, **cfg):
    p = DemodPipeline(PipelineConfig(decoder=DecoderConfig(**cfg)))
    msgs = []
    p.run(io.BytesIO(iq.tobytes()), msgs.append)
    return [m for m in msgs if m.crcok]


def test_clean_frame_roundtrip():
    frame = synth.make_df17_frame(0x4D2023)
    iq = synth.frame_to_iq(frame, amplitude=80, noise_sigma=0)
    got = decode_iq(iq)
    assert len(got) == 1
    assert got[0].msg[:14] == frame
    assert got[0].msgtype == 17
    assert got[0].addr == 0x4D2023


def test_multiple_frames_in_one_buffer():
    frames = [synth.make_df17_frame(0x4D2000 + k, metype=11) for k in range(20)]
    parts = [synth.frame_to_iq(f, amplitude=70, noise_sigma=1.0,
                               rng=np.random.default_rng(k)) for k, f in enumerate(frames)]
    iq = np.concatenate(parts)
    got = decode_iq(iq)
    assert [m.msg[:14] for m in got] == frames


def test_single_bit_error_corrected():
    frame = synth.make_df17_frame(0x123456)
    corrupted = bytearray(frame)
    corrupted[6] ^= 0x08  # flip bit 52 (inside the DF17 ME field)
    iq = synth.frame_to_iq(bytes(corrupted), amplitude=80)
    got = decode_iq(iq)
    assert len(got) == 1
    assert got[0].msg[:14] == frame      # corrected back to the clean frame
    assert got[0].errorbit == 52
    got_nofix = decode_iq(iq, fix_errors=False)
    assert got_nofix == []


def test_two_bit_error_needs_aggressive():
    frame = synth.make_df17_frame(0x123456)
    corrupted = bytearray(frame)
    corrupted[6] ^= 0x08
    corrupted[9] ^= 0x01
    iq = synth.frame_to_iq(bytes(corrupted), amplitude=80)
    assert decode_iq(iq) == []           # default maxfix=1
    got = decode_iq(iq, aggressive=True)
    assert len(got) == 1
    assert got[0].msg[:14] == frame


def test_high_snr_decodes_low_snr_does_not():
    frame = synth.make_df17_frame(0x4D2023)
    rng = np.random.default_rng(7)
    strong = synth.frame_to_iq(frame, amplitude=80, noise_sigma=2, rng=rng)
    assert len(decode_iq(strong)) == 1
    weak = synth.frame_to_iq(frame, amplitude=3, noise_sigma=8, rng=rng)
    assert decode_iq(weak) == []


def test_decode_rate_improves_with_snr():
    frame = synth.make_df17_frame(0x4D2023)
    rates = []
    for sigma in (14.0, 6.0, 1.0):
        ok = 0
        for trial in range(20):
            rng = np.random.default_rng(trial)
            iq = synth.frame_to_iq(frame, amplitude=40, noise_sigma=sigma,
                                   phase=0.3 + 0.1 * trial, rng=rng)
            ok += len(decode_iq(iq))
        rates.append(ok / 20)
    assert rates[0] <= rates[1] <= rates[2]
    assert rates[2] == 1.0


def test_fleet_traffic_exercises_tracker_plane():
    """The soak's synthetic fleet (tools/soak_device.py) must drive every
    tracker-plane path: multi-aircraft CPR pairing, idents, velocities,
    AP-addressed DF4 replies, surface decode after auto-reference
    (dump1090.c:2069-2164) — pinned here so the generator can't rot."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from soak_device import _fleet_frames

    from dump1090_tpu.models.decoder import (
        DecoderStats, IcaoCache, decode_message,
    )
    from dump1090_tpu.models.tracker import AircraftTracker

    n_ac, steps = 5, 3
    frames = _fleet_frames(n_ac, steps)
    t = [1000]
    cache = IcaoCache(clock=lambda: t[0])
    trk = AircraftTracker(clock=lambda: t[0], msclock=lambda: t[0] * 1000)
    stats = DecoderStats()
    df_types = set()
    for f in frames:
        mm = decode_message(f, cache, DecoderConfig(), stats)
        assert mm.crcok, f"fleet frame failed CRC: {f.hex()}"
        df_types.add(mm.msgtype)
        trk.receive(mm)
        t[0] += 1
    assert df_types == {4, 17}
    assert len(trk.aircraft) == n_ac
    assert trk.ref_count > 0                      # auto-reference accumulated
    for a in trk.aircraft:
        assert a.flight.startswith("SOAK")        # ident decoded
        assert (a.lat, a.lon) != (0.0, 0.0)       # CPR pair decoded
        assert a.speed > 0                        # velocity decoded
    # airborne aircraft carry the DF4 altitude; the surface one ends on a
    # DF4 too (alt restored after the on-ground zero) — all nonzero here
    assert all(a.altitude > 0 for a in trk.aircraft)
