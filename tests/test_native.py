"""Differential tests: native C++ host runtime vs the pure-Python oracle.

The native library (dump1090_tpu/native/modes_native.cpp) re-implements the
sequential resolver and frame decoder; these tests pin it bit-for-bit to the
Python implementations that are themselves verified against the reference
binary's behavior (tests/test_golden.py)."""

from __future__ import annotations

import dataclasses
import io

import numpy as np
import pytest

from dump1090_tpu.models.decoder import (
    DecoderConfig,
    DecoderStats,
    IcaoCache,
    decode_message,
)
from dump1090_tpu.native import NativeResolver, load

pytestmark = pytest.mark.skipif(load() is None, reason="native lib unavailable")

FIXTURE = "/root/reference/testfiles/modes1.bin"


@pytest.fixture(scope="module")
def native():
    return NativeResolver()


def _mm_dict(mm):
    return dataclasses.asdict(mm)


def test_crc_and_fix_match_python(native):
    import ctypes

    from dump1090_tpu.ops import crc as crc_ops

    rng = np.random.default_rng(0)
    lib = native._lib
    for _ in range(500):
        bits = int(rng.choice([56, 112]))
        msg = rng.integers(0, 256, 14, dtype=np.uint8)
        assert lib.d1090_checksum(
            ctypes.c_void_p(native._state),
            msg.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int32(bits),
        ) == crc_ops.checksum(msg, bits)

        for maxfix in (1, 2):
            m_py = msg.copy()
            m_c = msg.copy()
            rel_py = crc_ops.fix_bit_errors(m_py, bits, maxfix)
            rel_out = np.zeros(2, dtype=np.int32)
            n = lib.d1090_fix_bit_errors(
                ctypes.c_void_p(native._state),
                m_c.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int32(bits),
                ctypes.c_int32(maxfix),
                rel_out.ctypes.data_as(ctypes.c_void_p),
            )
            assert n == len(rel_py)
            assert rel_out[:n].tolist() == rel_py
            assert (m_py == m_c).all()


def test_decode_one_fuzz_vs_python(native):
    """Random frames (some with clean CRC, some with planted bit errors)
    decode to identical ModesMessage field sets under a shared-clock cache."""
    from dump1090_tpu.utils.synth import make_df17_frame

    rng = np.random.default_rng(1)
    clock = lambda: 1000
    cache_py, cache_c = IcaoCache(clock=clock), IcaoCache(clock=clock)
    cfg = DecoderConfig(aggressive=True)
    stats_py, stats_c = DecoderStats(), DecoderStats()

    frames = []
    for k in range(300):
        kind = k % 3
        if kind == 0:  # pure random bytes
            frames.append(rng.integers(0, 256, 14, dtype=np.uint8))
        else:  # valid DF17 with 0..2 planted bit errors
            f = make_df17_frame(
                addr=int(rng.integers(1, 1 << 24)),
                metype=int(rng.choice([4, 7, 11, 19])),
                mesub=int(rng.integers(0, 5)),
                me_payload=rng.integers(0, 256, 6, dtype=np.uint8).tobytes(),
            )
            f = np.frombuffer(f, dtype=np.uint8).copy()
            for _ in range(int(rng.integers(0, 3))):
                b = int(rng.integers(0, 112))
                f[b >> 3] ^= 1 << (7 - (b & 7))
            frames.append(f)

    for f in frames:
        mm_py = decode_message(f, cache_py, cfg, stats_py)
        mm_c = native.decode_one(bytes(f), cache_c, cfg, stats_c)
        assert _mm_dict(mm_py) == _mm_dict(mm_c), f.tobytes().hex()
    assert stats_py == stats_c
    assert (cache_py.addr == cache_c.addr).all()
    assert (cache_py.ts == cache_c.ts).all()


def test_resolver_matches_python_on_fixture(native):
    """Full-file differential: native and Python resolvers emit identical
    message streams and stats on the reference capture."""
    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    raw = open(FIXTURE, "rb").read()

    def run(use_native):
        p = DemodPipeline(PipelineConfig(), clock=lambda: 1000, native=use_native)
        out = []
        p.run(io.BytesIO(raw), out.append)
        return out, p.stats

    a, sa = run(False)
    b, sb = run(True)
    assert len(a) == len(b)
    assert sa == sb
    for x, y in zip(a, b):
        assert _mm_dict(x) == _mm_dict(y)


def test_resolver_matches_python_aggressive(native):
    """--aggressive (two-bit fixes + 1/2-error demod acceptance) parity."""
    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    raw = open(FIXTURE, "rb").read()

    def run(use_native):
        p = DemodPipeline(
            PipelineConfig(decoder=DecoderConfig(aggressive=True)),
            clock=lambda: 1000,
            native=use_native,
        )
        out = []
        p.run(io.BytesIO(raw), out.append)
        return out, p.stats

    a, sa = run(False)
    b, sb = run(True)
    assert sa == sb
    assert [_mm_dict(x) for x in a] == [_mm_dict(y) for y in b]


def test_shared_cache_with_python_decode_path(native):
    """The network hex-input path (Python decode_message) and the native
    resolver share one ICAO cache: an address learned natively gates
    Python-side AP acceptance."""
    from dump1090_tpu.utils.synth import make_df17_frame

    clock = lambda: 1000
    cache = IcaoCache(clock=clock)
    cfg = DecoderConfig()
    addr = 0x4D2023

    f = np.frombuffer(make_df17_frame(addr=addr, metype=4), dtype=np.uint8)
    mm = native.decode_one(bytes(f), cache, cfg)
    assert mm.crcok and mm.addr == addr
    assert cache.recently_seen(addr)

    # a DF0 frame whose AP is XORed with that address now passes via Python
    from dump1090_tpu.ops import crc as crc_ops

    df0 = np.zeros(7, dtype=np.uint8)
    df0[0] = 0
    crc = crc_ops.compute_crc(df0, 56)
    ap = crc ^ addr
    df0[4], df0[5], df0[6] = (ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF
    mm2 = decode_message(df0, cache, cfg)
    assert mm2.crcok and mm2.addr == addr


def test_stream_records_batched_and_overflow(native):
    """stream_records (one native call per batch) equals per-block resolve,
    including the dense-row overflow fallback."""
    import io

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig
    from dump1090_tpu.utils.synth import frame_to_iq, make_df17_frame

    frames = [make_df17_frame(addr=0x300000 + k, metype=4) for k in range(40)]
    spacing = 1000 * 2
    stream = np.full(40 * spacing + 4000, 127, dtype=np.uint8)
    for k, f in enumerate(frames):
        iq = frame_to_iq(f, amplitude=90.0, pad_before=0, pad_after=0)
        stream[k * spacing : k * spacing + len(iq)] = iq
    data = stream.tobytes() + open(FIXTURE, "rb").read()

    def run(mc, batch):
        p = DemodPipeline(
            PipelineConfig(max_candidates=mc, batch_buffers=batch),
            clock=lambda: 1000,
        )
        recs = [r for r in p.stream_records(io.BytesIO(data))]
        hexes = []
        for block in recs:
            for row in block:
                if row["crcok"]:
                    hexes.append(bytes(row["msg"]).hex())
        return hexes, p.stats

    a, sa = run(256, 4)
    b, sb = run(16, 4)   # forces the overflow fallback inside a batch
    c, sc = run(256, 1)
    assert a == b == c
    assert sa == sb == sc
