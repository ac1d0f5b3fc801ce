"""On-device resolver tests (ops/resolve.py) — differential against the host
oracle (models/resolver.py) and the reference goldens.

Contract under test: detectModeS candidate resolution + decodeModesMessage
CRC/cache semantics (dump1090.c:1563-1793, 1091-1209) executed entirely on
the device: vectorized syndromes/fix/brute-force + the sequential
skip/ICAO-cache state machine (lax.scan fallback here on CPU; the Pallas
kernel is covered in interpret mode and, with DUMP1090_TEST_TPU=1, for real).
"""

import numpy as np
import pytest

from dump1090_tpu.constants import (
    BUF_SAMPLES,
    FULL_LEN_SAMPLES,
    ICAO_CACHE_LEN,
)
from dump1090_tpu.models.decoder import DecoderConfig, DecoderStats, IcaoCache
from dump1090_tpu.models.resolver import BlockCandidates, resolve_block
from dump1090_tpu.ops.resolve import (
    META_CRCOK,
    META_LONG,
    META_PASS,
    META_PHASE,
    META_POS_SHIFT,
    demod_resolve_batch,
    icao_hash,
)

SCAN = BUF_SAMPLES - FULL_LEN_SAMPLES
NOW = 1_700_000_000


def _modes1_buffers(modes1_path):
    from dump1090_tpu.parallel.sharding import overlapping_buffers

    raw = np.fromfile(modes1_path, dtype=np.uint8)
    stream = np.concatenate([np.full(476, 127, np.uint8), raw])
    return np.asarray(overlapping_buffers(stream))


def _device_resolve(bufs, *, fix=True, aggressive=False, crcok_only=True,
                    max_out=2048, state=None, pallas=None):
    # pallas=None: backend-appropriate — the XLA scan on CPU runs, and the
    # DUMP1090_TEST_TPU suite exercises the real Pallas kernel
    import jax
    import jax.numpy as jnp

    if state is None:
        state = (
            jnp.zeros(ICAO_CACHE_LEN, jnp.int32),
            jnp.zeros(ICAO_CACHE_LEN, jnp.int32),
        )
    n, count, msg, meta, stats, ca, ct = demod_resolve_batch(
        jnp.asarray(bufs), state[0], state[1], NOW, fix, aggressive,
        scan_len=SCAN, max_candidates=256, max_out=max_out,
        crcok_only=crcok_only, pallas=pallas,
    )
    n, count, msg, meta, stats = jax.device_get([n, count, msg, meta, stats])
    c = int(count)
    assert c <= max_out and int(n.max()) <= 256
    return n, meta[:c], msg[:c], stats, (ca, ct)


def _host_resolve(bufs, *, fix=True, aggressive=False):
    import jax

    from dump1090_tpu.parallel.sharding import demod_batch

    cand = jax.device_get(
        demod_batch(bufs, scan_len=SCAN, max_candidates=256)
    )
    cache = IcaoCache(clock=lambda: NOW)
    cfg = DecoderConfig(fix_errors=fix, aggressive=aggressive)
    stats = DecoderStats()
    msgs = []
    for b in range(bufs.shape[0]):
        one = type(cand)(*[f[b] for f in cand])
        resolve_block(
            BlockCandidates.from_device(one), cache, cfg, stats, msgs.append
        )
    return msgs, stats, cache


def _assert_matches_host(meta, msg, stats, host_msgs, host_stats):
    assert len(host_msgs) == len(meta)
    for i, mm in enumerate(host_msgs):
        assert bytes(msg[i]) == mm.msg
        assert bool(meta[i] & META_CRCOK) == mm.crcok
        assert bool(meta[i] & META_PHASE) == mm.phase_corrected
        assert (112 if meta[i] & META_LONG else 56) == mm.msgbits
    got = [int(x) for x in stats]
    want = [host_stats.valid_preamble, host_stats.out_of_phase,
            host_stats.demodulated, host_stats.goodcrc, host_stats.badcrc,
            host_stats.fixed, host_stats.single_bit_fix,
            host_stats.two_bits_fix]
    assert got == want


def test_golden_raw_and_stats(modes1_path, golden_dir):
    """Full modes1 through the device resolver == the reference's --raw
    stream and --stats counters, byte for byte."""
    from dump1090_tpu.native import raw_lines_from_fields

    bufs = _modes1_buffers(modes1_path)
    _, meta, msg, stats, _ = _device_resolve(bufs)
    lines = raw_lines_from_fields(
        msg, np.where(meta & META_LONG, 112, 56), np.ones(len(meta), bool)
    )
    assert lines == (golden_dir / "golden_raw.txt").read_bytes()
    assert [int(x) for x in stats] == [415, 216, 407, 211, 196, 6, 12, 0]


@pytest.mark.parametrize("fix,aggressive", [(True, False), (False, False), (True, True)])
def test_emit_all_matches_host_oracle(modes1_path, fix, aggressive):
    """Every emitted message (including bad-CRC ones), in order, with the
    exact msg bytes / crcok / phase flags / stats — vs models/resolver.py."""
    bufs = _modes1_buffers(modes1_path)
    _, meta, msg, stats, _ = _device_resolve(
        bufs, fix=fix, aggressive=aggressive, crcok_only=False
    )
    host_msgs, host_stats, _ = _host_resolve(bufs, fix=fix, aggressive=aggressive)
    _assert_matches_host(meta, msg, stats, host_msgs, host_stats)


def test_cross_batch_cache_state(modes1_path):
    """Buffer-at-a-time batches chained through the device cache state must
    equal one batch of all buffers (the cache is the only cross-buffer
    coupling, dump1090.c:896-983)."""
    bufs = _modes1_buffers(modes1_path)
    _, meta_all, msg_all, stats_all, _ = _device_resolve(bufs, crcok_only=False)

    state = None
    metas, msgs, stats_sum = [], [], np.zeros(8, np.int64)
    for b in range(bufs.shape[0]):
        _, meta, msg, stats, state = _device_resolve(
            bufs[b : b + 1], crcok_only=False, state=state
        )
        metas.append(meta)
        msgs.append(msg)
        stats_sum += np.asarray(stats, dtype=np.int64)
    meta_cat = np.concatenate(metas)
    msg_cat = np.concatenate(msgs)
    assert np.array_equal(meta_cat, meta_all)
    assert np.array_equal(msg_cat, msg_all)
    assert np.array_equal(stats_sum, np.asarray(stats_all, dtype=np.int64))
    # and the final device cache equals the host replay's cache
    _, _, host_cache = _host_resolve(bufs)
    import jax

    ca, ct = jax.device_get(list(state))
    assert np.array_equal(ca.astype(np.uint32), host_cache.addr)
    nz = host_cache.ts != 0
    assert np.array_equal(ct[nz], host_cache.ts[nz])


def test_icao_hash_matches_reference():
    import jax

    rng = np.random.default_rng(7)
    addrs = np.concatenate([
        rng.integers(0, 1 << 24, 256).astype(np.int32),
        np.array([0, 1, 0xFFFFFF], dtype=np.int32),
    ])
    got = jax.device_get(jax.jit(icao_hash)(addrs))
    want = [IcaoCache.hash(int(a)) for a in addrs]
    assert got.tolist() == want


def test_device_fix_matches_host_fix():
    """Vectorized dense-table fixBitErrors vs the host implementation on
    frames with 0/1/2 flipped bits (both frame lengths, both maxfix)."""
    import jax
    import jax.numpy as jnp

    from dump1090_tpu.ops import crc as crc_ops
    from dump1090_tpu.ops.resolve import fix_candidates
    from dump1090_tpu.utils.synth import make_df17_frame

    rng = np.random.default_rng(3)
    frames = []
    for k in range(200):
        f = np.frombuffer(
            make_df17_frame(int(rng.integers(0, 1 << 24)), metype=4,
                            me_payload=bytes(rng.integers(0, 256, 6).tolist())),
            dtype=np.uint8,
        ).copy()
        nflip = int(rng.integers(0, 3))
        for p in rng.choice(112, nflip, replace=False):
            f[p >> 3] ^= 1 << (7 - (p & 7))
        frames.append(f)
    # short frames too: random 7-byte bodies zero-padded
    for k in range(100):
        f = np.zeros(14, np.uint8)
        f[:7] = rng.integers(0, 256, 7, dtype=np.uint8)
        f[0] = (11 << 3) | (f[0] & 7)  # DF11 so the fixer engages
        frames.append(f)
    msgs = np.stack(frames)

    for maxfix in (1, 2):
        msgtype = msgs[:, 0] >> 3
        is_long = (msgtype >= 16) & (msgtype <= 21)
        bits = np.where(is_long, 112, 56)
        syn = np.array([
            crc_ops.checksum(m, int(b)) for m, b in zip(msgs, bits)
        ], dtype=np.int32)
        want_fix = (syn != 0) & np.isin(msgtype, (11, 17, 18))
        fixed_msgs, errorbit, nfix = jax.device_get(
            jax.jit(fix_candidates)(
                jnp.asarray(msgs), jnp.asarray(syn), jnp.asarray(bits),
                jnp.asarray(want_fix), jnp.int32(maxfix),
            )
        )
        for i in range(len(msgs)):
            m_host = msgs[i].copy()
            if want_fix[i]:
                fixed = crc_ops.fix_bit_errors(m_host, int(bits[i]), maxfix)
            else:
                fixed = []
            assert bytes(fixed_msgs[i]) == bytes(m_host), i
            assert int(errorbit[i]) == (fixed[0] if fixed else -1), i
            assert int(nfix[i]) == len(fixed), i


def _words_inputs(bufs, mc):
    """Flat-stream kernel inputs (pf, w1, w2, nbuf) from real candidates."""
    import jax.numpy as jnp

    import dump1090_tpu.ops.resolve as R
    from dump1090_tpu.parallel.sharding import demod_batch

    cand = demod_batch(jnp.asarray(bufs), scan_len=SCAN, max_candidates=mc)
    nb, mc = cand.pos.shape
    n_flat = nb * mc
    flat = lambda a: a.reshape((n_flat,) + a.shape[2:])  # noqa: E731
    fe, ag = jnp.asarray(True), jnp.asarray(False)
    w1, _, _ = R._pass_precompute(
        flat(cand.msg1), flat(cand.errors1), flat(cand.gate1), ag, fe
    )
    w2, _, _ = R._pass_precompute(
        flat(cand.msg2), flat(cand.errors2), flat(cand.gate2), ag, fe
    )
    nbuf = jnp.minimum(cand.n, mc).astype(jnp.int32)
    slot = jnp.arange(n_flat, dtype=jnp.int32)
    valid = (slot % mc) < jnp.repeat(nbuf, mc)
    pf = (
        jnp.minimum(flat(cand.pos), R.PF_POS_MASK)
        | valid.astype(jnp.int32) * R.PF_VALID
        | ((slot % mc) == 0).astype(jnp.int32) * R.PF_NEWBUF
        | flat(cand.gate1).astype(jnp.int32) * R.PF_GATE1
    )
    return pf, w1, w2, nbuf


@pytest.mark.parametrize("mc", [256, 4096])
def test_pallas_kernel_interpret_matches_xla(modes1_path, mc):
    """The Pallas kernel (interpret mode) against the lax.scan backend on
    real candidates — both chunk geometries: many buffers per chunk
    (mc=256) and one buffer spanning chunks (mc=4096 > RESOLVE_CHUNK).
    The Pallas path walks only each buffer's valid prefix; the XLA twin
    walks every slot — words/cache must match exactly."""
    bufs = _modes1_buffers(modes1_path)[:2]
    import jax.numpy as jnp

    import dump1090_tpu.ops.resolve as R

    pf, w1, w2, nbuf = _words_inputs(bufs, mc)
    ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    w_x, ca_x, ct_x, _ = R._resolve_words_xla(pf, w1, w2, ca, ct, jnp.int32(NOW))
    w_p, ca_p, ct_p = R._resolve_words_pallas(
        pf, w1, w2, nbuf, ca, ct, jnp.int32(NOW), mc=mc, interpret=True
    )
    assert np.array_equal(np.asarray(w_x), np.asarray(w_p))
    assert np.array_equal(np.asarray(ca_x), np.asarray(ca_p))
    assert np.array_equal(np.asarray(ct_x), np.asarray(ct_p))


def test_pallas_kernel_interpret_odd_geometry(modes1_path):
    """Chunk geometry with mc that does not divide RESOLVE_CHUNK (96) and a
    buffer count that does not fill the last chunk: padding pseudo-buffers
    must be no-ops and results must equal the XLA twin."""
    bufs = _modes1_buffers(modes1_path)[:3]
    import jax.numpy as jnp

    import dump1090_tpu.ops.resolve as R

    pf, w1, w2, nbuf = _words_inputs(bufs, 96)
    # 96 candidates/buffer < the densest modes1 buffer: clamp like the
    # product does (overflowing buffers are retried at a larger shape by
    # the host; the kernel itself must stay in bounds)
    ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    w_x, ca_x, ct_x, _ = R._resolve_words_xla(pf, w1, w2, ca, ct, jnp.int32(NOW))
    w_p, ca_p, ct_p = R._resolve_words_pallas(
        pf, w1, w2, nbuf, ca, ct, jnp.int32(NOW), mc=96, interpret=True
    )
    assert np.array_equal(np.asarray(w_x), np.asarray(w_p))
    assert np.array_equal(np.asarray(ca_x), np.asarray(ca_p))
    assert np.array_equal(np.asarray(ct_x), np.asarray(ct_p))


def test_pipeline_stream_raw_device(modes1_path, golden_dir):
    """Product path: DemodPipeline.stream_raw_device == golden raw stream,
    stats exact, and overflow retry (tiny max_out) reproduces it too."""
    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    golden = (golden_dir / "golden_raw.txt").read_bytes()

    p = DemodPipeline(PipelineConfig(batch_buffers=2), clock=lambda: NOW)
    with open(modes1_path, "rb") as f:
        out = b"".join(p.stream_raw_device(f))
    assert out == golden
    assert (p.stats.valid_preamble, p.stats.goodcrc, p.stats.fixed) == (415, 211, 6)
    # device cache synced back to the host cache object
    assert (p.cache.addr != 0).any()

    p2 = DemodPipeline(PipelineConfig(batch_buffers=2), clock=lambda: NOW)
    p2._mos = p2._mol = 16  # force emitted-count overflow -> sticky growth
    with open(modes1_path, "rb") as f:
        out2 = b"".join(p2.stream_raw_device(f))
    assert out2 == golden
    assert p2._mos >= 64 or p2._mol >= 64


@pytest.mark.parametrize("fix,aggressive", [(True, False), (True, True)])
def test_run_device_full_field_equality(modes1_path, fix, aggressive):
    """The full-fidelity device hub path (DemodPipeline.run_device +
    models/decoder.py message_from_device): every ModesMessage field of
    every emitted message equals the host pipeline's, and stats match."""
    import dataclasses

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    cfg = DecoderConfig(fix_errors=fix, aggressive=aggressive)
    p_dev = DemodPipeline(
        PipelineConfig(decoder=cfg, batch_buffers=2), clock=lambda: NOW
    )
    dev = []
    with open(modes1_path, "rb") as f:
        p_dev.run_device(f, dev.append)

    p_host = DemodPipeline(
        PipelineConfig(decoder=cfg, batch_buffers=2), clock=lambda: NOW
    )
    host = []
    with open(modes1_path, "rb") as f:
        p_host.run(f, host.append)

    assert len(dev) == len(host) > 0
    for a, b in zip(dev, host):
        assert dataclasses.asdict(a) == dataclasses.asdict(b)
    assert p_dev.stats == p_host.stats


def test_ingest_strategies_bit_identical(modes1_path, golden_dir, monkeypatch):
    """Both _ingest_groups strategies — whole-file device preload (regular
    seekable files) and the reader-thread streaming overlap (the framework's
    form of the reference's reader/decoder overlap, dump1090.c:436-527,
    2968-2990) — must produce the identical golden raw stream, and each run
    must actually take its intended branch."""
    import threading

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    golden = (golden_dir / "golden_raw.txt").read_bytes()
    spawned: list[str] = []
    real_thread = threading.Thread

    class SpyThread(real_thread):
        def __init__(self, *a, **kw):
            spawned.append(kw.get("name", ""))
            super().__init__(*a, **kw)

    monkeypatch.setattr(threading, "Thread", SpyThread)

    # regular file within the cap -> preload, no iq-upload thread
    p = DemodPipeline(PipelineConfig(batch_buffers=2), clock=lambda: NOW)
    with open(modes1_path, "rb") as f:
        out = b"".join(p.stream_raw_device(f))
    assert out == golden
    assert "iq-upload" not in spawned

    # cap forced to 0 -> streaming path on the very same file
    monkeypatch.setenv("DUMP1090_TPU_PRELOAD_BYTES", "0")
    p2 = DemodPipeline(PipelineConfig(batch_buffers=2), clock=lambda: NOW)
    with open(modes1_path, "rb") as f:
        out2 = b"".join(p2.stream_raw_device(f))
    assert out2 == golden
    assert "iq-upload" in spawned
    assert p.stats == p2.stats

    # preload="off" (the --tpu-preload escape hatch) -> streaming path even
    # with the cap back at its default
    monkeypatch.delenv("DUMP1090_TPU_PRELOAD_BYTES", raising=False)
    spawned.clear()
    p3 = DemodPipeline(
        PipelineConfig(batch_buffers=2, preload="off"), clock=lambda: NOW
    )
    with open(modes1_path, "rb") as f:
        out3 = b"".join(p3.stream_raw_device(f))
    assert out3 == golden
    assert "iq-upload" in spawned
    assert p.stats == p3.stats

    # preload="staged" -> first group synchronous, tail on its own thread
    spawned.clear()
    p4 = DemodPipeline(
        PipelineConfig(batch_buffers=2, preload="staged"), clock=lambda: NOW
    )
    with open(modes1_path, "rb") as f:
        out4 = b"".join(p4.stream_raw_device(f))
    assert out4 == golden
    assert "iq-upload-tail" in spawned
    assert p.stats == p4.stats

    # non-seekable source (no usable fileno) -> streaming path too
    import io

    spawned.clear()
    raw = open(modes1_path, "rb").read()
    monkeypatch.delenv("DUMP1090_TPU_PRELOAD_BYTES", raising=False)
    p3 = DemodPipeline(PipelineConfig(batch_buffers=2), clock=lambda: NOW)
    out3 = b"".join(p3.stream_raw_device(io.BytesIO(raw)))
    assert out3 == golden
    assert "iq-upload" in spawned


def test_packed_split_interleave_matches_unpacked(modes1_path, golden_dir):
    """The packed wire format (split short/long arrays + rank-carried
    re-interleave) must reconstruct the exact emission stream of the
    unpacked path — and the golden raw bytes."""
    import jax
    import jax.numpy as jnp

    from dump1090_tpu.native import raw_lines_from_fields
    from dump1090_tpu.ops.resolve import demod_resolve_batch, interleave_packed

    bufs = _modes1_buffers(modes1_path)
    state = (
        jnp.zeros(ICAO_CACHE_LEN, jnp.int32),
        jnp.zeros(ICAO_CACHE_LEN, jnp.int32),
    )
    outs = demod_resolve_batch(
        jnp.asarray(bufs), state[0], state[1], NOW, True, False,
        scan_len=SCAN, max_candidates=256, max_out_short=512,
        max_out_long=512, crcok_only=True, packed=True,
    )
    count, clong, shorts, longs, stats = jax.device_get(list(outs[1:6]))
    msg, bits = interleave_packed(count, clong, shorts, longs)
    lines = raw_lines_from_fields(msg, bits, np.ones(msg.shape[0], bool))
    assert lines == (golden_dir / "golden_raw.txt").read_bytes()

    # and field-for-field against the unpacked emission stream
    _, meta_u, msg_u, _, _ = _device_resolve(bufs, crcok_only=True)
    assert msg.shape[0] == len(meta_u)
    for i in range(msg.shape[0]):
        want_bits = 112 if meta_u[i] & META_LONG else 56
        assert bits[i] == want_bits
        assert bytes(msg[i, : want_bits // 8]) == bytes(
            msg_u[i, : want_bits // 8]
        )


def test_two_bit_fix_corner_all_backends(tmp_path):
    """Aggressive-mode 2-bit correction (zero occurrences in modes1, so no
    golden covers it): synthetic frames with 0/1/2 flipped bits through the
    device path vs the host pipeline — two_bits_fix engages and the decoded
    sets match."""
    import io

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig
    from dump1090_tpu.utils.synth import frame_to_iq, make_df17_frame

    rng = np.random.default_rng(11)
    chunks = []
    for k in range(30):
        f = bytearray(make_df17_frame(0x400000 + k, metype=11))
        for p in rng.choice(range(5, 112), k % 3, replace=False):
            f[p >> 3] ^= 1 << (7 - (p & 7))
        chunks.append(frame_to_iq(bytes(f), amplitude=90, noise_sigma=2.0,
                                  phase=float(rng.uniform(0, 6.28)),
                                  pad_before=3000, pad_after=3000, rng=rng))
    stream = np.concatenate(chunks)
    pad = -(-len(stream) // (256 * 1024)) * (256 * 1024) - len(stream)
    stream = np.concatenate([stream, np.full(pad, 127, np.uint8)]).tobytes()

    cfg = DecoderConfig(aggressive=True)
    pd = DemodPipeline(PipelineConfig(decoder=cfg, batch_buffers=4))
    dev = b"".join(pd.stream_raw_device(io.BytesIO(stream)))
    ph = DemodPipeline(PipelineConfig(decoder=cfg, batch_buffers=4))
    host = []
    ph.run(io.BytesIO(stream),
           lambda m: host.append(f"*{m.msg[:m.msgbits // 8].hex()};")
           if m.crcok else None)
    assert dev.decode().split() == host
    assert pd.stats.two_bits_fix > 0
    assert pd.stats == ph.stats


def test_grouped_dispatch_matches_ungrouped(modes1_path, golden_dir):
    """dispatch_groups > 1 (the sustained-throughput protocol: G batches
    per program, one fetch per group) must match the per-batch pipeline:
    golden raw stream, stats, and the full message stream."""
    import dataclasses
    import io

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    data = modes1_path.read_bytes()
    golden = (golden_dir / "golden_raw.txt").read_bytes()

    pg = DemodPipeline(
        PipelineConfig(batch_buffers=1, dispatch_groups=3), clock=lambda: NOW
    )
    out = b"".join(pg.stream_raw_device(io.BytesIO(data)))
    assert out == golden
    assert (pg.stats.valid_preamble, pg.stats.goodcrc) == (415, 211)

    # messages path, grouped vs ungrouped
    pg2 = DemodPipeline(
        PipelineConfig(batch_buffers=2, dispatch_groups=2), clock=lambda: NOW
    )
    grouped = []
    pg2.run_device(io.BytesIO(data), grouped.append)
    p1 = DemodPipeline(
        PipelineConfig(batch_buffers=2, dispatch_groups=1), clock=lambda: NOW
    )
    single = []
    p1.run_device(io.BytesIO(data), single.append)
    assert len(grouped) == len(single) > 0
    for a, b in zip(grouped, single):
        assert dataclasses.asdict(a) == dataclasses.asdict(b)
    assert pg2.stats == p1.stats


def test_dispatch_ahead_depth_overflow_replay(modes1_path, golden_dir):
    """With the auto depth-3 fetch queue (seekable sources, round 5),
    candidate-overflow sticky growth must replay EVERY in-flight group from
    the pre-overflow cache state: a tiny max_candidates forces growth on
    the first dense group while later groups are already dispatched with
    the stale shapes.  Output must stay byte-identical to the golden, and
    explicit depths 1 and 3 must agree."""
    import io

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    data = modes1_path.read_bytes()
    golden = (golden_dir / "golden_raw.txt").read_bytes()
    outs = {}
    for depth in (0, 1, 3):  # 0 = auto (BytesIO is seekable -> 3)
        p = DemodPipeline(
            PipelineConfig(batch_buffers=1, dispatch_groups=1,
                           max_candidates=16, dispatch_ahead=depth),
            clock=lambda: NOW,
        )
        outs[depth] = b"".join(p.stream_raw_device(io.BytesIO(data)))
        assert p._mc > 16, "sticky growth should have fired"
    assert outs[0] == outs[1] == outs[3] == golden


def test_group_uint16_wire_matches_uint8(modes1_path):
    """The uint16 IQ-pair upload form (zero-copy host view, the product
    wire since round 5 — see _group_front) is bit-identical to the uint8
    form across every output: frames, ranks, counts, stats, cache."""
    import jax
    import jax.numpy as jnp

    from dump1090_tpu.ops.resolve import demod_resolve_group

    bufs = _modes1_buffers(modes1_path)  # modes1 = 2 buffers
    xg = bufs.reshape(2, 1, -1)  # (G=2, NB=1, nbytes) uint8
    kw = dict(scan_len=SCAN, max_candidates=256, max_out_short=512,
              max_out_long=512, crcok_only=True, packed=True)
    ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    out8 = demod_resolve_group(
        jnp.asarray(xg), ca, ct, NOW, True, False, **kw)
    out16 = demod_resolve_group(
        jnp.asarray(xg.view("<u2")), ca, ct, NOW, True, False, **kw)
    for a, b in zip(jax.device_get(list(out8)), jax.device_get(list(out16))):
        np.testing.assert_array_equal(a, b)


def test_normalize_max_candidates():
    """mc values past RESOLVE_CHUNK must tile exactly into chunk-sized grid
    steps; arbitrary user values / sticky-growth products (300*4*4=4800) are
    rounded up instead of crashing _chunk_geometry mid-decode."""
    from dump1090_tpu.ops.resolve import (
        RESOLVE_CHUNK,
        normalize_max_candidates,
    )

    for mc in (1, 64, 300, RESOLVE_CHUNK):
        assert normalize_max_candidates(mc) == mc
    assert normalize_max_candidates(4800) == 3 * RESOLVE_CHUNK
    assert normalize_max_candidates(5120) == 3 * RESOLVE_CHUNK
    assert normalize_max_candidates(4 * RESOLVE_CHUNK) == 4 * RESOLVE_CHUNK


def test_clamp_packed_out():
    """The packed short-row rank is 16-bit: allocations are shaved (never
    below the exact overflow counts) so one batch can't emit aliased ranks,
    and impossible exact needs raise instead of truncating."""
    from dump1090_tpu.ops.resolve import PACKED_RANK_LIMIT, clamp_packed_out

    assert clamp_packed_out(2048, 2048) == (2048, 2048)
    mos, mol = clamp_packed_out(40_000, 50_000)
    assert mos + mol == PACKED_RANK_LIMIT and mos == 40_000
    mos, mol = clamp_packed_out(40_000, 50_000, 30_000, 30_000)
    assert mos + mol <= PACKED_RANK_LIMIT
    assert mos >= 30_000 and mol >= 30_000
    with pytest.raises(ValueError):
        clamp_packed_out(70_000, 70_000, 40_000, 30_000)


def test_packed_rank_cap_enforced_at_entry(modes1_path):
    """demod_resolve_group(packed=True) refuses allocations whose combined
    width exceeds the 16-bit rank field (silent wrap would corrupt the host
    re-interleave)."""
    import jax.numpy as jnp

    from dump1090_tpu.ops.resolve import demod_resolve_group

    bufs = _modes1_buffers(modes1_path)[:1]
    ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    with pytest.raises(ValueError, match="rank"):
        demod_resolve_group(
            jnp.asarray(bufs[None]), ca, ct, NOW, True, False,
            scan_len=SCAN, max_candidates=64,
            max_out_short=40_000, max_out_long=30_000, packed=True,
        )


def test_group_smem_budget_guard_and_cap():
    """The group path refuses Pallas dispatch shapes whose window-gather
    prefetch exceeds SMEM (a trace-time ValueError beats a mid-decode
    Mosaic failure), and max_candidates_cap names the largest valid mc for
    a batch size (chunk-valid above RESOLVE_CHUNK)."""
    import jax.numpy as jnp

    from dump1090_tpu.ops.resolve import (
        RESOLVE_CHUNK,
        SMEM_PREFETCH_BUDGET,
        demod_resolve_group,
        max_candidates_cap,
        streams_dispatch_shape,
    )

    cap64 = max_candidates_cap(64)
    assert 64 * cap64 * 4 <= SMEM_PREFETCH_BUDGET
    assert cap64 <= RESOLVE_CHUNK or cap64 % RESOLVE_CHUNK == 0
    assert max_candidates_cap(1) >= RESOLVE_CHUNK

    ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    xg = jnp.zeros((1, 64, 16), jnp.uint8)  # guard fires before any demod
    with pytest.raises(ValueError, match="SMEM"):
        demod_resolve_group(
            xg, ca, ct, NOW, True, False,
            scan_len=SCAN, max_candidates=4096, pallas=True,
        )

    # the streams tiling fallback raises loudly when even a single buffer
    # cannot fit, instead of silently violating the budget
    with pytest.raises(OverflowError):
        streams_dispatch_shape(1, 1, SMEM_PREFETCH_BUDGET)


def test_adapt_down_does_not_replay_inflight_group(modes1_path):
    """Quiet air shrinks the dispatch shapes while the next (denser) group
    is already in flight with the LARGER shapes; overflow validation must
    compare against the shapes that group was dispatched with — a group
    that fit its own allocation is never replayed."""
    import jax

    import dump1090_tpu.ops.resolve as R
    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    bufs = _modes1_buffers(modes1_path)
    quiet = np.full_like(bufs[0], 127)
    seen = {"calls": 0, "n_peak": 0}
    real = R.demod_resolve_group

    def counting(xg, *a, **k):
        seen["calls"] += 1
        out = real(xg, *a, **k)
        seen["n_peak"] = max(seen["n_peak"], int(jax.device_get(out[0]).max()))
        return out

    # dispatch order with groups of one buffer: q1 / q2 f(q1) / q3 f(q2) /
    # m1 f(q3): the third quiet finish shrinks mc 256->64 AFTER the dense
    # buffer (>64 candidates) was dispatched at 256
    import unittest.mock as mock

    with mock.patch.object(R, "demod_resolve_group", counting):
        p = DemodPipeline(
            PipelineConfig(batch_buffers=1, dispatch_groups=1),
            clock=lambda: NOW,
        )
        got = []
        p.run_device(None, got.append, buffers=[quiet, quiet, quiet, bufs[0]])
    assert seen["n_peak"] > 64  # the dense group really exceeded shrunk mc
    assert seen["calls"] == 4  # one dispatch per group, no spurious replay

    p1 = DemodPipeline(
        PipelineConfig(batch_buffers=1, dispatch_groups=1), clock=lambda: NOW
    )
    solo = []
    p1.run_device(None, solo.append, buffers=[bufs[0]])
    assert [(m.msg, m.crcok) for m in got] == [(m.msg, m.crcok) for m in solo]
