"""Unit tests for the TPU demodulation kernels (contract: dump1090.c:1563-1793)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dump1090_tpu.constants import FULL_LEN_SAMPLES
from dump1090_tpu.ops import demod as D


def _scalar_slice(msg_samples):
    """Direct scalar transcription of the bit-slice rules
    (dump1090.c:1669-1706) for differential testing."""
    bits = np.zeros(112, dtype=np.int32)
    errors = 0
    for i in range(0, 224, 2):
        low, high = int(msg_samples[i]), int(msg_samples[i + 1])
        delta = abs(low - high)
        if i > 0 and delta < 256:
            bits[i // 2] = bits[i // 2 - 1]
        elif low == high:
            bits[i // 2] = 2
            if i < 112:
                errors += 1
        elif low > high:
            bits[i // 2] = 1
        else:
            bits[i // 2] = 0
    msg = np.zeros(14, dtype=np.uint8)
    for i in range(0, 112, 8):
        acc = 0
        for t in range(8):
            acc |= int(bits[i + t]) << (7 - t)
        msg[i // 8] = acc & 0xFF
    return msg, errors


def _scalar_phase(w):
    """Direct scalar transcription of applyPhaseCorrection
    (dump1090.c:1471-1558)."""
    w = w.astype(np.int64)
    on_time = w[1] + w[3] + w[8] + w[10]
    early = (w[0] + w[7]) * 2
    late = (w[4] + w[11]) * 2
    m = w[17:241].copy()

    def scale(v, f):
        return min(v * f // 16384, 65535)

    if early > late:
        up = 16384 + 16384 * early // (early + on_time)
        down = 16384 - 16384 * early // (early + on_time)
        m[223] = scale(m[223], up)
        for j in range(238, 16, -2):
            mj = j - 16
            f = down if m[mj] > m[mj + 1] else up
            m[mj - 1] = scale(m[mj - 1], f)
    else:
        up = 16384 + 16384 * late // (late + on_time)
        down = 16384 - 16384 * late // (late + on_time)
        m[0] = scale(m[0], up)
        for j in range(16, 238, 2):
            mj = j - 16
            f = up if m[mj] > m[mj + 1] else down
            m[mj + 2] = scale(m[mj + 2], f)
    return m


@pytest.mark.parametrize("seed", range(4))
def test_slice_window_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    # mix of strong bits, weak (repeat-rule) cells, and exact-equal cells
    samples = rng.integers(0, 65168, 224, dtype=np.int64)
    weak = rng.random(112) < 0.3
    samples[1::2] = np.where(weak, samples[0::2] + rng.integers(-255, 256, 112),
                             samples[1::2])
    samples = np.clip(samples, 0, 65167)
    eq = rng.random(112) < 0.05
    samples[1::2] = np.where(eq, samples[0::2], samples[1::2])
    msg_ref, err_ref = _scalar_slice(samples)
    msg, err, df = D._slice_window(jnp.asarray(samples, dtype=jnp.int32))
    assert bytes(np.asarray(msg)) == bytes(msg_ref)
    assert int(err) == err_ref
    assert int(df) == msg_ref[0] >> 3


@pytest.mark.parametrize("seed", range(4))
def test_phase_correction_matches_scalar(seed):
    rng = np.random.default_rng(100 + seed)
    w = rng.integers(0, 65168, 241, dtype=np.int64)
    ref = _scalar_phase(w)
    mine = np.asarray(D._phase_corrected_window(jnp.asarray(w, dtype=jnp.int32)))
    assert (mine == ref).all()


def test_preamble_mask_geometry():
    # craft one clean preamble at position 100 in a quiet buffer
    m = np.zeros(1000, dtype=np.int32)
    hi = 10000
    for k in (0, 2, 7, 9):
        m[100 + k] = hi
    mask = np.asarray(D.preamble_mask(jnp.asarray(m), 1000 - FULL_LEN_SAMPLES))
    assert mask[100]
    assert mask.sum() == 1


def test_demod_block_candidate_compaction():
    m = np.zeros(2000, dtype=np.int32)
    for pos in (100, 600, 1100):
        for k in (0, 2, 7, 9):
            m[pos + k] = 10000
    cand = D.demod_block(jnp.asarray(m), scan_len=2000 - FULL_LEN_SAMPLES,
                         max_candidates=8)
    assert int(cand.n) == 3
    assert list(np.asarray(cand.pos[:3])) == [100, 600, 1100]
    # remaining slots are fill
    assert (np.asarray(cand.pos[3:]) == 2000 - FULL_LEN_SAMPLES).all()


def test_compact_positions_degenerate_level():
    """max_candidates > n_grp engages the flat per-position top_k inside
    compact_positions_from_bytes (tiny-shard geometry); result must equal
    plain nonzero + pad."""
    rng = np.random.default_rng(3)
    for scan_len in (5, 40, 97):
        mask = rng.random(scan_len) < 0.3
        mc = scan_len + 7  # > n_grp*? ensures the degenerate branch for small scan_len
        got = np.asarray(D.compact_positions(jnp.asarray(mask), mc, scan_len))
        want = np.flatnonzero(mask)
        assert list(got[: len(want)]) == list(want)
        assert (got[len(want):] == scan_len).all()


def test_demod_batch_front_variants_identical():
    """Every front formulation (mask / packed / packed-mxu / packed-plain /
    packed-plain-mxu) must produce bit-identical Candidates on real traffic
    and on dense noise (which stresses the padded tail + empty groups)."""
    from dump1090_tpu.constants import BUF_SAMPLES
    from dump1090_tpu.parallel.sharding import demod_batch, overlapping_buffers

    raw = np.fromfile("/root/reference/testfiles/modes1.bin", np.uint8)
    pad = np.full(476, 127, np.uint8)
    bufs = overlapping_buffers(np.concatenate([pad, raw]))[:2]
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (1, bufs.shape[1]), np.uint8)
    iq = jnp.asarray(np.concatenate([bufs, noise]))

    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
    base = demod_batch(iq, scan_len=scan_len, max_candidates=256, front="mask")
    for front in ("packed", "packed-mxu", "packed-plain", "packed-plain-mxu"):
        got = demod_batch(iq, scan_len=scan_len, max_candidates=256, front=front)
        for name, a, b in zip(base._fields, base, got):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{front}:{name}"
            )
    with pytest.raises(ValueError):
        demod_batch(iq, scan_len=scan_len, max_candidates=256, front="bogus")


def test_pipeline_overflow_retry():
    """A buffer denser than max_candidates preambles is redone with more
    headroom instead of silently truncating (pipeline._resolve)."""
    import io

    import numpy as np

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig
    from dump1090_tpu.utils.synth import frame_to_iq, make_df17_frame

    frames = [make_df17_frame(addr=0x100000 + k, metype=4) for k in range(40)]
    spacing = 1000 * 2  # 1000 samples apart: 40 candidates within one buffer
    stream = np.full(40 * spacing + 4000, 127, dtype=np.uint8)
    for k, f in enumerate(frames):
        iq = frame_to_iq(f, amplitude=90.0, pad_before=0, pad_after=0)
        stream[k * spacing : k * spacing + len(iq)] = iq

    def run(mc):
        p = DemodPipeline(PipelineConfig(max_candidates=mc), clock=lambda: 1000)
        out = []
        p.run(io.BytesIO(stream.tobytes()), out.append)
        return sorted(m.addr for m in out if m.crcok)

    big = run(256)      # plenty of headroom: no retry path
    tiny = run(16)      # forces the overflow retry (40 > 16)
    assert tiny == big
    assert len(big) >= 40


def test_batched_stream_matches_unbatched():
    """batch_buffers>1 (the file fast path) must emit the identical message
    stream, stats, and order as single-buffer streaming, including the
    silence padding of a short final batch and per-row overflow retry."""
    import dataclasses
    import io

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    raw = open("/root/reference/testfiles/modes1.bin", "rb").read()

    def run(batch, mc=256):
        p = DemodPipeline(
            PipelineConfig(batch_buffers=batch, max_candidates=mc),
            clock=lambda: 1000,
        )
        out = []
        p.run(io.BytesIO(raw), out.append)
        return out, p.stats

    a, sa = run(1)
    b, sb = run(4)          # 3 real buffers -> one padded batch
    c, sc = run(2)          # split batches
    d, sd = run(4, mc=16)   # forces the per-row overflow retry
    assert sa == sb == sc == sd
    for other in (b, c, d):
        assert len(a) == len(other)
        for x, y in zip(a, other):
            assert dataclasses.asdict(x) == dataclasses.asdict(y)


def test_overflow_retry_is_sticky():
    """After one overflow the session adopts the larger candidate shape, so
    sustained dense traffic does not retry per buffer."""
    import io

    import numpy as np

    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig
    from dump1090_tpu.utils.synth import frame_to_iq, make_df17_frame

    frames = [make_df17_frame(addr=0x200000 + k, metype=4) for k in range(40)]
    spacing = 1000 * 2
    one_buf = np.full(40 * spacing + 4000, 127, dtype=np.uint8)
    for k, f in enumerate(frames):
        iq = frame_to_iq(f, amplitude=90.0, pad_before=0, pad_after=0)
        one_buf[k * spacing : k * spacing + len(iq)] = iq

    cfg = PipelineConfig(max_candidates=16)
    p = DemodPipeline(cfg, clock=lambda: 1000)
    out = []
    p.run(io.BytesIO(one_buf.tobytes()), out.append)
    assert p._mc >= 64           # grew and stuck on the instance...
    assert cfg.max_candidates == 16  # ...without mutating the shared config
    assert len({m.addr for m in out if m.crcok}) >= 40
