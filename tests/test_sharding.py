"""Multi-device sharding tests on a virtual 8-device CPU mesh.

Checks the overlap-save halo exchange (jax.lax.ppermute) yields candidates
identical to an unsharded scan — no message lost or duplicated at shard
boundaries (SURVEY §2.5, §5)."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dump1090_tpu.constants import FULL_LEN_SAMPLES
from dump1090_tpu.io.sources import iq_buffers
from dump1090_tpu.ops.demod import demod_block
from dump1090_tpu.ops.magnitude import magnitude_from_iq
from dump1090_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def mag131072(modes1_path):
    with open(modes1_path, "rb") as f:
        buf = next(iq_buffers(f))
    m = np.asarray(magnitude_from_iq(jnp.asarray(buf)))
    return m[: 8 * 16384]  # 131072 samples, divisible by 8 shards


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs 8 devices (virtual CPU mesh; real TPU here has 1 chip)",
)


def test_requires_8_devices():
    """On CPU runs the virtual 8-device mesh is part of the contract (a
    misconfigured conftest must fail loudly, not skip the whole sharding
    suite); on the real chip (DUMP1090_TEST_TPU) device count is hardware."""
    import os

    if os.environ.get("DUMP1090_TEST_TPU"):
        pytest.skip("real TPU: device count is whatever the slice has")
    assert len(jax.devices()) >= 8


@needs_8
def test_time_sharded_candidates_match_unsharded(mag131072):
    n_dev = 8
    T = mag131072.shape[0] // n_dev
    mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(1, n_dev), ("dp", "sp"))
    fn = sh.make_sharded_demod(mesh, shard_samples=T, max_candidates=128)
    cand = jax.device_get(fn(jnp.asarray(mag131072[None, :])))
    n, merged = sh.merge_sharded_candidates(cand, scan_total=8 * T)

    # unsharded ground truth: same vector extended with 240 zero samples so
    # every position [0, 8T) is scanned
    ext = np.concatenate([mag131072, np.zeros(FULL_LEN_SAMPLES, np.int32)])
    ref = demod_block(jnp.asarray(ext), scan_len=8 * T, max_candidates=1024)
    nref = int(ref.n)
    assert n == nref and n > 50  # the fixture has plenty of preambles

    assert list(merged.pos) == list(np.asarray(ref.pos)[:nref])
    np.testing.assert_array_equal(merged.msg1, np.asarray(ref.msg1)[:nref])
    np.testing.assert_array_equal(merged.errors1, np.asarray(ref.errors1)[:nref])
    np.testing.assert_array_equal(merged.gate1, np.asarray(ref.gate1)[:nref])
    np.testing.assert_array_equal(merged.msg2, np.asarray(ref.msg2)[:nref])
    np.testing.assert_array_equal(merged.errors2, np.asarray(ref.errors2)[:nref])
    np.testing.assert_array_equal(merged.gate2, np.asarray(ref.gate2)[:nref])


@needs_8
def test_boundary_straddling_preamble_not_lost():
    """A frame planted exactly across a shard boundary must be found by the
    left shard via its right halo."""
    n_dev = 4
    T = 4096
    m = np.zeros(n_dev * T, dtype=np.int32)
    pos = T - 7  # preamble straddles the first shard boundary
    for k in (0, 2, 7, 9):
        m[pos + k] = 20000
    mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(1, n_dev), ("dp", "sp"))
    fn = sh.make_sharded_demod(mesh, shard_samples=T, max_candidates=16)
    cand = jax.device_get(fn(jnp.asarray(m[None, :])))
    n, merged = sh.merge_sharded_candidates(cand, scan_total=n_dev * T)
    assert n == 1
    assert merged.pos[0] == pos


@needs_8
def test_batch_sharded_buffers(mag131072, modes1_path):
    """Data-parallel buffer batching: overlapping strided view + vmapped
    demod equals the sequential per-buffer pipeline."""
    from dump1090_tpu.constants import BLOCK_SAMPLES, BUF_SAMPLES

    raw = np.fromfile(modes1_path, dtype=np.uint8)
    # prepend the initial 476-byte silence carry, like the reference reader
    stream = np.concatenate([np.full(476, 127, np.uint8), raw])
    bufs = sh.overlapping_buffers(stream)
    assert bufs.shape[1] == BUF_SAMPLES * 2
    cand = jax.device_get(
        sh.demod_batch(
            jnp.asarray(bufs),
            scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
            max_candidates=512,
        )
    )
    # buffer 0 must equal the streaming pipeline's buffer 0
    with open(modes1_path, "rb") as f:
        buf0 = next(iq_buffers(f))
    ref = jax.device_get(
        demod_block(
            magnitude_from_iq(jnp.asarray(buf0)),
            scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
            max_candidates=512,
        )
    )
    assert int(cand.n[0]) == int(ref.n)
    np.testing.assert_array_equal(cand.pos[0], ref.pos)
    np.testing.assert_array_equal(cand.msg1[0], ref.msg1)
    np.testing.assert_array_equal(cand.msg2[0], ref.msg2)


@needs_8
def test_multihost_helpers_single_process():
    """global_mesh + shard_timeline wire a (dp, sp) mesh end-to-end with the
    time-sharded demod (single process over the virtual 8-device mesh)."""
    import numpy as np

    from dump1090_tpu.parallel import multihost
    from dump1090_tpu.parallel.sharding import make_sharded_demod

    assert multihost.initialize_from_env() is False  # no coordinator env set
    mesh = multihost.global_mesh(dp=2, sp=4)
    assert mesh.shape == {"dp": 2, "sp": 4}

    shard = 1024
    rng = np.random.default_rng(0)
    mag = rng.integers(0, 60000, (2, 4 * shard), dtype=np.int32)
    x = multihost.shard_timeline(mag, mesh)
    fn = make_sharded_demod(mesh, shard_samples=shard, max_candidates=64)
    cand = fn(x)
    assert cand.pos.shape == (2, 4 * 64)


@needs_8
def test_sharded_merge_resolves_to_messages(modes1_path):
    """Full multi-chip path to MESSAGES: time-sharded demod -> host merge ->
    sequential resolver equals the unsharded single-scan of the same
    timeline (positions, payloads, and stats)."""
    from dump1090_tpu.models.decoder import DecoderConfig, DecoderStats, IcaoCache
    from dump1090_tpu.models.resolver import resolve_block
    from dump1090_tpu.ops.demod import demod_block

    m = None
    with open(modes1_path, "rb") as f:
        buf = next(iq_buffers(f))
    m = np.asarray(magnitude_from_iq(jnp.asarray(buf)))[: 8 * 16384]

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8), ("dp", "sp"))
    fn = sh.make_sharded_demod(mesh, shard_samples=16384, max_candidates=128)
    cand = fn(jnp.asarray(m[None]))
    n, merged = sh.merge_sharded_candidates(cand, scan_total=len(m))

    def run(bc):
        cache, stats = IcaoCache(clock=lambda: 1000), DecoderStats()
        out = []
        resolve_block(bc, cache, DecoderConfig(), stats, out.append)
        return out, stats

    a, sa = run(merged)

    # unsharded oracle: single scan over the same timeline
    from dump1090_tpu.models.resolver import BlockCandidates

    single = demod_block(
        jnp.asarray(np.concatenate([m, np.zeros(240, np.int32)]).astype(np.int32)),
        scan_len=len(m), max_candidates=1024,
    )
    b, sb = run(BlockCandidates.from_device(single))
    assert sa == sb
    assert [x.msg for x in a] == [x.msg for x in b]
    assert len(a) > 0


@needs_8
def test_decode_capture_sharded_bit_identical(modes1_path, golden_dir):
    """The productized multi-chip path (api.decode_capture_sharded, CLI
    --tpu-shard-time): reference buffers on dp, per-buffer timeline sharded
    over sp with halo exchange + real-tail halo, host merge + sequential
    resolve.  Must be bit-identical to the unsharded pipeline: same message
    stream (golden 217 usable), same stats."""
    from dump1090_tpu.api import decode_capture, decode_capture_sharded
    from dump1090_tpu.models.decoder import DecoderStats

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    st = DecoderStats()
    sharded = decode_capture_sharded(str(modes1_path), mesh=mesh, stats=st)
    unsharded = decode_capture(str(modes1_path))
    assert [(m.msg, m.crcok, m.phase_corrected) for m in sharded] == [
        (m.msg, m.crcok, m.phase_corrected) for m in unsharded
    ]
    lines = [f"*{m.msg[:m.msgbits // 8].hex()};" for m in sharded if m.crcok]
    golden = (golden_dir / "golden_raw.txt").read_text().split()
    assert lines == golden
    assert (st.valid_preamble, st.out_of_phase, st.demodulated, st.goodcrc,
            st.badcrc, st.fixed) == (415, 216, 407, 211, 196, 6)


def test_shard_time_flag_parses():
    from dump1090_tpu.cli import parse_args

    assert parse_args(["--tpu-shard-time", "8"]).shard_time == 8
    assert parse_args([]).shard_time is None


@needs_8
def test_demod_resolve_batch_dp_sharded(modes1_path):
    """The flagship fused demod+resolve program accepts a dp-sharded batch
    (XLA GSPMD partitions the demodulation across the mesh; the sequential
    resolve stage gathers) and produces identical emissions and stats."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dump1090_tpu.constants import (
        BUF_SAMPLES,
        FULL_LEN_SAMPLES,
        ICAO_CACHE_LEN,
    )
    from dump1090_tpu.ops.resolve import demod_resolve_batch

    raw = np.fromfile(modes1_path, dtype=np.uint8)
    stream = np.concatenate([np.full(476, 127, np.uint8), raw, raw, raw])
    bufs = np.asarray(sh.overlapping_buffers(stream))[:8]

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    x_sh = jax.device_put(jnp.asarray(bufs), NamedSharding(mesh, P("dp", None)))
    ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    kw = dict(scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES, max_candidates=256,
              max_out=4096, crcok_only=False)
    out_sh = demod_resolve_batch(x_sh, ca, ct, 1000, True, False, **kw)
    out_un = demod_resolve_batch(jnp.asarray(bufs), ca, ct, 1000, True, False, **kw)
    h_sh = jax.device_get(list(out_sh[:5]))
    h_un = jax.device_get(list(out_un[:5]))
    assert int(h_sh[1]) > 1000  # n, count, msg, meta, stats all equal
    for a, b in zip(h_sh, h_un):
        np.testing.assert_array_equal(a, b)


@needs_8
def test_decode_capture_sharded_device_resolve(modes1_path, golden_dir):
    """The sharded path with the sequential replay ON DEVICE
    (ops.resolve.resolve_candidate_segments over per-shard candidate
    segments, skip reset per ROW not per segment): full field equality and
    stats vs the host-resolve sharded path."""
    import dataclasses

    from dump1090_tpu.api import decode_capture_sharded
    from dump1090_tpu.models.decoder import DecoderStats

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    st_d = DecoderStats()
    dev = decode_capture_sharded(
        str(modes1_path), mesh=mesh, stats=st_d, device_resolve=True
    )
    st_h = DecoderStats()
    host = decode_capture_sharded(
        str(modes1_path), mesh=mesh, stats=st_h, device_resolve=False
    )
    assert len(dev) == len(host) > 0
    for a, b in zip(dev, host):
        assert dataclasses.asdict(a) == dataclasses.asdict(b)
    assert st_d == st_h
    lines = [f"*{m.msg[:m.msgbits // 8].hex()};" for m in dev if m.crcok]
    golden = (golden_dir / "golden_raw.txt").read_text().split()
    assert lines == golden


@needs_8
def test_decode_capture_sharded_device_resolve_overflow_retry(modes1_path):
    """Tiny shapes force BOTH overflow kinds through the device-resolve
    sharded path (per-shard candidates and emitted messages); sticky growth
    must retry from the pre-group cache state and stay bit-identical."""
    from dump1090_tpu.api import decode_capture_sharded
    from dump1090_tpu.models.decoder import DecoderStats

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    data = Path(str(modes1_path)).read_bytes()[: 2 * 262144]
    st_d = DecoderStats()
    # max_candidates=16 overflows (dense shards), and the device path's
    # initial max_out is forced down via a tiny capture decode
    dev = decode_capture_sharded(
        data, mesh=mesh, stats=st_d, device_resolve=True, max_candidates=16
    )
    st_h = DecoderStats()
    host = decode_capture_sharded(
        data, mesh=mesh, stats=st_h, device_resolve=False, max_candidates=16
    )
    assert [(m.msg, m.crcok) for m in dev] == [(m.msg, m.crcok) for m in host]
    assert st_d == st_h


@needs_8
def test_decode_capture_sharded_nonmultiple_max_candidates(modes1_path):
    """A user max_candidates that is neither <= RESOLVE_CHUNK nor a chunk
    multiple (2500) must be normalized at entry so the device-resolve
    kernel geometry stays valid (growth products like 300->4800 are
    likewise rounded at the sticky-growth sites)."""
    from dump1090_tpu.api import decode_capture_sharded
    from dump1090_tpu.models.decoder import DecoderStats

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    data = Path(str(modes1_path)).read_bytes()[: 2 * 262144]
    st_d = DecoderStats()
    dev = decode_capture_sharded(
        data, mesh=mesh, stats=st_d, device_resolve=True, max_candidates=2500
    )
    st_h = DecoderStats()
    host = decode_capture_sharded(
        data, mesh=mesh, stats=st_h, device_resolve=False, max_candidates=256
    )
    assert [(m.msg, m.crcok) for m in dev] == [(m.msg, m.crcok) for m in host]
    assert st_d == st_h
