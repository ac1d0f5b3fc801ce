"""Multi-device demodulation: mesh sharding with overlap-save halo exchange.

The reference is strictly single-core; its only "parallel" concept is the
476-byte carry that lets a frame straddle two sequential reads
(dump1090.c:326-331, 447-451).  On a TPU slice the same overlap-save idea
becomes a *halo exchange*: shard the magnitude timeline over a mesh axis and
ppermute each shard's leading edge to its left neighbor, so every scan
position is owned by exactly one shard and every candidate window (240
samples + 1 leading sample for phase correction) is locally available.

Two parallel modes:

  * batch sharding (`demod_batch`): a long capture is viewed as overlapping
    reference-geometry buffers (zero-copy strided view on the host) and the
    buffer axis is sharded over the mesh — data parallelism that preserves
    the reference's per-buffer scan semantics bit-exactly.

  * time sharding (`demod_sharded`): one long magnitude vector is split over
    the mesh's "sp" axis; halos move over ICI via jax.lax.ppermute.  Each
    shard owns scan positions [k*T, (k+1)*T); candidates are identical to an
    unsharded scan of the whole vector (verified in tests on a virtual
    8-device CPU mesh).

The sequential skip/ICAO replay (models/resolver.py) is global and runs on
the host over the merged candidate stream, so shard boundaries never lose or
duplicate messages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import BLOCK_SAMPLES, BUF_SAMPLES, CARRY_SAMPLES, FULL_LEN_SAMPLES
from ..ops.demod import (
    WINDOW,
    Candidates,
    candidate_passes_window,
    compact_positions,
    preamble_mask,
)
from ..ops.magnitude import magnitude_from_iq, magnitude_from_pairs

HALO = FULL_LEN_SAMPLES  # 240 samples from the right neighbor


def overlapping_buffers(iq: np.ndarray) -> np.ndarray:
    """View a flat IQ byte stream as (n_buffers, BUF_SAMPLES*2) overlapping
    reference-geometry buffers without copying (the 476-byte carry becomes a
    strided overlap).  The stream must start with the 476-byte initial
    silence region (callers prepend 127s)."""
    buf_bytes = BUF_SAMPLES * 2
    step = BLOCK_SAMPLES * 2
    n = (len(iq) - buf_bytes) // step + 1
    if n <= 0:
        raise ValueError("capture shorter than one buffer")
    return np.lib.stride_tricks.as_strided(
        iq, shape=(n, buf_bytes), strides=(step, 1), writeable=False
    )


@functools.partial(
    jax.jit, static_argnames=("scan_len", "max_candidates", "pallas", "front")
)
def demod_batch(
    iq_buffers: jax.Array, *, scan_len: int, max_candidates: int,
    pallas: bool | None = None, front: str | None = None,
) -> Candidates:
    """Batched demodulation of (N, nbytes) uint8 IQ buffers — or the same
    wire bytes as (N, nbytes/2) uint16 little-endian I|Q<<8 pairs (host
    numpy `.view("<u2")`, zero-copy) — the single-chip throughput path
    and, with a sharded input, the data-parallel multi-chip path (shard
    the N axis; XLA partitions everything else automatically).

    `front` selects the preamble-scan formulation (ops.demod.front_variant;
    all choices bit-identical)."""
    from ..ops.demod import candidate_passes_window, front_candidates, gather_candidate_windows, use_pallas_gather

    if pallas is None:
        pallas = use_pallas_gather()

    # uint16 magnitudes end-to-end: lossless (<= 65167), half the HBM
    # traffic.  NOTE: a fused Pallas front end (magnitude + mask in one
    # VMEM pass) was prototyped and measured SLOWER than this XLA graph on
    # v5e (4.6 ms vs 2.2 ms for the front half) — streaming elementwise
    # work is where XLA's pipelining beats hand-written kernels; Pallas
    # only wins here for the candidate-window gather below.  A uint16
    # entry keeps the magnitude purely elementwise (no pair reshape for
    # XLA layout assignment to misplace — see ops.resolve._group_front).
    if iq_buffers.dtype == jnp.uint16:
        m = magnitude_from_pairs(iq_buffers, out_dtype=jnp.uint16)
    else:
        m = jax.vmap(
            lambda r: magnitude_from_iq(r, out_dtype=jnp.uint16))(iq_buffers)
    n, pos = front_candidates(m, scan_len, max_candidates, front)
    w = gather_candidate_windows(m, pos, pallas=pallas)
    outs = jax.vmap(jax.vmap(candidate_passes_window))(w, pos)
    return Candidates(n, pos, *outs)


def _shard_demod_body(m_local: jax.Array, tail: jax.Array, axis: str,
                      scan_per_shard: int, max_candidates: int,
                      scan_total: int | None, from_iq: bool = False):
    """Per-shard body for time-sharded demod.

    m_local: int32[B_loc, T] — a batch of channel rows (the batch dim may
    itself be sharded over a "dp" mesh axis; collectives below only move data
    along the time axis `axis`).  tail: int32[B_loc, HALO] — the real samples
    following the sharded timeline (a reference buffer extends 240 samples
    past its last scan position, dump1090.c:1593); replicated along `axis`,
    consumed as the LAST shard's right halo.  Exchanges halos over ICI, scans
    the owned positions [idx*T, (idx+1)*T) of every row (clipped to
    scan_total when given), and returns local candidates with stream-global
    positions.

    from_iq=True: m_local/tail arrive as raw uint8 IQ BYTES (2 per sample,
    [B_loc, 2T] / [B_loc, 2*HALO]) and each shard computes its own
    magnitudes locally — the host never touches (or re-uploads) the
    magnitude timeline, and the sharded upload is the same uint8 volume as
    the unsharded path's."""
    if from_iq:
        mag = jax.vmap(lambda r: magnitude_from_iq(r, out_dtype=jnp.int32))
        m_local = mag(m_local)
        tail = mag(tail)
    idx = lax.axis_index(axis)
    n_shards = lax.axis_size(axis)

    # Overlap-save halos, the parallel form of the reference's 476-byte carry:
    # each shard's first 240 samples travel to its left neighbor (so windows
    # reaching past the shard edge are complete), and each shard's last
    # sample travels right (phase correction reads m[pos-1]).
    right_halo = lax.ppermute(
        m_local[:, :HALO], axis,
        perm=[(j, (j - 1) % n_shards) for j in range(n_shards)],
    )
    left_halo = lax.ppermute(
        m_local[:, -1:], axis,
        perm=[(j, (j + 1) % n_shards) for j in range(n_shards)],
    )
    # the ring wraps: the first shard's left halo is silence (like the
    # reference's initial 127-filled carry region) and the last shard's
    # right halo is the row's real post-scan tail
    left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
    right_halo = jnp.where(idx == n_shards - 1, tail, right_halo)

    m_ext = jnp.concatenate([left_halo, m_local, right_halo], axis=1)  # [B,1+T+240]

    def row(m_row):
        mask = preamble_mask(m_row[1:], scan_per_shard)
        if scan_total is not None:
            # positions past the true scan range (timeline padding) are not
            # scan positions; mask them out of counts and compaction
            owned = idx * scan_per_shard + lax.iota(jnp.int32, scan_per_shard)
            mask = mask & (owned < scan_total)
        n = mask.sum().astype(jnp.int32).reshape(1)
        pos = compact_positions(mask, max_candidates, scan_per_shard)
        m_u16 = m_row.astype(jnp.uint16)

        def one(p):
            w = lax.dynamic_slice_in_dim(m_u16, p, WINDOW)
            # the pos>0 phase-correction rule (dump1090.c:1658-1663) applies
            # to the *stream-global* position: only the very first sample of
            # the timeline has no left neighbor
            return candidate_passes_window(
                w.astype(jnp.int32), idx * scan_per_shard + p
            )

        outs = jax.vmap(one)(pos)
        global_pos = jnp.where(
            pos < scan_per_shard, idx * scan_per_shard + pos, jnp.int32(2**30)
        )
        return Candidates(n, global_pos, *outs)

    return jax.vmap(row)(m_ext)


def make_sharded_demod(mesh: Mesh, *, shard_samples: int, max_candidates: int = 512,
                       time_axis: str = "sp", batch_axis: str | None = "dp",
                       scan_total: int | None = None, with_tail: bool = False,
                       from_iq: bool = False):
    """Build a jitted, mesh-sharded demod over `mesh`.

    Input: int32 magnitude [B, n_sp * shard_samples] sharded (batch_axis,
    time_axis) — or, with from_iq, raw uint8 IQ bytes [B, 2 * n_sp *
    shard_samples] (magnitudes are computed per shard) — plus, when
    with_tail, [B, HALO] (or [B, 2*HALO] IQ) of real samples following the
    timeline (the reference buffer's post-scan region).  Output: per-shard
    Candidates with stream-global positions, sharded the same way.
    scan_total clips the owned scan range when the timeline is padded to a
    multiple of the shard count."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    body = functools.partial(
        _shard_demod_body,
        axis=time_axis,
        scan_per_shard=shard_samples,
        max_candidates=max_candidates,
        scan_total=scan_total,
        from_iq=from_iq,
    )
    spec_in = P(batch_axis, time_axis)
    spec_tail = P(batch_axis, None)  # replicated along the time axis
    out_p = P(batch_axis, time_axis)
    spec_out = Candidates(
        n=out_p, pos=out_p, msg1=out_p, errors1=out_p, gate1=out_p,
        msg2=out_p, errors2=out_p, gate2=out_p,
    )
    fn = shard_map(
        body, mesh=mesh, in_specs=(spec_in, spec_tail), out_specs=spec_out
    )
    if with_tail:
        return jax.jit(fn)
    if from_iq:  # silence in IQ bytes is 127,127 (zero magnitude)
        return jax.jit(
            lambda m: fn(m, jnp.full((m.shape[0], 2 * HALO), 127, m.dtype))
        )
    return jax.jit(lambda m: fn(m, jnp.zeros((m.shape[0], HALO), m.dtype)))


def merge_sharded_rows(cand: Candidates, scan_total: int):
    """Multi-row form of merge_sharded_candidates: host-side merge of EVERY
    channel row's per-shard candidates, in row order.  Returns a list of
    (n_candidates, BlockCandidates) — one per row."""
    n_rows = np.asarray(cand.n).shape[0]
    return [
        merge_sharded_candidates(cand, scan_total, row=r) for r in range(n_rows)
    ]


def merge_sharded_candidates(cand: Candidates, scan_total: int, row: int = 0):
    """Host-side merge of one channel row's per-shard candidate arrays into a
    single ascending position-ordered stream for the resolver.

    Returns (n_candidates, BlockCandidates-compatible dict).  Raises on
    per-shard overflow, mirroring BlockCandidates.from_device."""
    from ..models.resolver import BlockCandidates

    n_arr = np.asarray(cand.n)[row]
    max_c = np.asarray(cand.pos).shape[1] // n_arr.shape[0]
    if (n_arr > max_c).any():
        raise OverflowError(
            f"candidate overflow: shard reported {int(n_arr.max())} preambles "
            f"> max_candidates {max_c}"
        )
    pos = np.asarray(cand.pos)[row]
    valid = pos < scan_total
    order = np.argsort(pos[valid], kind="stable")

    def pick(x):
        return np.asarray(x)[row][valid][order]

    return int(n_arr.sum()), BlockCandidates(
        pos=pos[valid][order],
        msg1=pick(cand.msg1),
        errors1=pick(cand.errors1),
        gate1=pick(cand.gate1),
        msg2=pick(cand.msg2),
        errors2=pick(cand.errors2),
        gate2=pick(cand.gate2),
    )
