"""TPU block demodulator: magnitude vector -> compacted Mode S candidates.

Behavioral contract: detectModeS + applyPhaseCorrection,
dump1090.c:1471-1793.  The reference scans sample positions one by one with
branch-heavy scalar code, mutating the magnitude buffer for its phase-
correction retry and jumping the scan index past good messages.  That control
flow is hostile to any vector machine, so this module restructures it as a
data-parallel pipeline with *no* approximation:

  1. the preamble predicate (10 relational tests + high/quiet checks,
     dump1090.c:1602-1650) is evaluated at every sample offset at once as
     boolean masks over shifted views — O(mlen) VPU work;
  2. candidate positions are compacted to a fixed-width index vector;
  3. for each candidate, BOTH demodulation passes are computed as pure
     functions of its 241-sample window: the uncorrected pass, and the
     phase-corrected retry (the reference mutates then restores the shared
     buffer, dump1090.c:1655-1693, so the retry is provably local — we
     compute it out-of-place);
  4. bit decisions, the repeat-previous-bit rule, byte packing, the first-
     bit demod-error flag and the noise gate are batched integer ops.

What this kernel deliberately does NOT do: the sequential "skip past a good
message" rule and the stateful ICAO-cache acceptance coupling (dump1090.c:
1769-1771, 942-983).  Those are O(candidates), order-dependent, and depend on
CRC outcomes entangled with decode history; they are replayed exactly on the
host over this kernel's compacted output — by the native C++ runtime
(native/modes_native.cpp) in production, with models/resolver.py as the
pure-Python oracle and --debug path.

Returned arrays are fixed-shape (padded to `max_candidates`), so the whole
pipeline is a single XLA program per block size.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import (
    BIT_REPEAT_DELTA,
    FULL_LEN_SAMPLES,
    LONG_MSG_BITS,
    MSG_SAMPLES,
    PREAMBLE_SAMPLES,
    SHORT_MSG_BITS,
)

WINDOW = FULL_LEN_SAMPLES + 1  # 241: one leading sample (m[j-1]) + preamble + frame


class Candidates(NamedTuple):
    """Compacted per-block demodulation results (fixed shape, padded)."""

    n: jax.Array          # [] int32, number of valid candidates (may exceed max)
    pos: jax.Array        # [C] int32 scan position of each candidate
    msg1: jax.Array       # [C, 14] uint8 packed frame, uncorrected pass
    errors1: jax.Array    # [C] int32 demod-error count, uncorrected pass
    gate1: jax.Array      # [C] bool noise-gate pass, uncorrected pass
    msg2: jax.Array       # [C, 14] uint8 packed frame, phase-corrected pass
    errors2: jax.Array    # [C] int32
    gate2: jax.Array      # [C] bool


def preamble_mask(m: jax.Array, scan_len: int) -> jax.Array:
    """Evaluate the preamble predicate at every scan position at once.

    Contract: dump1090.c:1602-1650.  `m` is int32[S]; returns bool[scan_len]
    where scan_len = S - FULL_LEN_SAMPLES (the reference scans
    j < mlen - MODES_FULL_LEN*2, dump1090.c:1593).
    """

    def s(k: int) -> jax.Array:
        # widen on the fly: m may be stored uint16 (magnitudes <= 65167) to
        # halve HBM traffic; the arithmetic below needs int32 headroom
        return lax.dynamic_slice_in_dim(m, k, scan_len).astype(jnp.int32)

    c = (
        (s(0) > s(1))
        & (s(1) < s(2))
        & (s(2) > s(3))
        & (s(3) < s(0))
        & (s(4) < s(0))
        & (s(5) < s(0))
        & (s(6) < s(0))
        & (s(7) > s(8))
        & (s(8) < s(9))
        & (s(9) > s(6))
    )
    high = (s(0) + s(2) + s(7) + s(9)) // 6
    c &= (s(4) < high) & (s(5) < high)
    c &= (s(11) < high) & (s(12) < high) & (s(13) < high) & (s(14) < high)
    return c


@functools.partial(jax.jit, static_argnames=("scan_len",))
def preamble_reject_stages(m: jax.Array, *, scan_len: int) -> jax.Array:
    """Debug-mode companion of preamble_mask: uint8 rejection code per scan
    position — 0 pass, 1 failed the 10-sample relational test, 2 failed the
    3..6 high-level test, 3 failed the 10..15 quiet-tail test.  Mirrors the
    reference's three --debug p dump sites (dump1090.c:1602-1650)."""

    def s(k: int) -> jax.Array:
        return lax.dynamic_slice_in_dim(m, k, scan_len).astype(jnp.int32)

    stage1 = (
        (s(0) > s(1))
        & (s(1) < s(2))
        & (s(2) > s(3))
        & (s(3) < s(0))
        & (s(4) < s(0))
        & (s(5) < s(0))
        & (s(6) < s(0))
        & (s(7) > s(8))
        & (s(8) < s(9))
        & (s(9) > s(6))
    )
    high = (s(0) + s(2) + s(7) + s(9)) // 6
    stage2 = (s(4) < high) & (s(5) < high)
    stage3 = (s(11) < high) & (s(12) < high) & (s(13) < high) & (s(14) < high)
    code = jnp.where(
        ~stage1, 1, jnp.where(~stage2, 2, jnp.where(~stage3, 3, 0))
    )
    return code.astype(jnp.uint8)


def _slice_window(msg_samples: jax.Array):
    """PPM bit-slice one 224-sample message window (dump1090.c:1666-1706).

    Returns (msg_bytes uint8[14], errors int32, df int32).

    Bit rules, in reference priority order: for cell i>0 with |low-high| <
    256 repeat the previous bit; low == high is a demod error (only reachable
    at i == 0, since i > 0 low==high implies delta 0 < 256); otherwise
    bit = low > high.  The repeat rule is a fill-forward: each cell takes the
    raw decision of the nearest preceding "confident" cell, computed with a
    cumulative max over indices instead of a serial walk.
    """
    low = msg_samples[0::2]
    high = msg_samples[1::2]
    delta = jnp.abs(low - high)
    t = jnp.arange(LONG_MSG_BITS, dtype=jnp.int32)

    raw = jnp.where(low > high, 1, 0).astype(jnp.int32)
    raw = raw.at[0].set(jnp.where(low[0] == high[0], 2, raw[0]))
    confident = (t == 0) | (delta >= BIT_REPEAT_DELTA)
    # fill-forward without a gather: encode (index, bit) as index*4+bit, take
    # a cumulative max (monotonic in index over confident cells), and strip
    # the index — each cell inherits the latest confident cell's bit
    coded = jnp.where(confident, (t << 2) | raw, -1)
    bits = lax.cummax(coded) & 3

    # error bits (value 2) are only assigned at cell 0 and counted when the
    # cell index is below the short-message length (dump1090.c:1677-1682)
    errors = (low[0] == high[0]).astype(jnp.int32)

    # Pack MSB-first with bitwise OR — the reference ORs shifted bit values,
    # so an error value 2 at bit k spills into bit k-1 (and off the top of
    # the byte for k == 0), dump1090.c:1696-1706.
    shifted = bits.reshape(14, 8) << (7 - jnp.arange(8, dtype=jnp.int32))
    packed = jnp.bitwise_or.reduce(shifted, axis=1) & 0xFF
    msg_bytes = packed.astype(jnp.uint8)
    df = packed[0] >> 3
    return msg_bytes, errors, df


def _noise_gate(orig_samples: jax.Array, df: jax.Array) -> jax.Array:
    """Noise gate: mean per-cell |low-high| over the *claimed* message length
    must clear 10*255 under integer division (dump1090.c:1713-1726).

    Crucial ordering detail: the reference restores the original magnitudes
    *before* computing the gate (dump1090.c:1692-1693 vs :1713), so even on
    the phase-corrected retry the gate reads UNCORRECTED samples — only the
    claimed message length (via the DF of the freshly sliced bits) differs
    between passes."""
    low = orig_samples[0::2]
    high = orig_samples[1::2]
    delta = jnp.abs(low - high)
    is_long = (df >= 16) & (df <= 21)
    msglen_bytes = jnp.where(is_long, 14, 7)
    ds = jnp.where(is_long, delta.sum(), delta[: SHORT_MSG_BITS].sum())
    return ds // (msglen_bytes * 4) >= 10 * 255


def _phase_corrected_window(w: jax.Array) -> jax.Array:
    """Phase-corrected copy of the 224 message samples of window `w`
    (int32[241], w[0] = m[j-1]).  Contract: applyPhaseCorrection,
    dump1090.c:1471-1558.

    The reference walks the message serially, scaling each next sample by a
    fixed-point factor chosen from the previous (already-scaled) sample's bit
    decision.  Only every other sample is written (odd indices walking
    backward, even walking forward), so the recurrence carries exactly one
    value — a 111-step lax.scan per direction, vmapped across candidates.
    """
    on_time = (w[1] + w[3] + w[8] + w[10]).astype(jnp.uint32)
    early = ((w[0] + w[7]) * 2).astype(jnp.uint32)
    late = ((w[4] + w[11]) * 2).astype(jnp.uint32)
    m = w[PREAMBLE_SAMPLES + 1 : PREAMBLE_SAMPLES + 1 + MSG_SAMPLES]  # w[17:241]

    def factors(e: jax.Array) -> tuple[jax.Array, jax.Array]:
        # uint32 C semantics: 16384*e <= 16384*260668 < 2^32, no wrap
        q = (jnp.uint32(16384) * e) // jnp.maximum(e + on_time, jnp.uint32(1))
        q = q.astype(jnp.int32)
        return 16384 + q, 16384 - q

    is_early = early > late
    up_e, down_e = factors(early)
    up_l, down_l = factors(late)
    up = jnp.where(is_early, up_e, up_l)
    down = jnp.where(is_early, down_e, down_l)

    def scale(v: jax.Array, f: jax.Array) -> jax.Array:
        # uint16 scaleSample: v*f/16384 clamped to 65535 (dump1090.c:1473-1476)
        return jnp.minimum(v * f // 16384, 65535)

    # Both directions are independent 111-step recurrences; run them in ONE
    # scan (half the sequential steps of two), and rebuild the corrected
    # message with an interleave instead of scatters (scatter is slow on TPU).
    odd = m[1::2]    # positions 1, 3, ..., 223
    even = m[0::2]   # positions 0, 2, ..., 222 (+ pos 222 is even[111])

    # late >= early: seed-scale position 0, walk forward writing even
    # positions 2..222 (dump1090.c:1535-1556); step k reads odd[k], writes
    # even[k+1].  early > late: seed-scale position 223, walk backward
    # writing odd positions 221..1 (dump1090.c:1513-1533); step k reads
    # even[111-k], writes odd[110-k].
    seed_f = scale(even[0], up)
    seed_b = scale(odd[111], up)

    def step(carry, xs):
        v_f, v_b = carry
        o_f, e_next, e_b, o_b = xs
        v_f2 = scale(e_next, jnp.where(v_f > o_f, up, down))
        v_b2 = scale(o_b, jnp.where(e_b > v_b, down, up))
        return (v_f2, v_b2), (v_f2, v_b2)

    xs = (odd[:111], even[1:], even[1:][::-1], odd[:111][::-1])
    # unroll: each scan step is a handful of VPU ops over the (vmapped)
    # candidate batch, so loop bookkeeping dominates; unrolling amortizes it
    _, (even_new, odd_new) = lax.scan(step, (seed_f, seed_b), xs, unroll=8)

    evens_fwd = jnp.concatenate([seed_f[None], even_new])          # 0, 2..222
    m_fwd = jnp.stack([evens_fwd, odd], axis=-1).reshape(-1)
    odds_bwd = jnp.concatenate([odd_new[::-1], seed_b[None]])      # 1..221, 223
    m_bwd = jnp.stack([even, odds_bwd], axis=-1).reshape(-1)

    return jnp.where(is_early, m_bwd, m_fwd)


def candidate_passes_window(w: jax.Array, pos: jax.Array):
    """Both demod passes for one candidate given its gathered window
    (uint16/int32[>=241], w[0] = m[pos-1]).  `pos` is the *stream-global*
    scan position: phase correction is skipped at pos == 0, where m[-1] does
    not exist (dump1090.c:1658-1663)."""
    w = w[:WINDOW].astype(jnp.int32)
    msg_region = w[PREAMBLE_SAMPLES + 1 :]
    msg1, errors1, df1 = _slice_window(msg_region)
    gate1 = _noise_gate(msg_region, df1)
    corrected = _phase_corrected_window(w)
    corrected = jnp.where(pos > 0, corrected, msg_region)
    msg2, errors2, df2 = _slice_window(corrected)
    gate2 = _noise_gate(msg_region, df2)  # gate reads restored originals
    return msg1, errors1, gate1, msg2, errors2, gate2


def gather_candidate_windows(m: jax.Array, pos: jax.Array, *, pallas: bool) -> jax.Array:
    """Fetch (B, MC, 256) uint16 candidate windows from magnitudes (B, S),
    uint16 or int32; window index 0 holds m[pos-1] (zero at the stream head).

    On TPU the Pallas VMEM-resident kernel (ops/gather.py) replaces XLA's
    serial per-window gather — ~12x faster at 64K windows."""
    from .gather import WINDOW_PAD, gather_windows, gather_windows_xla

    B, S = m.shape
    s_pad = -(-(S + 1 + 2048 + WINDOW_PAD) // 1024) * 1024
    m_pad = jnp.zeros((B, s_pad), jnp.uint16)
    m_pad = lax.dynamic_update_slice(m_pad, m.astype(jnp.uint16), (0, 1))
    if pallas:
        return gather_windows(m_pad, pos)
    return gather_windows_xla(m_pad, pos)


def compact_positions(mask: jax.Array, max_candidates: int, scan_len: int) -> jax.Array:
    """Indices of set mask positions, ascending, padded with `scan_len`.

    Hierarchical compaction — the FIRST max_candidates hits in scan order,
    like the reference's left-to-right walk.  Bit-packs runs of 8 positions
    into group bytes, then compacts at the byte level
    (compact_positions_from_bytes)."""
    n_pos = mask.shape[0]
    n_grp = -(-n_pos // 8)
    padded = jnp.zeros(n_grp * 8, dtype=jnp.int32)
    padded = lax.dynamic_update_slice(padded, mask.astype(jnp.int32), (0,))
    bits = padded.reshape(n_grp, 8)
    byte = jnp.bitwise_or.reduce(bits << (7 - jnp.arange(8, dtype=jnp.int32)), axis=1)
    return compact_positions_from_bytes(byte, max_candidates, scan_len)


def compact_positions_from_bytes(
    byte: jax.Array, max_candidates: int, scan_len: int
) -> jax.Array:
    """compact_positions entered at the packed group-byte level: int32[n_grp]
    bytes (bit 7 = first position of the group) -> first max_candidates set
    positions ascending, padded with `scan_len`.

    Levels (engaged when the static sizes allow): mark supergroups of 8
    groups; top_k the (128x smaller) supergroup array by index; fetch each
    selected supergroup's 8 group bytes with a one-hot bf16 matmul (an MXU
    gather — measured free vs 1 ms for a top_k over all 16K groups); top_k
    the surviving groups; expand bytes to positions and top_k the remainder.
    Every selected container holds >= 1 hit, so the first-K property is
    preserved at each level.  ~12x faster than a flat top_k over all scan
    positions (itself ~10x faster than the cumsum+scatter lowering of
    jnp.nonzero)."""
    n_grp = byte.shape[0]
    n_sup = -(-n_grp // 8)

    if max_candidates <= n_sup:
        # level 0: first MC non-empty supergroups (64 positions each)
        bpad = jnp.zeros(n_sup * 8, jnp.int32)
        bpad = lax.dynamic_update_slice(bpad, byte, (0,))
        b8 = bpad.reshape(n_sup, 8)
        si = lax.iota(jnp.int32, n_sup)
        sscore = jnp.where((b8 > 0).any(axis=1), -si, jnp.int32(-(2**30)))
        svals, _ = lax.top_k(sscore, max_candidates)
        ssel = -svals                            # ascending, padded with 2^30
        valid_s = ssel < n_sup
        ssel_c = jnp.where(valid_s, ssel, 0)
        # one-hot matmul gather of the selected supergroups' group bytes;
        # bf16 is exact for one-hot x bytes <= 255
        oh = (ssel_c[:, None] == si[None, :]) & valid_s[:, None]
        gbytes = jnp.dot(
            oh.astype(jnp.bfloat16), b8.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                      # (MC, 8)
        t8 = jnp.arange(8, dtype=jnp.int32)
        gidx = ssel_c[:, None] * 8 + t8[None, :]
        gscore = jnp.where(
            (gbytes > 0) & valid_s[:, None],
            -(gidx * 256 + 255 - gbytes), jnp.int32(-(2**30)),
        ).reshape(-1)
        vals, _ = lax.top_k(gscore, max_candidates)
    elif max_candidates <= n_grp:
        # first MC non-empty groups; the byte folds into disjoint score
        # ranges so it travels with the group index
        gi = lax.iota(jnp.int32, n_grp)
        score = jnp.where(byte > 0, -(gi * 256 + 255 - byte), jnp.int32(-(2**30)))
        vals, _ = lax.top_k(score, max_candidates)
    else:
        # degenerate (tiny shards): flat top_k over positions
        t8 = jnp.arange(8, dtype=jnp.int32)
        flat_bits = ((byte[:, None] >> (7 - t8[None, :])) & 1).reshape(-1)
        pi = lax.iota(jnp.int32, n_grp * 8)
        k = min(max_candidates, n_grp * 8)
        fscore = jnp.where(flat_bits > 0, -pi, jnp.int32(-(2**30)))
        fvals, _ = lax.top_k(fscore, k)
        fpos = jnp.minimum(-fvals, jnp.int32(scan_len))
        return jnp.concatenate(
            [fpos, jnp.full(max_candidates - k, scan_len, jnp.int32)]
        )

    v = -vals
    grp = v // 256
    gbyte = jnp.where(v < 2**30 - 1, 255 - (v % 256), 0)

    # final level: expand each group's bits to positions, compact the rest
    t = jnp.arange(8, dtype=jnp.int32)
    hit = ((gbyte[:, None] >> (7 - t[None, :])) & 1) > 0
    pos = grp[:, None] * 8 + t[None, :]
    pscore = jnp.where(hit & (pos < scan_len), -pos, jnp.int32(-(2**30)))
    pvals, _ = lax.top_k(pscore.reshape(-1), max_candidates)
    return jnp.minimum(-pvals, jnp.int32(scan_len))


def preamble_bytes(
    m: jax.Array, scan_len: int, *, algebra: bool = True, mxu: bool = False
) -> jax.Array:
    """Byte-packed preamble predicate for one row: int32[ceil(scan_len/8)].

    Single-evaluation alternative to preamble_mask feeding multiple
    consumers: the 15-tap predicate (dump1090.c:1602-1650) is evaluated over
    the zero-padded group domain directly and materialized exactly ONCE as
    packed group bytes — `n` falls out as popcount and compaction enters at
    compact_positions_from_bytes, so XLA never re-derives the taps per
    consumer (the mask form re-reads m for each of its three consumers:
    mask.sum, the bit-pack, and the zero-pad copy).

    algebra=True shares pairwise subexpressions across taps: one gt/lt
    compare array, a 2-/4-wide running max serving the s3..s6-vs-s0 and the
    quiet-tail tests, one pair-sum feeding `high` — ~2.4x fewer vector ops
    than the direct 15-slice form (algebra=False).  mxu=True packs bits into
    bytes via a bf16 one-hot matmul instead of shift/or (exact: one-hot x
    bits).  All four combinations are bit-identical to the mask form
    (tools/exp_demod_front.py --check; test_demod packed-front tests).

    Requires len(m) >= ceil(scan_len/8)*8 + 17, which every caller geometry
    satisfies: a buffer carries FULL_LEN_SAMPLES = 240 real samples past its
    last scan position (dump1090.c:1593)."""
    n_grp = -(-scan_len // 8)
    n_pad = n_grp * 8
    if m.shape[0] < n_pad + 17:
        raise ValueError(
            f"preamble_bytes: row of {m.shape[0]} samples cannot cover "
            f"{scan_len} scan positions (needs >= {n_pad + 17})"
        )

    if not algebra:
        def s(k: int) -> jax.Array:
            return lax.dynamic_slice_in_dim(m, k, n_pad).astype(jnp.int32)

        c = (
            (s(0) > s(1)) & (s(1) < s(2)) & (s(2) > s(3)) & (s(3) < s(0))
            & (s(4) < s(0)) & (s(5) < s(0)) & (s(6) < s(0))
            & (s(7) > s(8)) & (s(8) < s(9)) & (s(9) > s(6))
        )
        high = (s(0) + s(2) + s(7) + s(9)) // 6
        c &= (s(4) < high) & (s(5) < high)
        c &= (s(11) < high) & (s(12) < high) & (s(13) < high) & (s(14) < high)
    else:
        # Shared subexpressions, each built once and tapped shifted.  Max tap
        # offset is 11 (mm2), and mm2 reaches 2 further into mm, so build
        # over n_pad + 16 positions: the jnp.roll wraparound garbage then
        # lives beyond every tap (and sb(1) stays in bounds per the length
        # precondition above).
        nb = n_pad + 16

        def sb(k: int) -> jax.Array:
            return lax.dynamic_slice_in_dim(m, k, nb).astype(jnp.int32)

        a0, a1 = sb(0), sb(1)
        gt = a0 > a1                      # gt[j]  = m[j] >  m[j+1]
        lt = a0 < a1                      # lt[j]  = m[j] <  m[j+1]
        mm = jnp.maximum(a0, a1)          # mm[j]  = max(m[j], m[j+1])
        mm2 = jnp.maximum(mm, jnp.roll(mm, -2))   # max(m[j..j+3]), j < nb-2
        q = a0 + jnp.roll(a0, -2)         # m[j] + m[j+2], j < nb-2

        def tap(arr: jax.Array, k: int) -> jax.Array:
            return lax.dynamic_slice_in_dim(arr, k, n_pad)

        high = (tap(q, 0) + tap(q, 7)) // 6
        c = (
            tap(gt, 0) & tap(lt, 1) & tap(gt, 2)
            & (tap(mm2, 3) < tap(a0, 0))          # s3..s6 all < s0
            & tap(gt, 7) & tap(lt, 8)
            & (tap(a0, 9) > tap(a0, 6))           # s9 > s6
            & (tap(mm, 4) < high)                 # s4, s5 < high
            & (tap(mm2, 11) < high)               # s11..s14 < high
        )
    c &= lax.iota(jnp.int32, n_pad) < scan_len

    bits = c.reshape(n_grp, 8)
    if mxu:
        w = (1 << (7 - jnp.arange(8))).astype(jnp.bfloat16)
        return jnp.dot(
            bits.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
    return jnp.bitwise_or.reduce(
        bits.astype(jnp.int32) << (7 - jnp.arange(8, dtype=jnp.int32)), axis=1
    )


def front_packed(
    m: jax.Array, scan_len: int, max_candidates: int,
    *, algebra: bool = True, mxu: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(n, pos) for one magnitude row via the byte-packed predicate."""
    byte = preamble_bytes(m, scan_len, algebra=algebra, mxu=mxu)
    n = lax.population_count(byte).sum().astype(jnp.int32)
    pos = compact_positions_from_bytes(byte, max_candidates, scan_len)
    return n, pos


def front_variant() -> str:
    """Selected demod front-half formulation for demod_batch.

    'mask' — preamble_mask + compact_positions (the round-1..3 form);
    'packed[-plain][-mxu]' — single-evaluation preamble_bytes
    (-plain disables the algebraic subexpression reuse, -mxu packs via a
    bf16 one-hot matmul).  All bit-identical.  Default per backend since
    the round-4 chip verdict (2026-08-19): 'mask' on TPU — the
    same-process interleaved sustained A/B (the product group protocol,
    /tmp-style harness now in tools/measure.py --probe ab-sustained) read
    mask 2015/2065/2069 vs packed 1694/1858/1835 Msamples/s, and bench's
    perturbed demod-only agreed (mask 4.90 vs packed 5.82 ms/batch);
    packed's isolated-loop win (1.87 vs 2.76 ms) did not survive the real
    grouped program.  'packed' on CPU, where it genuinely halves demod
    time (35.4 vs 78.9 ms/8 buffers).  Override with DUMP1090_TPU_FRONT
    (read at TRACE time — set it before the first demod dispatch)."""
    import os

    v = os.environ.get("DUMP1090_TPU_FRONT")
    if v:
        return v
    import jax

    return "mask" if jax.default_backend() == "tpu" else "packed"


def front_candidates(
    m2d: jax.Array, scan_len: int, max_candidates: int, front: str | None = None
) -> tuple[jax.Array, jax.Array]:
    """Batched front half: magnitudes (B, S) -> (n int32[B], pos int32[B, MC])
    in the formulation named by `front` (None -> front_variant())."""
    if front is None:
        front = front_variant()
    if front == "mask":
        mask = jax.vmap(lambda r: preamble_mask(r, scan_len))(m2d)
        n = mask.sum(axis=1).astype(jnp.int32)
        pos = jax.vmap(
            lambda r: compact_positions(r, max_candidates, scan_len)
        )(mask)
        return n, pos
    tokens = front.split("-")
    if tokens[0] != "packed" or not set(tokens[1:]) <= {"plain", "mxu"}:
        raise ValueError(f"unknown demod front variant: {front!r}")
    algebra = "plain" not in tokens
    mxu = "mxu" in tokens
    return jax.vmap(
        lambda r: front_packed(
            r, scan_len, max_candidates, algebra=algebra, mxu=mxu
        )
    )(m2d)


def use_pallas_gather() -> bool:
    """Pallas kernels engage on real TPU backends; CPU tests and the
    virtual-device mesh use the exact jnp fallback."""
    import jax

    return jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit, static_argnames=("scan_len", "max_candidates", "pallas"))
def demod_block(
    m: jax.Array, *, scan_len: int, max_candidates: int = 512,
    pallas: bool | None = None,
) -> Candidates:
    """Demodulate one magnitude block: int32[S] -> Candidates.

    scan_len: number of scan positions (reference: S - 240, dump1090.c:1593).
    """
    if pallas is None:
        pallas = use_pallas_gather()
    mask = preamble_mask(m, scan_len)
    n = mask.sum().astype(jnp.int32)
    pos = compact_positions(mask, max_candidates, scan_len)
    w = gather_candidate_windows(m[None], pos[None], pallas=pallas)[0]
    msg1, errors1, gate1, msg2, errors2, gate2 = jax.vmap(candidate_passes_window)(
        w, pos
    )
    return Candidates(n, pos, msg1, errors1, gate1, msg2, errors2, gate2)


@functools.partial(jax.jit, static_argnames=("scan_len", "max_candidates", "pallas"))
def demod_iq_block(
    iq_bytes: jax.Array, *, scan_len: int, max_candidates: int = 512,
    pallas: bool | None = None,
) -> Candidates:
    """Fused single-buffer forward path: uint8 IQ bytes -> Candidates in one
    XLA program (magnitude + preamble scan + compaction + both demod passes).
    One dispatch per buffer matters on runtimes with high per-dispatch cost."""
    from ..parallel.sharding import demod_batch

    cand = demod_batch(
        iq_bytes[None], scan_len=scan_len, max_candidates=max_candidates,
        pallas=pallas,
    )
    return Candidates(*[f[0] for f in cand])
