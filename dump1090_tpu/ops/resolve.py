"""On-device candidate resolver: the sequential scan semantics on the TPU.

Behavioral contract: the candidate-resolution half of detectModeS +
decodeModesMessage (dump1090.c:1563-1793, 1091-1209) — the same semantics the
host resolvers implement (models/resolver.py is the Python oracle,
native/modes_native.cpp the C++ production twin).  This third implementation
keeps the O(candidates) stage ON THE DEVICE, so a demod+resolve batch returns
only the emitted messages (~tens of KB) instead of every candidate's two
demodulation passes (~MB) — the difference between being fetch-bound and
compute-bound on runtimes where device->host transfers are expensive.

TPU-first decomposition
-----------------------
Everything order-INDEPENDENT is vectorized over all candidates of the batch
before the sequential part:

  * CRC-24 syndromes of both demod passes as one GF(2) matmul on the MXU
    (ops/crc.py documents the contraction; here it runs batched on device);
  * syndrome-table error correction: the glibc bsearch probe sequence
    (dump1090.c:862-865 — duplicates must resolve to the same entry) is a
    dense 2^24-entry table built once at trace time — ONE gather per
    candidate; bit flips are applied with one-hot byte masks;
  * the brute-force AP address (dump1090.c:942-983) — algebraically the
    address IS the syndrome (AP = CRC xor addr, so syndrome = addr), no
    extra work at all;
  * the ENTIRE CRC-acceptance decision is collapsed to two precomputed
    bits per pass — "CRC ok if the ICAO cache hits" and "CRC ok if it
    doesn't" — so the sequential core does one select per pass instead of
    re-deriving the DF-type policy (measured ~82 ns/step vs ~124 for the
    policy-in-kernel form).

What remains is genuinely sequential: the skip-until position (reset per
buffer, advanced past good messages, dump1090.c:1769-1771) and the
1024-entry ICAO cache whose hits gate AP/IID acceptance (dump1090.c:942-983,
1196-1209).  That is pathological for XLA (a lax.scan issues each op as a
serialized vector instruction, measured ~23 us/step on v5e) but trivial for
a Pallas kernel running the loop on the scalar core with the cache in SMEM.
The kernel consumes three packed int32 words per candidate and emits ONE
packed decision word; stat counters and message emission are derived from
the words vectorized, after the fact.

Kernel cost model (measured on v5e through the axon tunnel):
  * each pallas_call costs ~1.1 ms FIXED (launch + block plumbing) plus
    ~82 ns per executed candidate step — so the whole dispatch group runs
    as ONE kernel call (demod_resolve_group), not one per batch;
  * the per-candidate input words stream through SMEM as per-chunk blocks
    (regular BlockSpec inputs), not as one scalar-prefetch array, so the
    stream length is unbounded (no MAX_SCAN_SEGMENT);
  * only the per-BUFFER candidate counts are scalar-prefetched (4 bytes per
    buffer): valid candidates are a contiguous prefix of each buffer's
    fixed-width slot row, so the kernel walks exactly `n_b` slots per
    buffer and never touches padding — resolve cost is proportional to
    candidate DENSITY, not to the padded shape (dense modes1.bin air pays
    ~26k steps per 128-buffer batch; quiet air pays almost nothing).

The ICAO cache lives on the device between batches, exactly like
Modes.icao_cache persists across buffers in the reference.  Timestamps are
int32 unix seconds — the same 2038 horizon as a 32-bit time_t build of the
reference; one `now` per dispatch group (see models/pipeline.py for the
granularity note).

Emitted messages are compacted with the same first-K top_k pattern as the
demodulator.  The packed wire format splits short (7-byte) and long
(14-byte) frames into separate arrays — 56-bit frames do not pay for 112-bit
rows — with each short row carrying its emission rank so the host can
re-interleave the stream exactly; exact emission counts make overflow
detected, never silent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    DF11_IID_MAX_SYNDROME,
    ICAO_CACHE_LEN,
    ICAO_CACHE_TTL,
    LONG_MSG_BITS,
    PREAMBLE_US,
    SHORT_MSG_BITS,
)
from . import crc as crc_ops

# ---- packed input word layout (per candidate) --------------------------------
# pf:  pos (bits 0..16) | valid<<17 | newbuf<<18 | gate1<<19
# w1/w2 (per pass): addr (bits 0..23) | attempt<<24 | crcok_seen<<25 |
#                   crcok_noseen<<26 | addable<<27 | long<<28
# crcok_seen/noseen: the final CRC verdict given an ICAO-cache hit / miss
# (the whole DF-type acceptance policy of decodeModesMessage folded in);
# addable: this pass would insert addr into the cache when attempted
# (std frame, good/fixed CRC, no errorbit — dump1090.c:1196-1209).
PF_POS_MASK = (1 << 17) - 1
PF_VALID = 1 << 17
PF_NEWBUF = 1 << 18
PF_GATE1 = 1 << 19
W_ADDR_MASK = (1 << 24) - 1
W_ATTEMPT = 1 << 24
W_CRCOK_SEEN = 1 << 25
W_CRCOK_NOSEEN = 1 << 26
W_ADDABLE = 1 << 27
W_LONG = 1 << 28

# ---- packed output word layout (per candidate) -------------------------------
R_RUN = 1
R_ATT1 = 2
R_CRCOK1 = 4
R_GOOD1 = 8
R_RUN2 = 16
R_ATT2 = 32
R_CRCOK2 = 64
R_GOOD2 = 128

# meta word layout of emitted messages (bit 0 is the LSB):
# pos << 12 | (errorbit+1) << 4 | pass << 3 | long << 2 | phase << 1 | crcok
# (errorbit+1 in [0, 112]: 0 = no fix applied; pos <= SCAN_POSITIONS < 2^17)
META_CRCOK = 1
META_PHASE = 2
META_LONG = 4
META_PASS = 8
META_ERRBIT_SHIFT = 4
META_ERRBIT_MASK = 0xFF
META_POS_SHIFT = 12

# short / long frame skip distances: j + (8 us + msgbits) * 2 + 1
# (dump1090.c:1769-1771)
SKIP_SHORT = (PREAMBLE_US + SHORT_MSG_BITS) * 2 + 1  # 129
SKIP_EXTRA_LONG = (LONG_MSG_BITS - SHORT_MSG_BITS) * 2  # +112 for long frames

RESOLVE_CHUNK = 2048  # target candidates per Pallas grid step

# packed short rows carry their batch emission rank in TWO uint8s, so one
# batch's emission count must fit 16 bits or host re-interleave would read
# aliased ranks; demod_resolve_group enforces this at trace time and
# clamp_packed_out keeps sticky growth under it
PACKED_RANK_LIMIT = 1 << 16


def clamp_packed_out(mos: int, mol: int, short_need: int = 0,
                     long_need: int = 0) -> tuple[int, int]:
    """Shrink packed emission allocations until mos + mol fits the 16-bit
    rank field, never below the exact per-kind needs (the overflow-retry
    counts).  Raises if the needs themselves exceed the wire format — one
    batch emitting >65536 messages needs fewer buffers per batch, not a
    wider allocation."""
    if short_need + long_need > PACKED_RANK_LIMIT:
        raise ValueError(
            f"one batch emitted {short_need} short + {long_need} long "
            f"messages; the packed wire format's 16-bit emission rank caps "
            f"a batch at {PACKED_RANK_LIMIT} — reduce batch_buffers per "
            f"dispatch"
        )
    # never shave an allocation to zero: the pipeline's sticky growth
    # multiplies by 4, and 0*4 == 0 would loop forever on the next batch
    # that emits the other frame kind
    short_floor = max(short_need, 64)
    long_floor = max(long_need, 64)
    if short_floor + long_floor > PACKED_RANK_LIMIT:
        raise ValueError(
            f"packed emission needs {short_need}+{long_need} cannot fit the "
            f"{PACKED_RANK_LIMIT}-message rank field with nonzero "
            f"allocations for both kinds — reduce batch_buffers per dispatch"
        )
    over = mos + mol - PACKED_RANK_LIMIT
    if over > 0:
        d = min(over, mol - long_floor)
        mol -= d
        over -= d
    if over > 0:
        mos -= min(over, mos - short_floor)
    return mos, mol

# the window-gather kernel scalar-prefetches every candidate position into
# SMEM; total buffers per dispatch x max_candidates x 4 B must stay under
# this (SMEM is ~1 MB; leave headroom for the kernel's own scalars)
SMEM_PREFETCH_BUDGET = (1 << 20) - (64 << 10)


def streams_dispatch_shape(s_n: int, nb: int, mc: int) -> tuple[int, int]:
    """Largest (streams, buffers-per-stream) sub-dispatch shape that fits
    demod_resolve_streams' SMEM prefetch budget.  Callers with more
    streams/buffers than fit one dispatch (api.decode_captures after sticky
    mc growth, or very large capture sets) split their work into
    (s_fit, nb_fit) tiles instead of crashing on the budget gate."""
    mc = normalize_max_candidates(mc)
    per_stream = nb * mc * 4
    if per_stream <= SMEM_PREFETCH_BUDGET:
        return min(s_n, SMEM_PREFETCH_BUDGET // per_stream), nb
    nb_fit = SMEM_PREFETCH_BUDGET // (mc * 4)
    if nb_fit < 1:
        raise OverflowError(
            f"max_candidates {mc} alone exceeds the single-buffer SMEM "
            f"prefetch budget ({SMEM_PREFETCH_BUDGET} B) — candidate "
            f"density beyond the resolvable geometry"
        )
    return 1, nb_fit


def max_candidates_cap(n_buffers: int) -> int:
    """Largest kernel-valid max_candidates whose window-gather scalar
    prefetch (n_buffers x mc x 4 B positions per batch; the group program
    demodulates batch-by-batch under lax.scan for exactly this reason)
    fits the SMEM budget.  The pipeline clamps sticky growth here and
    raises an actionable error when a buffer's real candidate count can't
    fit — a mid-decode Mosaic lowering failure is never the answer."""
    cap = SMEM_PREFETCH_BUDGET // (4 * n_buffers)
    if cap > RESOLVE_CHUNK:
        cap -= cap % RESOLVE_CHUNK
    return cap


@functools.cache
def _bit_matrices() -> tuple[np.ndarray, np.ndarray]:
    """(88, 24) long-frame and (32, 24) short-frame GF(2) CRC contractions."""
    m = crc_ops.checksum_bit_matrix()
    return m[: LONG_MSG_BITS - 24], m[SHORT_MSG_BITS : LONG_MSG_BITS - 24]


@functools.cache
def _error_table() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    syn, nbits, pos0, pos1 = crc_ops.bit_error_table()
    return (
        syn.astype(np.int32),
        nbits.astype(np.int32),
        pos0.astype(np.int32),
        pos1.astype(np.int32),
    )


def _unpack_bits(msgs: jax.Array, nbytes: int) -> jax.Array:
    """(N, nbytes) uint8 -> (N, nbytes*8) {0,1} int8, MSB first."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
    b = (msgs[:, :nbytes, None].astype(jnp.int32) >> shifts[None, None, :]) & 1
    return b.reshape(msgs.shape[0], nbytes * 8).astype(jnp.int8)


def device_syndromes(msgs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """24-bit syndromes of (N, 14) frames for both frame lengths.

    Returns (syn_long, syn_short) int32[N].  GF(2) product on the MXU: bf16
    operands with f32 accumulation are exact (0/1 values, sums <= 88)."""
    m_long, m_short = _bit_matrices()
    bits = _unpack_bits(msgs, 11)  # 88 data bits of a long frame

    def gf2(b: jax.Array, m: np.ndarray) -> jax.Array:
        acc = jnp.dot(
            b.astype(jnp.bfloat16),
            jnp.asarray(m, dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return acc.astype(jnp.int32) & 1

    w = jnp.asarray(1 << np.arange(23, -1, -1, dtype=np.int32))
    crc_long = (gf2(bits, m_long) * w).sum(axis=1)
    crc_short = (gf2(bits[:, :32], m_short) * w).sum(axis=1)

    def rem(b0, b1, b2):
        x = msgs.astype(jnp.int32)
        return (x[:, b0] << 16) | (x[:, b1] << 8) | x[:, b2]

    return crc_long ^ rem(11, 12, 13), crc_short ^ rem(4, 5, 6)


@functools.cache
def _dense_fix_table() -> np.ndarray:
    """Direct-mapped 2^24-entry syndrome -> error-table-entry lookup.

    The sorted table's bsearch (13 serial probes = 13 device gathers) becomes
    ONE gather.  Duplicate syndromes must resolve to the exact entry glibc's
    bsearch lands on (dump1090.c:862-865) — that choice is baked in here at
    build time by running the probe emulation per unique syndrome.

    Packing: nbits << 14 | pos0 << 7 | (pos1 & 0x7F); 0 = no entry.  pos0 is
    in [5, 112) and pos1 in [6, 112) or -1 (-1 packs to 0x7F, disambiguated
    by nbits).  33 MB of uint16 — resident in HBM, built once per process.
    """
    syn, nbits, pos0, pos1 = crc_ops.bit_error_table()
    t = np.zeros(1 << 24, dtype=np.uint16)
    for s in np.unique(syn):
        idx = crc_ops._glibc_bsearch(syn, int(s))
        t[s] = (int(nbits[idx]) << 14) | (int(pos0[idx]) << 7) | (int(pos1[idx]) & 0x7F)
    return t


def fix_candidates(
    msgs: jax.Array,
    syn: jax.Array,
    msgbits: jax.Array,
    want_fix: jax.Array,
    maxfix: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Vectorized fixBitErrors (dump1090.c:854-894) over (N, 14) frames.

    Returns (msg_fixed, errorbit, nbits_applied): the corrected bytes where a
    fix applies (identity elsewhere), the first fixed bit position (-1 when
    no fix), and 0/1/2 fixed bits."""
    v = jnp.asarray(_dense_fix_table())[syn & 0xFFFFFF].astype(jnp.int32)
    k = v >> 14
    hit = k > 0
    offset = LONG_MSG_BITS - msgbits
    rel0 = ((v >> 7) & 0x7F) - offset
    rel1 = (v & 0x7F) - offset
    ok0 = (rel0 >= 0) & (rel0 < msgbits)
    ok1 = (k < 2) | ((rel1 >= 0) & (rel1 < msgbits))
    apply = want_fix & hit & (k <= maxfix) & ok0 & ok1

    byte_idx = jnp.arange(14, dtype=jnp.int32)

    def flip(rel: jax.Array, enable: jax.Array) -> jax.Array:
        onehot = (rel[:, None] >> 3) == byte_idx[None, :]
        bit = 1 << (7 - (rel & 7))
        return jnp.where(onehot & enable[:, None], bit[:, None], 0)

    flips = flip(rel0, apply) ^ flip(rel1, apply & (k == 2))
    msg_fixed = (msgs.astype(jnp.int32) ^ flips).astype(jnp.uint8)
    errorbit = jnp.where(apply, rel0, -1)
    return msg_fixed, errorbit, jnp.where(apply, k, 0)


def icao_hash(a: jax.Array) -> jax.Array:
    """ICAOCacheHashAddress (dump1090.c:898-905) in int32 (logical shifts;
    wrapping int32 multiplies match uint32 in the low 32 bits)."""
    a = a.astype(jnp.int32)
    h = lax.shift_right_logical(a, 16) ^ a
    h = h * jnp.int32(0x45D9F3B)
    h = lax.shift_right_logical(h, 16) ^ h
    h = h * jnp.int32(0x45D9F3B)
    h = lax.shift_right_logical(h, 16) ^ h
    return h & (ICAO_CACHE_LEN - 1)


def _pass_precompute(msgs, errors, gate, aggressive, fix_errors):
    """Order-independent decode work for one demod pass of all candidates.

    Returns (packed word, msg_fixed, aux dict of pure flags for stats).
    The word carries the FINAL per-candidate CRC verdict conditioned on the
    only sequential unknown (ICAO-cache hit or miss), so the scalar core
    does one select where the reference re-derives the whole DF policy
    (dump1090.c:1119-1209)."""
    x = msgs.astype(jnp.int32)
    msgtype = x[:, 0] >> 3
    is_long = (msgtype >= 16) & (msgtype <= 21)  # LONG_MSG_DFS
    msgbits = jnp.where(is_long, LONG_MSG_BITS, SHORT_MSG_BITS)
    syn_long, syn_short = device_syndromes(msgs)
    syn = jnp.where(is_long, syn_long, syn_short)
    crcok_clean = syn == 0

    is_std = (msgtype == 11) | (msgtype == 17) | (msgtype == 18)
    is_ap = (
        (msgtype == 0) | (msgtype == 4) | (msgtype == 5) | (msgtype == 16)
        | (msgtype == 20) | (msgtype == 21) | (msgtype == 24)
    )
    is11 = msgtype == 11

    maxfix = jnp.where(aggressive, 2, 1)
    want_fix = fix_errors & ~crcok_clean & is_std
    msg_fixed, errorbit, nfix = fix_candidates(msgs, syn, msgbits, want_fix, maxfix)
    crcok_fix = crcok_clean | (nfix > 0)

    xf = msg_fixed.astype(jnp.int32)
    addr_self = (xf[:, 1] << 16) | (xf[:, 2] << 8) | xf[:, 3]
    # brute-force AP address == the syndrome (AP = CRC xor addr); computed on
    # the unfixed bytes, but AP frame types are never fixed, so syn is it
    addr = jnp.where(is_std, addr_self, syn)

    def b(flag, bit):
        return flag.astype(jnp.int32) * bit

    attempt = gate & ((errors == 0) | (aggressive & (errors < 3)))
    clean = errorbit == -1
    iid_ok = ~crcok_fix & is11 & (syn < DF11_IID_MAX_SYNDROME)
    # reference acceptance (decodeModesMessage): std frames pass on clean or
    # fixed CRC, or on a DF11-IID cache hit; AP frames pass only on a cache
    # hit of the brute-forced address
    crcok_seen = jnp.where(is_std, crcok_fix | iid_ok, is_ap)
    crcok_noseen = is_std & crcok_fix
    word = (
        addr
        | b(attempt, W_ATTEMPT)
        | b(crcok_seen, W_CRCOK_SEEN)
        | b(crcok_noseen, W_CRCOK_NOSEEN)
        | b(is_std & crcok_fix & clean, W_ADDABLE)
        | b(is_long, W_LONG)
    )
    aux = dict(
        errors0=errors == 0,
        fixed_one=nfix == 1,
        fixed_two=nfix == 2,
        clean=clean,
        long=is_long,
        errorbit=errorbit,
    )
    return word, msg_fixed, aux


# -----------------------------------------------------------------------------
# The sequential state machine: one packed decision word per candidate.
# Two interchangeable backends with an identical contract over the flat
# candidate stream (valid slots are a contiguous prefix of each buffer's
# fixed-width row; invalid slots are provable no-ops):
#   XLA lax.scan twin  — walks every slot (CPU path and differential oracle);
#   Pallas TPU kernel  — walks only the n_b valid slots of each buffer.
# -----------------------------------------------------------------------------


def _step_semantics(pf, w1, w2, skip, lookup, add):
    """Shared per-candidate decision logic (both backends call this with
    backend-native `lookup(addr)` / `add(cond, addr)` callbacks; the actual
    cache write happens after the step, at most one per candidate — a pass-1
    add implies good1, so pass 2 never attempts).

    Returns (word, new_skip)."""
    pos = pf & PF_POS_MASK
    skip = jnp.where((pf & PF_NEWBUF) != 0, 0, skip)
    run = ((pf & PF_VALID) != 0) & (pos >= skip)

    def one_pass(w, run_p):
        addr = w & W_ADDR_MASK
        seen = lookup(addr)
        att = run_p & ((w & W_ATTEMPT) != 0)
        crcok = jnp.where(
            seen, (w & W_CRCOK_SEEN) != 0, (w & W_CRCOK_NOSEEN) != 0
        )
        good = att & crcok
        add(att & ((w & W_ADDABLE) != 0), addr)
        return att, crcok, good, (w & W_LONG) != 0

    # ---- pass 1 (uncorrected) --------------------------------------------
    att1, crcok1, good1, long1 = one_pass(w1, run)
    skip = jnp.where(
        good1, pos + SKIP_SHORT + jnp.where(long1, SKIP_EXTRA_LONG, 0), skip
    )

    # ---- pass 2 (phase-corrected retry; noise-gate failure on pass 1
    # skips it entirely, dump1090.c:1724-1726) -----------------------------
    run2 = run & ((pf & PF_GATE1) != 0) & ~good1
    att2, crcok2, good2, long2 = one_pass(w2, run2)
    skip = jnp.where(
        good2, pos + SKIP_SHORT + jnp.where(long2, SKIP_EXTRA_LONG, 0), skip
    )

    def rb(flag, bit):
        return flag.astype(jnp.int32) * bit

    word = (
        rb(run, R_RUN) | rb(att1, R_ATT1) | rb(crcok1, R_CRCOK1)
        | rb(good1, R_GOOD1) | rb(run2, R_RUN2) | rb(att2, R_ATT2)
        | rb(crcok2, R_CRCOK2) | rb(good2, R_GOOD2)
    )
    return word, skip


def _resolve_words_xla(pf, w1, w2, cache_addr, cache_ts, now, skip0=0):
    # NB: a `jnp.int32(0)` default here would materialize a device array at
    # IMPORT time — committing the JAX backend before the CLI/tools can pin
    # a platform, and hanging the import entirely when the TPU tunnel is
    # wedged; the scan below asarray-converts whatever it gets
    """lax.scan backend — exact but slow on TPU (~us/step); used on CPU and
    as the differential oracle for the Pallas kernel.  Walks EVERY slot of
    the flat stream; invalid slots (valid bit clear) are no-ops that emit
    word 0."""

    def step(carry, xs):
        skip, ca, ct = carry
        pf_i, w1_i, w2_i = xs
        state = {}

        def lookup(addr):
            h = icao_hash(addr)
            a = lax.dynamic_slice_in_dim(ca, h, 1)[0]
            t = lax.dynamic_slice_in_dim(ct, h, 1)[0]
            return (a == addr) & (a != 0) & (now - t <= ICAO_CACHE_TTL)

        def add(cond, addr):
            prev = state.get("add")
            if prev is None:
                state["add"] = (cond, addr)
            else:
                pc, pa = prev
                state["add"] = (pc | cond, jnp.where(pc, pa, addr))

        word, skip = _step_semantics(pf_i, w1_i, w2_i, skip, lookup, add)
        cond, addr = state["add"]
        h = icao_hash(addr)
        cur_a = lax.dynamic_slice_in_dim(ca, h, 1)
        cur_t = lax.dynamic_slice_in_dim(ct, h, 1)
        ca = lax.dynamic_update_slice_in_dim(
            ca, jnp.where(cond, addr[None], cur_a), h, 0
        )
        ct = lax.dynamic_update_slice_in_dim(
            ct, jnp.where(cond, jnp.full_like(cur_t, now), cur_t), h, 0
        )
        return (skip, ca, ct), word

    (skip_end, ca, ct), words = lax.scan(
        step, (jnp.asarray(skip0, jnp.int32), cache_addr, cache_ts),
        (pf, w1, w2), unroll=4
    )
    return words, ca, ct, skip_end


def normalize_max_candidates(mc: int) -> int:
    """Round mc up to a kernel-valid candidate width.  Any value up to
    RESOLVE_CHUNK packs whole buffers per grid step; beyond that the slot
    rows must tile exactly into RESOLVE_CHUNK-slot steps.  Every device
    entry point routes through this so arbitrary user max_candidates and
    their sticky-growth/adapt-down derivatives (e.g. 300 -> 4800 after two
    x4 growths, or 20480//4 = 5120 on shrink) can't crash _chunk_geometry
    mid-decode."""
    if mc > RESOLVE_CHUNK and mc % RESOLVE_CHUNK:
        mc += RESOLVE_CHUNK - (mc % RESOLVE_CHUNK)
    return mc


def _chunk_geometry(mc: int, n_buffers: int) -> tuple[int, int, int]:
    """(chunk_slots, buffers_padded, grid) for the kernel's block layout.

    Each grid step owns `chunk_slots` consecutive stream slots; buffer rows
    are mc slots wide.  mc <= RESOLVE_CHUNK packs whole buffers per chunk
    (chunk = floor(CHUNK/mc)*mc); larger mc spans one buffer across
    mc/CHUNK chunks (sticky growth keeps mc a multiple of RESOLVE_CHUNK
    there)."""
    if mc <= RESOLVE_CHUNK:
        bufs_per_chunk = RESOLVE_CHUNK // mc
        chunk = bufs_per_chunk * mc
        nbp = -(-n_buffers // bufs_per_chunk) * bufs_per_chunk
    else:
        if mc % RESOLVE_CHUNK:
            raise ValueError(
                f"max_candidates {mc} > {RESOLVE_CHUNK} must be a multiple "
                f"of {RESOLVE_CHUNK}"
            )
        chunk = RESOLVE_CHUNK
        nbp = n_buffers
    return chunk, nbp, nbp * mc // chunk


def _resolve_kernel_factory(mc: int, chunk: int, cps: int | None = None):
    """Pallas TPU kernel: the candidate loop on the scalar core, ICAO cache
    in SMEM.  ~82 ns per executed step; per-buffer counts are scalar-
    prefetched so only the valid prefix of each buffer's slot row runs —
    skipped slots' output words are garbage and are zeroed by the caller's
    valid mask.

    cps (chunks per stream): None = one sequential stream, cache loaded at
    the first grid step and stored at the last.  An int = the flat slot
    stream is a concatenation of INDEPENDENT streams of cps chunks each
    (decode_captures sharing one dispatch across captures): the kernel swaps
    the SMEM cache at stream boundaries — the caches arrive FLATTENED to
    (S * ICAO_CACHE_LEN,) and each grid step's block is its stream's
    1024-slot row (TPU block shapes must be 1-D-divisible by 128; a (1,
    1024) 2-D row block does not lower).

    h12 carries both passes' precomputed ICAO-cache hash slots (pass1 in
    bits 0..9, pass2 in bits 10..19): one extra SMEM load replaces six
    32-bit multiplies+shifts per step — measured 93 -> 74 ns/step in situ
    (the round-2 toy-body measurement that called this a wash does not hold
    inside the full kernel, where the loads pipeline)."""

    def kernel(nbuf_ref, now_ref,
               pf_ref, w1_ref, w2_ref, h12_ref, ca_in_ref, ct_in_ref,
               words_ref, ca_out_ref, ct_out_ref,
               ca_ref, ct_ref, skip_ref):
        c = pl.program_id(0)
        nc = pl.num_programs(0)
        now = now_ref[0]

        def load_cache(i, _):
            ca_ref[i] = ca_in_ref[i]
            ct_ref[i] = ct_in_ref[i]
            return 0

        def store_cache(i, _):
            ca_out_ref[i] = ca_ref[i]
            ct_out_ref[i] = ct_ref[i]
            return 0

        @pl.when(c == 0 if cps is None else c % cps == 0)
        def _():
            skip_ref[0] = 0
            lax.fori_loop(0, ICAO_CACHE_LEN, load_cache, 0)

        def step(i, skip):
            state = {}
            h12 = h12_ref[i]
            # _step_semantics calls lookup exactly once per pass, in pass
            # order — the trace-time counter selects the matching
            # prefetched hash (bits 0..9 pass 1, 10..19 pass 2)
            hs = [h12 & 0x3FF, (h12 >> 10) & 0x3FF]
            ncall = [0]

            def lookup(addr):
                h = hs[ncall[0]]
                ncall[0] += 1
                a = ca_ref[h]
                t = ct_ref[h]
                return (a == addr) & (a != 0) & (now - t <= ICAO_CACHE_TTL)

            def add(cond, addr):
                # the pass whose lookup just ran is the one adding
                h = hs[ncall[0] - 1]
                prev = state.get("add")
                if prev is None:
                    state["add"] = (cond, addr, h)
                else:
                    pc, pa, ph = prev
                    state["add"] = (
                        pc | cond,
                        jnp.where(pc, pa, addr),
                        jnp.where(pc, ph, h),
                    )

            word, skip = _step_semantics(
                pf_ref[i], w1_ref[i], w2_ref[i], skip, lookup, add
            )
            cond, addr, h = state["add"]

            @pl.when(cond)
            def _():
                ca_ref[h] = addr
                ct_ref[h] = now

            words_ref[i] = word
            return skip

        if mc <= RESOLVE_CHUNK:
            bufs_per_chunk = chunk // mc

            def buf_body(bi, skip):
                cnt = nbuf_ref[c * bufs_per_chunk + bi]
                base = bi * mc
                return lax.fori_loop(
                    0, cnt, lambda k, s: step(base + k, s), skip
                )

            skip_ref[0] = lax.fori_loop(0, bufs_per_chunk, buf_body, skip_ref[0])
        else:
            chunks_per_buf = mc // chunk
            cnt = jnp.clip(
                nbuf_ref[c // chunks_per_buf] - (c % chunks_per_buf) * chunk,
                0, chunk,
            )
            skip_ref[0] = lax.fori_loop(0, cnt, step, skip_ref[0])

        @pl.when(c == nc - 1 if cps is None else c % cps == cps - 1)
        def _():
            lax.fori_loop(0, ICAO_CACHE_LEN, store_cache, 0)

    return kernel


def _hash_words(w1, w2):
    """Both passes' ICAO-cache hash slots packed per candidate (pass1 bits
    0..9, pass2 bits 10..19) — prefetched into the kernel's SMEM stream."""
    return icao_hash(w1 & W_ADDR_MASK) | (icao_hash(w2 & W_ADDR_MASK) << 10)


def _resolve_words_pallas(pf, w1, w2, nbuf, cache_addr, cache_ts, now, *,
                          mc: int, interpret: bool = False):
    """Pallas backend over the flat candidate stream.

    pf/w1/w2: int32[NBUF * mc] (whole buffers, fixed-width rows); nbuf:
    int32[NBUF] per-buffer valid-candidate counts (pre-clamped to mc).
    Returns (words, ca', ct') with words ALREADY masked to zero on
    skipped/invalid slots."""
    n_buffers = nbuf.shape[0]
    chunk, nbp, grid = _chunk_geometry(mc, n_buffers)
    n = pf.shape[0]
    n_pad = nbp * mc
    h12 = _hash_words(w1, w2)
    if n_pad != n:  # pad with empty pseudo-buffers (count 0 -> never walked)
        z = jnp.zeros(n_pad - n, jnp.int32)
        pf = jnp.concatenate([pf, z])
        w1 = jnp.concatenate([w1, z])
        w2 = jnp.concatenate([w2, z])
        h12 = jnp.concatenate([h12, z])
    if nbp != n_buffers:
        nbuf = jnp.concatenate(
            [nbuf, jnp.zeros(nbp - n_buffers, jnp.int32)]
        )

    blk = lambda c, *_: (c,)  # noqa: E731
    rep = lambda c, *_: (0,)  # noqa: E731
    words, ca, ct = pl.pallas_call(
        _resolve_kernel_factory(mc, chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
                pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
                pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
            jax.ShapeDtypeStruct((ICAO_CACHE_LEN,), jnp.int32),
            jax.ShapeDtypeStruct((ICAO_CACHE_LEN,), jnp.int32),
        ],
        interpret=interpret,
    )(nbuf, jnp.asarray(now, jnp.int32).reshape(1),
      pf, w1, w2, h12, cache_addr, cache_ts)
    # skipped slots hold stale SMEM block contents: zero them (the XLA twin
    # emits exact zeros there, and stats/emission read the whole array)
    slot = jnp.arange(n, dtype=jnp.int32)
    valid = (slot % mc) < jnp.repeat(nbuf[: n // mc], mc)
    return jnp.where(valid, words[:n], 0), ca, ct


def _resolve_words_pallas_streams(pf, w1, w2, nbuf, cache_addr, cache_ts,
                                  now, *, mc: int, n_streams: int,
                                  interpret: bool = False):
    """Pallas backend over S INDEPENDENT candidate streams in one kernel
    call: pf/w1/w2 are the per-stream flat streams concatenated
    ((S * NBp * mc,), each stream padded to whole chunks), nbuf is (S *
    NBp,), and cache_addr/cache_ts are (S, ICAO_CACHE_LEN) per-stream
    caches — swapped in SMEM at stream boundaries.  Returns (words
    [unmasked — callers mask by validity], ca' (S, L), ct' (S, L))."""
    nbp = nbuf.shape[0] // n_streams
    chunk, nbp_pad, grid_per = _chunk_geometry(mc, nbp)
    if nbp_pad != nbp:
        raise ValueError(
            f"per-stream buffer count {nbp} must fill whole {chunk}-slot "
            f"chunks (pad streams with empty pseudo-buffers first)"
        )
    n = pf.shape[0]
    grid = grid_per * n_streams
    h12 = _hash_words(w1, w2)

    blk = lambda c, *_: (c,)  # noqa: E731
    srow = lambda c, *_: (c // grid_per,)  # noqa: E731
    words, ca, ct = pl.pallas_call(
        _resolve_kernel_factory(mc, chunk, cps=grid_per),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((ICAO_CACHE_LEN,), srow, memory_space=pltpu.SMEM),
                pl.BlockSpec((ICAO_CACHE_LEN,), srow, memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((chunk,), blk, memory_space=pltpu.SMEM),
                pl.BlockSpec((ICAO_CACHE_LEN,), srow, memory_space=pltpu.SMEM),
                pl.BlockSpec((ICAO_CACHE_LEN,), srow, memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n_streams * ICAO_CACHE_LEN,), jnp.int32),
            jax.ShapeDtypeStruct((n_streams * ICAO_CACHE_LEN,), jnp.int32),
        ],
        interpret=interpret,
    )(nbuf, jnp.asarray(now, jnp.int32).reshape(1),
      pf, w1, w2, h12,
      cache_addr.reshape(n_streams * ICAO_CACHE_LEN),
      cache_ts.reshape(n_streams * ICAO_CACHE_LEN))
    return (words, ca.reshape(n_streams, ICAO_CACHE_LEN),
            ct.reshape(n_streams, ICAO_CACHE_LEN))


@functools.partial(
    jax.jit,
    static_argnames=("scan_len", "max_candidates", "max_out", "crcok_only",
                     "pallas"),
)
def demod_resolve_streams(
    xs: jax.Array,
    cache_addr: jax.Array,
    cache_ts: jax.Array,
    now: jax.Array,
    fix_errors: jax.Array,
    aggressive: jax.Array,
    *,
    scan_len: int,
    max_candidates: int,
    max_out: int,
    crcok_only: bool = False,
    pallas: bool | None = None,
):
    """S INDEPENDENT capture streams share one fused demod+resolve dispatch
    (the data parallelism of api.decode_captures, device edition): xs is
    (S, NB, nbytes) uint8 — or the same wire bytes as (S, NB, nbytes/2)
    uint16 pairs, the preferred upload form (see _group_front) — stream
    s's next NB buffers — and
    cache_addr/cache_ts are (S, ICAO_CACHE_LEN) per-stream ICAO caches.
    Each stream resolves exactly as if decoded alone (per-stream skip state,
    per-stream cache swapped in SMEM at stream boundaries of the single
    kernel pass); results are bit-identical to decode_capture per stream.

    Returns (n (S, NB), count (S,), msg (S, max_out, 14), meta (S, max_out),
    stats (S, 8), cache_addr' (S, L), cache_ts' (S, L)) — the unpacked
    demod_resolve_group layout with a leading stream axis."""
    from ..parallel.sharding import demod_batch

    if pallas is None:
        pallas = _use_pallas_resolve()
    if scan_len > PF_POS_MASK:
        raise ValueError(
            f"scan_len {scan_len} exceeds the {PF_POS_MASK} packed-position "
            f"limit of the resolver word layout"
        )
    max_candidates = normalize_max_candidates(max_candidates)
    s_n, nb, nbytes = xs.shape
    if pallas and s_n * nb * max_candidates * 4 > SMEM_PREFETCH_BUDGET:
        # the window-gather kernel scalar-prefetches every candidate
        # position into SMEM (~1 MB); keep streams x batch under that
        raise ValueError(
            f"{s_n} streams x {nb} buffers x {max_candidates} candidates "
            f"exceeds the gather kernel's SMEM prefetch budget; lower the "
            f"per-dispatch batch"
        )
    cand = demod_batch(
        xs.reshape(s_n * nb, nbytes), scan_len=scan_len,
        max_candidates=max_candidates, pallas=pallas,
    )
    nbuf_total, mc = cand.pos.shape
    # pad each stream's buffer row count so streams start on chunk
    # boundaries (empty pseudo-buffers cost zero kernel steps)
    chunk, nbp, _ = _chunk_geometry(mc, nb)
    n_flat = s_n * nbp * mc
    per_stream = nbp * mc

    def flat(a):
        """(S*nb, mc, ...) -> (S*nbp*mc, ...) with per-stream padding."""
        a = a.reshape((s_n, nb * mc) + a.shape[2:])
        pad = [(0, 0)] * a.ndim
        pad[1] = (0, (nbp - nb) * mc)
        a = jnp.pad(a, pad)
        return a.reshape((n_flat,) + a.shape[2:])

    fe = jnp.asarray(fix_errors).astype(bool)
    ag = jnp.asarray(aggressive).astype(bool)
    now = jnp.asarray(now).astype(jnp.int32)

    w1, msg1f, aux1 = _pass_precompute(
        flat(cand.msg1), flat(cand.errors1), flat(cand.gate1), ag, fe
    )
    w2, msg2f, aux2 = _pass_precompute(
        flat(cand.msg2), flat(cand.errors2), flat(cand.gate2), ag, fe
    )

    nbuf = jnp.pad(
        jnp.minimum(cand.n, mc).astype(jnp.int32).reshape(s_n, nb),
        ((0, 0), (0, nbp - nb)),
    ).reshape(s_n * nbp)
    slot = jnp.arange(n_flat, dtype=jnp.int32)
    valid = (slot % mc) < jnp.repeat(nbuf, mc)
    pos = flat(cand.pos)
    pf = (
        jnp.minimum(pos, PF_POS_MASK)
        | valid.astype(jnp.int32) * PF_VALID
        | ((slot % mc) == 0).astype(jnp.int32) * PF_NEWBUF
        | flat(cand.gate1).astype(jnp.int32) * PF_GATE1
    )

    ca = cache_addr.astype(jnp.int32)
    ct = cache_ts.astype(jnp.int32)
    if pallas:
        words, ca, ct = _resolve_words_pallas_streams(
            pf, w1, w2, nbuf, ca, ct, now, mc=mc, n_streams=s_n
        )
        words = jnp.where(valid, words, 0)
    else:
        # XLA twin: vmap the per-stream scan (streams advance in lockstep;
        # each stream's cache is its own carry)
        def one(pf_s, w1_s, w2_s, ca_s, ct_s):
            w, ca2, ct2, _ = _resolve_words_xla(pf_s, w1_s, w2_s, ca_s, ct_s, now)
            return w, ca2, ct2

        by = lambda a: a.reshape(s_n, per_stream)  # noqa: E731
        words, ca, ct = jax.vmap(one)(by(pf), by(w1), by(w2), ca, ct)
        words = words.reshape(n_flat)

    def by_stream(a):
        return a.reshape((s_n, per_stream) + a.shape[1:])

    aux1_s = {k: by_stream(v) for k, v in aux1.items()}
    aux2_s = {k: by_stream(v) for k, v in aux2.items()}
    post = functools.partial(
        _postprocess_batch,
        crcok_only=crcok_only, packed=False, max_out=max_out,
        max_out_short=0, max_out_long=0,
    )
    count, msg_out, meta_out, stats = jax.vmap(post)(
        by_stream(words), by_stream(msg1f), by_stream(msg2f), by_stream(pos),
        aux1_s, aux2_s,
    )
    return (cand.n.reshape(s_n, nb), count, msg_out, meta_out, stats, ca, ct)


def use_device_resolve() -> bool:
    """Backend policy for the on-device resolver (shared by api.py and the
    CLI's --tpu-device-resolve auto mode): the Pallas kernel targets TPU
    ONLY — on any other backend (cpu, gpu, ...) the pltpu grid spec cannot
    lower, so auto mode falls back to the host resolver there (the XLA scan
    backend is exact but slow; it serves tests, not products)."""
    return jax.default_backend() == "tpu"


_use_pallas_resolve = use_device_resolve  # internal alias


@functools.partial(
    jax.jit, static_argnames=("scan_len", "max_candidates", "front")
)
def _group_front(xg, *, scan_len: int, max_candidates: int,
                 front: str | None = None):
    """Program A of the two-program group pipeline: magnitudes + preamble
    predicate + position compaction for every batch of the group.

    A SEPARATE XLA program from the back half ON PURPOSE: fused into one
    program, XLA re-materializes the magnitude vector for each shifted
    predicate view and for the window gather, costing ~2 ms/batch of extra
    HBM traffic that optimization_barrier does NOT recover (measured); a
    real program boundary forces `m` to materialize once (8.7 -> 7.2
    ms/batch for the full demod+precompute+scan chain).  Outputs stay on
    the device for program B.

    xg is (G, NB, nbytes) uint8 interleaved IQ, or (G, NB, nbytes/2)
    uint16 — the SAME wire bytes viewed as little-endian I|Q<<8 pairs on
    the host (numpy `.view("<u2")`, zero-copy).  The uint16 entry is the
    fast path (round 5, chip-traced): with a u8 entry XLA lays the group
    stack out buffers-minor and the pair bitcast decomposes into
    convert+reshape+combine at T(2,128) tiling (2 of 8 sublanes, ~1.25
    ms/batch); the u16 entry makes the whole magnitude elementwise (no
    reshape to mis-lay-out) and, hoisted out of the per-batch scan, the
    front drops 2.23 -> 0.98 ms/batch (in-situ interleaved A/B: sustained
    2044 -> 2239 Ms/s, tools/measure.py --probe ab-front2).

    `front` picks the preamble-scan formulation (ops.demod.front_variant;
    every choice bit-identical)."""
    from ..ops.demod import front_candidates
    from ..ops.magnitude import magnitude_from_iq, magnitude_from_pairs

    if xg.dtype == jnp.uint16:
        m_g = magnitude_from_pairs(xg, out_dtype=jnp.uint16)
        n_pos = lax.scan(
            lambda c, mb: (c, front_candidates(
                mb, scan_len, max_candidates, front)),
            0, m_g,
        )[1]
        return m_g, n_pos[0], n_pos[1]

    def per_batch(xb):
        m = jax.vmap(lambda r: magnitude_from_iq(r, out_dtype=jnp.uint16))(xb)
        n, pos = front_candidates(m, scan_len, max_candidates, front)
        return m, n, pos

    return lax.scan(lambda c, xb: (c, per_batch(xb)), 0, xg)[1]


# NOTE: cache_addr/cache_ts are NOT donated although they look like an
# in-place carry: overflow checks (counts vs the static shapes) happen on
# the host AFTER the call, and the retry re-runs from the PRIOR state —
# which must therefore stay alive.  The state is 8 KB; copying it per group
# is noise.
@functools.partial(
    jax.jit,
    static_argnames=(
        "scan_len", "max_candidates", "max_out", "max_out_short",
        "max_out_long", "crcok_only", "pallas", "packed",
    ),
)
def _group_back(
    m_g, n_g, pos_g, cache_addr, cache_ts, now, fix_errors, aggressive, *,
    scan_len: int, max_candidates: int, max_out: int, max_out_short: int,
    max_out_long: int, crcok_only: bool, pallas: bool, packed: bool,
):
    """Program B: candidate-window gather + both demod passes + the
    order-independent precompute + the single sequential kernel pass + stats
    and emission.  Consumes program A's device-resident outputs."""
    from ..ops.demod import candidate_passes_window, gather_candidate_windows

    g_n, nb = n_g.shape
    mc = max_candidates
    per_batch = nb * mc
    n_flat = g_n * per_batch

    fe = jnp.asarray(fix_errors).astype(bool)
    ag = jnp.asarray(aggressive).astype(bool)
    now = jnp.asarray(now).astype(jnp.int32)

    # per-batch under a scan: the window-gather kernel scalar-prefetches the
    # candidate positions, so one gather over G*NB buffers would exceed its
    # SMEM budget (and per-batch keeps peak HBM at one batch's windows)
    def back_pre(_, args):
        m, n, pos = args
        w = gather_candidate_windows(m, pos, pallas=pallas)
        msg1, errors1, gate1, msg2, errors2, gate2 = jax.vmap(
            jax.vmap(candidate_passes_window)
        )(w, pos)

        def fb(a):
            return a.reshape((per_batch,) + a.shape[2:])

        w1, msg1f, aux1 = _pass_precompute(
            fb(msg1), fb(errors1), fb(gate1), ag, fe
        )
        w2, msg2f, aux2 = _pass_precompute(
            fb(msg2), fb(errors2), fb(gate2), ag, fe
        )
        nbuf_b = jnp.minimum(n, mc).astype(jnp.int32)
        slot = jnp.arange(per_batch, dtype=jnp.int32)
        valid_b = (slot % mc) < jnp.repeat(nbuf_b, mc)
        pos_b = fb(pos)
        pf_b = (
            jnp.minimum(pos_b, PF_POS_MASK)
            | valid_b.astype(jnp.int32) * PF_VALID
            | ((slot % mc) == 0).astype(jnp.int32) * PF_NEWBUF
            | fb(gate1).astype(jnp.int32) * PF_GATE1
        )
        return _, (nbuf_b, pf_b, w1, w2, msg1f, msg2f, aux1, aux2)

    _, (nbuf_st, pf_st, w1_st, w2_st, msg1f_st, msg2f_st, aux1_st,
        aux2_st) = lax.scan(back_pre, 0, (m_g, n_g, pos_g))

    def flat(a):
        return a.reshape((n_flat,) + a.shape[2:])

    pf, w1, w2 = flat(pf_st), flat(w1_st), flat(w2_st)
    msg1f, msg2f = flat(msg1f_st), flat(msg2f_st)
    aux1 = {k: flat(v) for k, v in aux1_st.items()}
    aux2 = {k: flat(v) for k, v in aux2_st.items()}
    nbuf = nbuf_st.reshape(g_n * nb)
    pos = pf & PF_POS_MASK

    ca = cache_addr.astype(jnp.int32)
    ct = cache_ts.astype(jnp.int32)
    if pallas:
        words, ca, ct = _resolve_words_pallas(
            pf, w1, w2, nbuf, ca, ct, now, mc=mc
        )
    else:
        words, ca, ct, _ = _resolve_words_xla(pf, w1, w2, ca, ct, now)

    # ---- per-batch post-processing, vectorized over the group -------------
    def by_batch(a):
        return a.reshape((g_n, per_batch) + a.shape[1:])

    aux1_b = {k: by_batch(v) for k, v in aux1.items()}
    aux2_b = {k: by_batch(v) for k, v in aux2.items()}
    post = functools.partial(
        _postprocess_batch,
        crcok_only=crcok_only, packed=packed, max_out=max_out,
        max_out_short=max_out_short, max_out_long=max_out_long,
    )
    outs = jax.vmap(post)(
        by_batch(words), by_batch(msg1f), by_batch(msg2f), by_batch(pos),
        aux1_b, aux2_b,
    )
    return (n_g,) + outs + (ca, ct)


def demod_resolve_group(
    xg: jax.Array,
    cache_addr: jax.Array,
    cache_ts: jax.Array,
    now: jax.Array,
    fix_errors: jax.Array,
    aggressive: jax.Array,
    *,
    scan_len: int,
    max_candidates: int,
    max_out: int = 0,
    max_out_short: int = 0,
    max_out_long: int = 0,
    crcok_only: bool = True,
    pallas: bool | None = None,
    packed: bool = True,
):
    """Device pipeline over a dispatch GROUP: xg is (G, NB, nbytes) uint8
    IQ — or the same wire bytes as (G, NB, nbytes/2) uint16 pairs, the
    preferred upload form (see _group_front) — every buffer demodulated,
    the whole candidate stream resolved in
    ONE Pallas kernel pass (the ICAO cache and the per-buffer skip state
    chain through it in stream order), each batch's messages emitted.  TWO
    chained XLA programs per group (front: magnitude+predicate+compaction;
    back: gather+passes+precompute+kernel+emission — see _group_front for
    why the boundary is worth ~1.5 ms/batch), both enqueued from one call;
    one fetch per G batches.  This is the sustained-throughput protocol
    (bench.py measures it; DemodPipeline._device_batches uses it for file
    decode).

    Returns, with packed=True (the raw/stats wire format):
      n        int32[G, NB]        exact preamble count per buffer
      count    int32[G]            exact emitted-message count per batch
      count_long int32[G]          how many of those are 112-bit frames
      shorts   uint8[G, mos, 9]    7 frame bytes + emission rank (lo, hi)
      longs    uint8[G, mol, 14]   14 frame bytes, in emission order
      stats    int32[G, 8]         reference counter deltas (DecoderStats order)
      cache_addr', cache_ts'
    Short rows carry their rank in the batch's emission sequence so the host
    re-interleaves exactly; long rows fill the remaining ranks in order.
    Overflow is detected from the exact counts (count-count_long > mos or
    count_long > mol), never silently truncated.

    With packed=False (the full-fidelity hub format):
      n, count, msg uint8[G, max_out, 14], meta int32[G, max_out], stats,
      cache_addr', cache_ts'
    where meta is pos<<12 | (errorbit+1)<<4 | pass<<3 | long<<2 | phase<<1
    | crcok (see the META_* constants; models/decoder.py message_from_device
    consumes it).
    """
    if pallas is None:
        pallas = _use_pallas_resolve()
    if scan_len > PF_POS_MASK:
        raise ValueError(
            f"scan_len {scan_len} exceeds the {PF_POS_MASK} packed-position "
            f"limit of the resolver word layout"
        )
    max_candidates = normalize_max_candidates(max_candidates)
    if pallas and xg.shape[1] * max_candidates * 4 > SMEM_PREFETCH_BUDGET:
        raise ValueError(
            f"batch_buffers {xg.shape[1]} x max_candidates {max_candidates} "
            f"positions exceed the window-gather SMEM prefetch budget "
            f"({SMEM_PREFETCH_BUDGET} B) — lower batch_buffers (--tpu-batch) "
            f"or max_candidates (see max_candidates_cap)"
        )
    if packed and max_out_short + max_out_long > PACKED_RANK_LIMIT:
        raise ValueError(
            f"max_out_short + max_out_long = "
            f"{max_out_short + max_out_long} exceeds the "
            f"{PACKED_RANK_LIMIT}-message packed rank field; use "
            f"clamp_packed_out on the allocations"
        )
    m_g, n_g, pos_g = _group_front(
        xg, scan_len=scan_len, max_candidates=max_candidates
    )
    return _group_back(
        m_g, n_g, pos_g, cache_addr, cache_ts, now, fix_errors, aggressive,
        scan_len=scan_len, max_candidates=max_candidates, max_out=max_out,
        max_out_short=max_out_short, max_out_long=max_out_long,
        crcok_only=crcok_only, pallas=pallas, packed=packed,
    )


def _postprocess_batch(words, msg1f, msg2f, pos, aux1, aux2, *,
                       crcok_only, packed, max_out, max_out_short,
                       max_out_long):
    """Stats + message emission for ONE batch's decision words (vmapped over
    the group).  All order-independent: derived from the sequential pass's
    packed words (dump1090.c:1737-1753 detect-path counters incl. the
    single-bit double count, dump1090.c:1122-1126 decode path; see
    models/resolver.py for the host twin)."""
    n_slots = words.shape[0]
    bit = lambda w, b: (w & b) != 0  # noqa: E731
    att1, crcok1 = bit(words, R_ATT1), bit(words, R_CRCOK1)
    run2, att2 = bit(words, R_RUN2), bit(words, R_ATT2)
    crcok2, good2 = bit(words, R_CRCOK2), bit(words, R_GOOD2)

    def s(a):
        return a.sum().astype(jnp.int32)

    d1 = att1 & crcok1  # pass-1 detect stats are gated on final crcok
    fixflag1 = d1 & ~aux1["clean"]
    fixflag2 = att2 & ~aux2["clean"]
    stats = jnp.stack([
        s(bit(words, R_RUN)),                              # valid_preamble
        s(run2 & (pos > 0)),                               # out_of_phase
        s(d1 & aux1["errors0"]) + s(att2 & aux2["errors0"]),   # demodulated
        s(d1 & aux1["clean"]) + s(att2 & crcok2 & aux2["clean"]),  # goodcrc
        s(att2 & ~crcok2 & aux2["clean"]) + s(fixflag1) + s(fixflag2),  # badcrc
        s(fixflag1) + s(fixflag2),                         # fixed
        # detect path always bumps single_bit (errorbit < 112 quirk);
        # decode path counts the true split on every decode attempt
        s(fixflag1) + s(fixflag2)
        + s(att1 & aux1["fixed_one"]) + s(att2 & aux2["fixed_one"]),
        s(att1 & aux1["fixed_two"]) + s(att2 & aux2["fixed_two"]),
    ])

    # ---- compact emitted messages (first-K in scan order) -----------------
    emit1 = att1 & crcok1 if crcok_only else att1
    emit2 = att2 & crcok2 if crcok_only else att2
    emask = jnp.stack([emit1, emit2], axis=1).reshape(2 * n_slots)
    count = emask.sum().astype(jnp.int32)
    long_slot = jnp.stack([aux1["long"], aux2["long"]], axis=1).reshape(2 * n_slots)
    msgs12 = jnp.stack([msg1f, msg2f], axis=1).reshape(2 * n_slots, 14)

    g = jnp.arange(2 * n_slots, dtype=jnp.int32)

    def first_k(mask, k):
        """Indices of the first k set slots in scan order (+ validity)."""
        score = jnp.where(mask, -g, jnp.int32(-(2**30)))
        kk = min(k, 2 * n_slots)
        vals, _ = lax.top_k(score, kk)
        if kk < k:
            vals = jnp.concatenate(
                [vals, jnp.full(k - kk, -(2**30), jnp.int32)]
            )
        sel = jnp.minimum(-vals, jnp.int32(2 * n_slots - 1))
        return sel, -vals < 2**30 - 1

    if packed:
        count_long = (emask & long_slot).sum().astype(jnp.int32)
        rank = jnp.cumsum(emask.astype(jnp.int32)) - emask.astype(jnp.int32)
        sel_s, ok_s = first_k(emask & ~long_slot, max_out_short)
        sel_l, ok_l = first_k(emask & long_slot, max_out_long)
        rank_s = jnp.where(ok_s, jnp.take(rank, sel_s), 0)
        shorts = jnp.concatenate(
            [
                jnp.take(msgs12[:, :7], sel_s, axis=0),
                (rank_s & 0xFF).astype(jnp.uint8)[:, None],
                ((rank_s >> 8) & 0xFF).astype(jnp.uint8)[:, None],
            ],
            axis=1,
        )
        longs = jnp.take(msgs12, sel_l, axis=0)
        return count, count_long, shorts, longs, stats

    gsel, sel_valid = first_k(emask, max_out)
    p_sel = (gsel & 1) == 1
    msg_out = jnp.take(msgs12, gsel, axis=0)
    crcok_slot = jnp.stack([crcok1, crcok2], axis=1).reshape(2 * n_slots)
    phase_slot = jnp.stack(
        [jnp.zeros_like(good2), good2], axis=1
    ).reshape(2 * n_slots)
    errbit_slot = jnp.stack(
        [aux1["errorbit"], aux2["errorbit"]], axis=1
    ).reshape(2 * n_slots)
    meta_slot = (
        crcok_slot.astype(jnp.int32) * META_CRCOK
        + phase_slot.astype(jnp.int32) * META_PHASE
        + long_slot.astype(jnp.int32) * META_LONG
        + ((errbit_slot + 1) << META_ERRBIT_SHIFT)
        + (jnp.repeat(pos, 2) << META_POS_SHIFT)
    )
    meta_out = jnp.where(
        sel_valid,
        jnp.take(meta_slot, gsel) + p_sel.astype(jnp.int32) * META_PASS,
        -1,
    )
    return count, msg_out, meta_out, stats


def demod_resolve_batch(
    iq_buffers: jax.Array,
    cache_addr: jax.Array,
    cache_ts: jax.Array,
    now: jax.Array,
    fix_errors: jax.Array,
    aggressive: jax.Array,
    *,
    scan_len: int,
    max_candidates: int,
    max_out: int = 0,
    max_out_short: int = 0,
    max_out_long: int = 0,
    crcok_only: bool = True,
    pallas: bool | None = None,
    packed: bool = False,
):
    """Single-batch convenience wrapper over demod_resolve_group (G = 1):
    (NB, nbytes) uint8 IQ -> emitted messages.

    Unpacked returns (n[NB], count, msg[max_out,14], meta[max_out], stats[8],
    cache_addr', cache_ts'); packed returns (n, count, count_long, shorts,
    longs, stats, cache_addr', cache_ts') — see demod_resolve_group for the
    layouts (meta: pos<<12 | (errorbit+1)<<4 | pass<<3 | long<<2 | phase<<1
    | crcok)."""
    outs = demod_resolve_group(
        iq_buffers[None], cache_addr, cache_ts, now, fix_errors, aggressive,
        scan_len=scan_len, max_candidates=max_candidates, max_out=max_out,
        max_out_short=max_out_short, max_out_long=max_out_long,
        crcok_only=crcok_only, pallas=pallas, packed=packed,
    )
    ca, ct = outs[-2], outs[-1]
    return tuple(o[0] for o in outs[:-2]) + (ca, ct)


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "max_out", "crcok_only", "pallas"),
)
def resolve_candidate_segments(
    pos, msg1, errors1, gate1, msg2, errors2, gate2, nseg, row_id,
    cache_addr, cache_ts, now, fix_errors, aggressive, *,
    n_rows: int, max_out: int, crcok_only: bool = False,
    pallas: bool | None = None,
):
    """Device resolve over pre-demodulated candidate SEGMENTS — the
    multi-chip path's second stage: the time-sharded demod
    (parallel/sharding.py) leaves each shard's candidates on its device;
    this program consumes them (XLA inserts the all-gather over ICI) and
    runs the same sequential skip/ICAO-cache replay as demod_resolve_group,
    keeping the whole multi-chip decode on-device end to end (round-2 did
    this stage on the host from fetched candidate arrays).

    pos..gate2: (S, mc) per-segment candidate fields with stream-GLOBAL
    positions in scan order (segments are fixed-width rows whose valid
    candidates are a contiguous prefix; invalid pos = 2**30 sentinel).
    nseg: int32[S] valid-candidate count per segment.  row_id: int32[S]
    monotone index in [0, n_rows) — segments of one row share a reference
    buffer, so the skip-until state resets at each row's FIRST VALID
    candidate (mid-row segment boundaries do NOT reset it, unlike buffer
    rows in demod_resolve_group) and the ICAO cache chains across all.

    Returns (count, msg[max_out, 14], meta[max_out], stats[8], cache_addr',
    cache_ts') in the unpacked demod_resolve_group layout."""
    if pallas is None:
        pallas = _use_pallas_resolve()
    s_n, mc = pos.shape
    n_flat = s_n * mc

    def flat(a):
        return a.reshape((n_flat,) + a.shape[2:])

    fe = jnp.asarray(fix_errors).astype(bool)
    ag = jnp.asarray(aggressive).astype(bool)
    now = jnp.asarray(now).astype(jnp.int32)

    w1, msg1f, aux1 = _pass_precompute(
        flat(msg1), flat(errors1), flat(gate1), ag, fe
    )
    w2, msg2f, aux2 = _pass_precompute(
        flat(msg2), flat(errors2), flat(gate2), ag, fe
    )

    nseg_c = jnp.minimum(nseg, mc).astype(jnp.int32)
    slot = jnp.arange(n_flat, dtype=jnp.int32)
    valid = (slot % mc) < jnp.repeat(nseg_c, mc)
    # a row's first valid candidate: its exclusive running valid count
    # equals the row's base count (valid slots in all prior rows)
    vi = valid.astype(jnp.int32)
    excl = jnp.cumsum(vi) - vi
    seg_base = jnp.cumsum(nseg_c) - nseg_c
    row_base = jax.ops.segment_min(
        seg_base, row_id, num_segments=n_rows, indices_are_sorted=True
    )
    newbuf = valid & (excl == jnp.repeat(row_base[row_id], mc))
    pos_f = flat(pos)
    pf = (
        jnp.minimum(pos_f, PF_POS_MASK)
        | vi * PF_VALID
        | newbuf.astype(jnp.int32) * PF_NEWBUF
        | flat(gate1).astype(jnp.int32) * PF_GATE1
    )

    ca = cache_addr.astype(jnp.int32)
    ct = cache_ts.astype(jnp.int32)
    if pallas:
        words, ca, ct = _resolve_words_pallas(
            pf, w1, w2, nseg_c, ca, ct, now, mc=mc
        )
    else:
        words, ca, ct, _ = _resolve_words_xla(pf, w1, w2, ca, ct, now)

    count, msg_out, meta_out, stats = _postprocess_batch(
        words, msg1f, msg2f, pos_f, aux1, aux2,
        crcok_only=crcok_only, packed=False, max_out=max_out,
        max_out_short=0, max_out_long=0,
    )
    return count, msg_out, meta_out, stats, ca, ct


def interleave_packed(count, count_long, shorts, longs):
    """Host-side reconstruction of one batch's emission stream from the
    packed wire format: (msg uint8[count, 14] zero-padded short rows,
    bits int[count]) in exact scan order."""
    c = int(count)
    cl = int(count_long)
    cs = c - cl
    msg = np.zeros((c, 14), dtype=np.uint8)
    is_long = np.ones(c, dtype=bool)
    if cs:
        sh = np.asarray(shorts[:cs])
        ranks = sh[:, 7].astype(np.int64) | (sh[:, 8].astype(np.int64) << 8)
        is_long[ranks] = False
        msg[~is_long, :7] = sh[:, :7]
    if cl:
        msg[is_long] = np.asarray(longs[:cl])
    bits = np.where(is_long, 112, 56)
    return msg, bits
