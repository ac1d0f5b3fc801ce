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
    (dump1090.c:862-865 — duplicates must resolve to the same entry) runs as
    13 vectorized probe rounds over all candidates at once; bit flips are
    applied with one-hot byte masks;
  * the brute-force AP address (dump1090.c:942-983) — algebraically the
    address IS the syndrome (AP = CRC xor addr, so syndrome = addr), no
    extra work at all.

What remains is genuinely sequential: the skip-until position (reset per
buffer, advanced past good messages, dump1090.c:1769-1771) and the
1024-entry ICAO cache whose hits gate AP/IID acceptance (dump1090.c:942-983,
1196-1209).  Per candidate that is ~60 scalar decisions — pathological for
XLA (a lax.scan issues each op as a serialized vector instruction, measured
~23 us/step on v5e) but trivial for a Pallas kernel running the loop on the
scalar core with the cache in SMEM (measured ~0.2 us/step, see
_resolve_words_pallas).  The kernel consumes three packed int32 words per
candidate and emits ONE packed decision word; stat counters and message
emission are derived from the words vectorized, after the fact.

The ICAO cache lives on the device between batches (donated carry), exactly
like Modes.icao_cache persists across buffers in the reference.  Timestamps
are int32 unix seconds — the same 2038 horizon as a 32-bit time_t build of
the reference; one `now` per batch matches the native batch resolver
(native/__init__.py resolve_blocks_records), which also samples the clock
once per batch.

Emitted messages are compacted with the same first-K top_k pattern as the
demodulator and returned as fixed-shape (max_out, 14) bytes + one packed
int32 of metadata per message, with the exact emission count for overflow
detection (never silent truncation).
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
# w1/w2 (per pass): addr (bits 0..23) | attempt<<24 | is_std<<25 | is_ap<<26 |
#                   iid_small<<27 | crcok_fix<<28 | clean<<29 | long<<30
PF_POS_MASK = (1 << 17) - 1
PF_VALID = 1 << 17
PF_NEWBUF = 1 << 18
PF_GATE1 = 1 << 19
W_ADDR_MASK = (1 << 24) - 1
W_ATTEMPT = 1 << 24
W_STD = 1 << 25
W_AP = 1 << 26
W_IID = 1 << 27
W_CRCOK_FIX = 1 << 28
W_CLEAN = 1 << 29
W_LONG = 1 << 30

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
# (errorbit+1 in [0, 112]: 0 = no fix applied; pos <= SCAN_POSITIONS < 2^18)
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

    Returns (packed word, msg_fixed, aux dict of pure flags for stats)."""
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
    word = (
        addr
        | b(attempt, W_ATTEMPT)
        | b(is_std, W_STD)
        | b(is_ap, W_AP)
        | b(~crcok_fix & is11 & (syn < DF11_IID_MAX_SYNDROME), W_IID)
        | b(crcok_fix, W_CRCOK_FIX)
        | b(errorbit == -1, W_CLEAN)
        | b(is_long, W_LONG)
    )
    aux = dict(
        errors0=errors == 0,
        fixed_one=nfix == 1,
        fixed_two=nfix == 2,
        clean=errorbit == -1,
        long=is_long,
        errorbit=errorbit,
    )
    return word, msg_fixed, aux


# -----------------------------------------------------------------------------
# The sequential state machine: one packed decision word per candidate.
# Two interchangeable backends with an identical contract:
#   (pf, w1, w2, cache_addr, cache_ts, now) ->
#       (words int32[N], cache_addr', cache_ts')
# -----------------------------------------------------------------------------


def _step_semantics(pf, w1, w2, skip, lookup, add):
    """Shared per-candidate decision logic (both backends call this with
    backend-native `lookup(addr)` / `add(addr)` callbacks).

    Returns (word, new_skip)."""
    pos = pf & PF_POS_MASK
    skip = jnp.where((pf & PF_NEWBUF) != 0, 0, skip)
    run = ((pf & PF_VALID) != 0) & (pos >= skip)

    def unpack(w):
        return (
            w & W_ADDR_MASK,
            (w & W_ATTEMPT) != 0,
            (w & W_STD) != 0,
            (w & W_AP) != 0,
            (w & W_IID) != 0,
            (w & W_CRCOK_FIX) != 0,
            (w & W_CLEAN) != 0,
            (w & W_LONG) != 0,
        )

    # ---- pass 1 (uncorrected) --------------------------------------------
    addr1, att_p1, std1, ap1, iid1, fix1, clean1, long1 = unpack(w1)
    att1 = run & att_p1
    seen1 = lookup(addr1)
    crcok1 = jnp.where(std1, fix1 | (iid1 & seen1), ap1 & seen1)
    good1 = att1 & crcok1
    skip = jnp.where(
        good1, pos + SKIP_SHORT + jnp.where(long1, SKIP_EXTRA_LONG, 0), skip
    )
    add(att1 & std1 & fix1 & clean1, addr1)

    # ---- pass 2 (phase-corrected retry; noise-gate failure on pass 1
    # skips it entirely, dump1090.c:1724-1726) -----------------------------
    run2 = run & ((pf & PF_GATE1) != 0) & ~good1
    addr2, att_p2, std2, ap2, iid2, fix2, clean2, long2 = unpack(w2)
    att2 = run2 & att_p2
    seen2 = lookup(addr2)
    crcok2 = jnp.where(std2, fix2 | (iid2 & seen2), ap2 & seen2)
    good2 = att2 & crcok2
    skip = jnp.where(
        good2, pos + SKIP_SHORT + jnp.where(long2, SKIP_EXTRA_LONG, 0), skip
    )
    add(att2 & std2 & fix2 & clean2, addr2)

    def rb(flag, bit):
        return flag.astype(jnp.int32) * bit

    word = (
        rb(run, R_RUN) | rb(att1, R_ATT1) | rb(crcok1, R_CRCOK1)
        | rb(good1, R_GOOD1) | rb(run2, R_RUN2) | rb(att2, R_ATT2)
        | rb(crcok2, R_CRCOK2) | rb(good2, R_GOOD2)
    )
    return word, skip


def _resolve_words_xla(pf, w1, w2, cache_addr, cache_ts, now,
                       skip0=jnp.int32(0)):
    """lax.scan backend — exact but slow on TPU (~us/step); used on CPU and
    as the differential oracle for the Pallas kernel.  skip0 seeds the
    skip-until state (nonzero only when resuming a mid-buffer segment)."""

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
            # at most one add fires per candidate (a pass-1 add implies
            # good1, so pass 2 never runs); fold into one predicated update
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


RESOLVE_CHUNK = 2048  # candidates per Pallas grid step
# cap on candidates per sequential pass: 3 packed int32 words per candidate
# must fit the Pallas scalar-prefetch (SMEM) budget; larger batches segment
# at buffer boundaries (demod_resolve_batch)
MAX_SCAN_SEGMENT = 32768


def _resolve_kernel(pf_ref, w1_ref, w2_ref, now_ref, skip_in_ref,
                    ca_in_ref, ct_in_ref,
                    words_ref, ca_out_ref, ct_out_ref, skip_out_ref,
                    ca_ref, ct_ref, skip_ref):
    """Pallas TPU kernel: the candidate loop on the scalar core, ICAO cache
    in SMEM.  ~0.2 us per candidate (vs ~23 us/step for the XLA scan)."""
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    now = now_ref[0]

    @pl.when(c == 0)
    def _():
        skip_ref[0] = skip_in_ref[0]

        def cp(i, _):
            ca_ref[i] = ca_in_ref[i]
            ct_ref[i] = ct_in_ref[i]
            return 0

        lax.fori_loop(0, ICAO_CACHE_LEN, cp, 0)

    base = c * RESOLVE_CHUNK

    def body(k, skip):
        i = base + k
        state = {}

        def lookup(addr):
            h = icao_hash(addr)
            a = ca_ref[h]
            t = ct_ref[h]
            return (a == addr) & (a != 0) & (now - t <= ICAO_CACHE_TTL)

        def add(cond, addr):
            prev = state.get("add")
            if prev is None:
                state["add"] = (cond, addr)
            else:
                pc, pa = prev
                state["add"] = (pc | cond, jnp.where(pc, pa, addr))

        word, skip = _step_semantics(
            pf_ref[i], w1_ref[i], w2_ref[i], skip, lookup, add
        )
        cond, addr = state["add"]

        @pl.when(cond)
        def _():
            h = icao_hash(addr)
            ca_ref[h] = addr
            ct_ref[h] = now

        words_ref[k] = word
        return skip

    skip_ref[0] = lax.fori_loop(0, RESOLVE_CHUNK, body, skip_ref[0])

    @pl.when(c == nc - 1)
    def _():
        skip_out_ref[0] = skip_ref[0]

        def cp(i, _):
            ca_out_ref[i] = ca_ref[i]
            ct_out_ref[i] = ct_ref[i]
            return 0

        lax.fori_loop(0, ICAO_CACHE_LEN, cp, 0)


def _resolve_words_pallas(pf, w1, w2, cache_addr, cache_ts, now,
                          skip0=jnp.int32(0), interpret: bool = False):
    n = pf.shape[0]
    pad = -(-n // RESOLVE_CHUNK) * RESOLVE_CHUNK
    if pad != n:  # pad with invalid candidates (valid bit clear -> no-ops)
        z = jnp.zeros(pad - n, jnp.int32)
        pf = jnp.concatenate([pf, z])
        w1 = jnp.concatenate([w1, z])
        w2 = jnp.concatenate([w2, z])
    words, ca, ct, skip_end = pl.pallas_call(
        _resolve_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(pad // RESOLVE_CHUNK,),
            in_specs=[],
            out_specs=[
                pl.BlockSpec(
                    (RESOLVE_CHUNK,), lambda c, *_: (c,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (ICAO_CACHE_LEN,), lambda c, *_: (0,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (ICAO_CACHE_LEN,), lambda c, *_: (0,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1,), lambda c, *_: (0,), memory_space=pltpu.SMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((pad,), jnp.int32),
            jax.ShapeDtypeStruct((ICAO_CACHE_LEN,), jnp.int32),
            jax.ShapeDtypeStruct((ICAO_CACHE_LEN,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        interpret=interpret,
    )(pf, w1, w2, jnp.asarray(now, jnp.int32).reshape(1),
      jnp.asarray(skip0, jnp.int32).reshape(1), cache_addr, cache_ts)
    return words[:n], ca, ct, skip_end[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "scan_len", "max_candidates", "max_out", "crcok_only", "pallas",
        "packed",
    ),
)
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
    max_out: int,
    crcok_only: bool = True,
    pallas: bool | None = None,
    packed: bool = True,
):
    """G chained demod_resolve_batch steps in ONE program: xg is
    (G, NB, nbytes) uint8, the ICAO cache threads through the lax.scan
    carry, and every batch's outputs come back stacked — one dispatch and
    one fetch per G batches.  This is the sustained-throughput protocol
    (bench.py measures it); DemodPipeline._device_batches uses it for
    seekable file decode."""

    def body(carry, xb):
        ca, ct = carry
        outs = demod_resolve_batch(
            xb, ca, ct, now, fix_errors, aggressive,
            scan_len=scan_len, max_candidates=max_candidates,
            max_out=max_out, crcok_only=crcok_only, pallas=pallas,
            packed=packed,
        )
        ca, ct = outs[-2], outs[-1]
        return (ca, ct), outs[:-2]

    (ca, ct), stacked = lax.scan(body, (cache_addr, cache_ts), xg)
    return stacked + (ca, ct)


def use_device_resolve() -> bool:
    """Backend policy for the on-device resolver (shared by api.py and the
    CLI's --tpu-device-resolve auto mode): the Pallas kernel targets TPU
    ONLY — on any other backend (cpu, gpu, ...) the pltpu grid spec cannot
    lower, so auto mode falls back to the host resolver there (the XLA scan
    backend is exact but slow; it serves tests, not products)."""
    return jax.default_backend() == "tpu"


_use_pallas_resolve = use_device_resolve  # internal alias


# NOTE: cache_addr/cache_ts are NOT donated although they look like an
# in-place carry: overflow checks (count vs max_out, n vs max_candidates)
# happen on the host AFTER the call, and the retry re-runs from the PRIOR
# state — which must therefore stay alive.  The state is 8 KB; copying it
# per batch is noise.
@functools.partial(
    jax.jit,
    static_argnames=(
        "scan_len", "max_candidates", "max_out", "crcok_only", "pallas",
        "packed",
    ),
)
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
    max_out: int,
    crcok_only: bool = True,
    pallas: bool | None = None,
    packed: bool = False,
):
    """Fused device pipeline: (NB, nbytes) uint8 IQ -> emitted messages.

    Returns (n, count, msg_out, meta_out, stats, cache_addr', cache_ts'):
      n        int32[NB]         exact preamble count per buffer (overflow check)
      count    int32[]           exact emitted-message count (overflow check)
      msg_out  uint8[max_out,14] emitted frames (post-fix), scan order
      meta_out int32[max_out]    pos<<4 | pass<<3 | long<<2 | phase<<1 | crcok
      stats    int32[8]          reference counter deltas (DecoderStats order)

    With packed=True, msg_out and meta_out merge into ONE uint8[max_out,15]
    array (columns 0..13 = frame bytes, column 14 = the low meta bits) —
    half the fetch arrays and ~20% fewer bytes on runtimes where the
    device->host link is the bottleneck; pos is dropped.
    """
    from ..parallel.sharding import demod_batch

    if pallas is None:
        pallas = _use_pallas_resolve()

    cand = demod_batch(
        iq_buffers, scan_len=scan_len, max_candidates=max_candidates,
        pallas=pallas,
    )
    nb, mc = cand.pos.shape
    n_flat = nb * mc

    def flat(a):
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

    slot = jnp.arange(n_flat, dtype=jnp.int32)
    valid = (slot % mc) < jnp.repeat(jnp.minimum(cand.n, mc), mc)
    pos = flat(cand.pos)
    pf = (
        jnp.minimum(pos, PF_POS_MASK)
        | valid.astype(jnp.int32) * PF_VALID
        | ((slot % mc) == 0).astype(jnp.int32) * PF_NEWBUF
        | flat(cand.gate1).astype(jnp.int32) * PF_GATE1
    )

    backend = _resolve_words_pallas if pallas else _resolve_words_xla
    ca = cache_addr.astype(jnp.int32)
    ct = cache_ts.astype(jnp.int32)
    if n_flat <= MAX_SCAN_SEGMENT:
        words, ca, ct, _ = backend(pf, w1, w2, ca, ct, now)
    else:
        # very large batches: segment the sequential pass so the Pallas
        # kernel's SMEM scalar-prefetch footprint stays bounded regardless
        # of batch size OR candidate density.  Both the ICAO cache and the
        # skip-until state chain across segments, so the cut may fall
        # anywhere — including mid-buffer when sticky growth has pushed
        # max_candidates past the segment size.
        skip = jnp.int32(0)
        parts = []
        for s in range(0, n_flat, MAX_SCAN_SEGMENT):
            e = min(s + MAX_SCAN_SEGMENT, n_flat)
            w, ca, ct, skip = backend(
                pf[s:e], w1[s:e], w2[s:e], ca, ct, now, skip
            )
            parts.append(w)
        words = jnp.concatenate(parts)

    bit = lambda w, b: (w & b) != 0  # noqa: E731
    att1, crcok1 = bit(words, R_ATT1), bit(words, R_CRCOK1)
    run2, att2 = bit(words, R_RUN2), bit(words, R_ATT2)
    crcok2, good2 = bit(words, R_CRCOK2), bit(words, R_GOOD2)

    # ---- stats, derived vectorized from the decision words ----------------
    # (dump1090.c:1737-1753 detect path incl. the single-bit double count,
    # dump1090.c:1122-1126 decode path; see models/resolver.py)
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
    emask = jnp.stack([emit1, emit2], axis=1).reshape(2 * n_flat)
    count = emask.sum().astype(jnp.int32)

    g = jnp.arange(2 * n_flat, dtype=jnp.int32)
    score = jnp.where(emask, -g, jnp.int32(-(2**30)))
    k = min(max_out, 2 * n_flat)
    vals, _ = lax.top_k(score, k)
    if k < max_out:  # tiny batches: pad to the requested static shape
        vals = jnp.concatenate([vals, jnp.full(max_out - k, -(2**30), jnp.int32)])
    gsel = jnp.minimum(-vals, jnp.int32(2 * n_flat - 1))
    sel_valid = -vals < 2**30 - 1
    p_sel = (gsel & 1) == 1

    msgs12 = jnp.stack([msg1f, msg2f], axis=1).reshape(2 * n_flat, 14)
    msg_out = jnp.take(msgs12, gsel, axis=0)

    crcok_slot = jnp.stack([crcok1, crcok2], axis=1).reshape(2 * n_flat)
    phase_slot = jnp.stack(
        [jnp.zeros_like(good2), good2], axis=1
    ).reshape(2 * n_flat)
    long_slot = jnp.stack([aux1["long"], aux2["long"]], axis=1).reshape(2 * n_flat)
    errbit_slot = jnp.stack(
        [aux1["errorbit"], aux2["errorbit"]], axis=1
    ).reshape(2 * n_flat)
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
    if packed:
        merged = jnp.concatenate(
            [msg_out, (meta_out & 0xF).astype(jnp.uint8)[:, None]], axis=1
        )
        return cand.n, count, merged, stats, ca, ct
    return cand.n, count, msg_out, meta_out, stats, ca, ct
