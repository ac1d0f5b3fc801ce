"""Round-3 experiments, part c: proper demod timing + blocked-SMEM kernel."""
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
import jax
import jax.numpy as jnp
from jax import lax

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    cache = os.path.expanduser("~/.cache/dump1090_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dump1090_tpu.constants import BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES, ICAO_CACHE_LEN
from dump1090_tpu.ops.demod import (
    Candidates, preamble_mask, compact_positions, gather_candidate_windows,
    candidate_passes_window,
)
from dump1090_tpu.ops.magnitude import magnitude_from_iq
from dump1090_tpu.parallel.sharding import demod_batch, overlapping_buffers

NB, MC = 128, 256
FIXTURE = Path("/root/reference/testfiles/modes1.bin")
def log(m): print(m, file=sys.stderr, flush=True)

raw = np.fromfile(FIXTURE, dtype=np.uint8)
reps = int(np.ceil((NB + 2) * BLOCK_SAMPLES * 2 / len(raw)))
stream = np.concatenate([np.full(476, 127, np.uint8)] + [raw] * reps)
bufs = np.asarray(overlapping_buffers(stream))
x = jax.device_put(jnp.asarray(bufs[:NB]))
x.block_until_ready()
scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES

def perturb(x, i):
    w = lax.bitcast_convert_type(x.reshape(x.shape[0], -1, 4), jnp.int32)
    return lax.bitcast_convert_type(w + i, jnp.uint8).reshape(x.shape)

def demod_variant(iq, barrier_m=False, barrier_mask=False):
    m = jax.vmap(lambda r: magnitude_from_iq(r, out_dtype=jnp.uint16))(iq)
    if barrier_m:
        m = lax.optimization_barrier(m)
    mask = jax.vmap(lambda r: preamble_mask(r, scan_len))(m)
    if barrier_mask:
        mask = lax.optimization_barrier(mask)
    n = mask.sum(axis=1).astype(jnp.int32)
    pos = jax.vmap(lambda r: compact_positions(r, MC, scan_len))(mask)
    w = gather_candidate_windows(m, pos, pallas=True)
    outs = jax.vmap(jax.vmap(candidate_passes_window))(w, pos)
    return Candidates(n, pos, *outs)

def time_demod(name, **kw):
    @functools.partial(jax.jit, static_argnames=("L",))
    def loop(x, L):
        def body(i, acc):
            cand = demod_variant(perturb(x, i), **kw)
            return acc + sum(f.astype(jnp.int32).sum().astype(jnp.float32) for f in cand)
        return lax.fori_loop(0, L, body, jnp.float32(0))
    L = 64
    _ = float(jax.device_get(loop(x, L)))
    best = 1e9
    for _t in range(2):
        t0 = time.perf_counter()
        _ = float(jax.device_get(loop(x, L)))
        best = min(best, (time.perf_counter() - t0) / L)
    log(f"demod {name}: {best*1e3:.2f} ms/batch")

time_demod("baseline")
time_demod("barrier_m", barrier_m=True)
time_demod("barrier_m+mask", barrier_m=True, barrier_mask=True)

# ---- blocked-SMEM kernel prototypes ----------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dump1090_tpu.ops.resolve import (
    _pass_precompute, icao_hash, PF_POS_MASK, PF_VALID,
    PF_NEWBUF, PF_GATE1, ICAO_CACHE_TTL, RESOLVE_CHUNK, W_ADDR_MASK,
    SKIP_SHORT, SKIP_EXTRA_LONG,
)

cand = demod_batch(x, scan_len=scan_len, max_candidates=MC)
nb, mc = cand.pos.shape
n_flat = nb * mc
flat = lambda a: a.reshape((n_flat,) + a.shape[2:])

# new-layout precompute: crcok_seen/crcok_noseen/addable/long + attempt
NL_ATT = 1 << 24
NL_CS = 1 << 25
NL_CN = 1 << 26
NL_ADD = 1 << 27
NL_LONG = 1 << 28

@jax.jit
def make_words(cand):
    fe = jnp.asarray(True); ag = jnp.asarray(False)
    w1, _, a1 = _pass_precompute(flat(cand.msg1), flat(cand.errors1), flat(cand.gate1), ag, fe)
    w2, _, a2 = _pass_precompute(flat(cand.msg2), flat(cand.errors2), flat(cand.gate2), ag, fe)
    slot = jnp.arange(n_flat, dtype=jnp.int32)
    valid = (slot % mc) < jnp.repeat(jnp.minimum(cand.n, mc), mc)
    pos = flat(cand.pos)
    pf = (jnp.minimum(pos, PF_POS_MASK) | valid.astype(jnp.int32) * PF_VALID
          | ((slot % mc) == 0).astype(jnp.int32) * PF_NEWBUF
          | flat(cand.gate1).astype(jnp.int32) * PF_GATE1)

    def relayout(w):
        from dump1090_tpu.ops.resolve import (
            W_ATTEMPT, W_STD, W_AP, W_IID, W_CRCOK_FIX, W_CLEAN, W_LONG,
        )
        addr = w & W_ADDR_MASK
        att = (w & W_ATTEMPT) != 0
        std = (w & W_STD) != 0
        ap = (w & W_AP) != 0
        iid = (w & W_IID) != 0
        fix = (w & W_CRCOK_FIX) != 0
        clean = (w & W_CLEAN) != 0
        lng = (w & W_LONG) != 0
        cs = jnp.where(std, fix | iid, ap)
        cn = jnp.where(std, fix, False)
        addable = std & fix & clean
        b = lambda f, v: f.astype(jnp.int32) * v
        return (addr | b(att, NL_ATT) | b(cs, NL_CS) | b(cn, NL_CN)
                | b(addable, NL_ADD) | b(lng, NL_LONG))

    return pf, relayout(w1), relayout(w2), valid.sum().astype(jnp.int32)

pf_h, w1_h, w2_h, total = jax.device_get(make_words(cand))
log(f"total valid: {total}")

def new_step(pf, w1, w2, skip, ca_ref, ct_ref, now):
    pos = pf & PF_POS_MASK
    skip = jnp.where((pf & PF_NEWBUF) != 0, 0, skip)
    run = ((pf & PF_VALID) != 0) & (pos >= skip)

    def one_pass(w, run_p):
        addr = w & W_ADDR_MASK
        h = icao_hash(addr)
        a = ca_ref[h]; t = ct_ref[h]
        seen = (a == addr) & (a != 0) & (now - t <= ICAO_CACHE_TTL)
        att = run_p & ((w & NL_ATT) != 0)
        crcok = jnp.where(seen, (w & NL_CS) != 0, (w & NL_CN) != 0)
        good = att & crcok
        do_add = att & ((w & NL_ADD) != 0)
        return att, crcok, good, do_add, addr, h, (w & NL_LONG) != 0

    att1, crcok1, good1, add1, addr1, h1, long1 = one_pass(w1, run)
    skip = jnp.where(good1, pos + SKIP_SHORT + jnp.where(long1, SKIP_EXTRA_LONG, 0), skip)
    run2 = run & ((pf & PF_GATE1) != 0) & ~good1
    att2, crcok2, good2, add2, addr2, h2, long2 = one_pass(w2, run2)
    skip = jnp.where(good2, pos + SKIP_SHORT + jnp.where(long2, SKIP_EXTRA_LONG, 0), skip)

    cond = add1 | add2
    addr = jnp.where(add1, addr1, addr2)
    h = jnp.where(add1, h1, h2)

    @pl.when(cond)
    def _():
        ca_ref[h] = addr
        ct_ref[h] = now

    rb = lambda f, v: f.astype(jnp.int32) * v
    word = (rb(run, 1) | rb(att1, 2) | rb(crcok1, 4) | rb(good1, 8)
            | rb(run2, 16) | rb(att2, 32) | rb(crcok2, 64) | rb(good2, 128))
    return word, skip

def make_blocked(mode):
    def kernel(count_ref, now_ref, skip_in_ref,
               pf_ref, w1_ref, w2_ref, ca_in_ref, ct_in_ref,
               words_ref, ca_out_ref, ct_out_ref, skip_out_ref,
               ca_ref, ct_ref, skip_ref):
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
            if mode == "empty":
                words_ref[k] = pf_ref[k]
                return skip + 1
            word, skip = new_step(pf_ref[k], w1_ref[k], w2_ref[k], skip,
                                  ca_ref, ct_ref, now)
            words_ref[k] = word
            return skip

        todo = jnp.clip(count_ref[0] - base, 0, RESOLVE_CHUNK)
        skip_ref[0] = lax.fori_loop(0, todo, body, skip_ref[0])

        @pl.when(c == nc - 1)
        def _():
            skip_out_ref[0] = skip_ref[0]
            def cp(i, _):
                ca_out_ref[i] = ca_ref[i]
                ct_out_ref[i] = ct_ref[i]
                return 0
            lax.fori_loop(0, ICAO_CACHE_LEN, cp, 0)
    return kernel

def run_blocked(mode, N, count, L=32):
    kern = make_blocked(mode)
    def call(pf, w1, w2, ca, ct):
        blk = lambda c, *_: (c,)
        rep = lambda c, *_: (0,)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(N // RESOLVE_CHUNK,),
                in_specs=[
                    pl.BlockSpec((RESOLVE_CHUNK,), blk, memory_space=pltpu.SMEM),
                    pl.BlockSpec((RESOLVE_CHUNK,), blk, memory_space=pltpu.SMEM),
                    pl.BlockSpec((RESOLVE_CHUNK,), blk, memory_space=pltpu.SMEM),
                    pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
                    pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((RESOLVE_CHUNK,), blk, memory_space=pltpu.SMEM),
                    pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
                    pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
                    pl.BlockSpec((1,), rep, memory_space=pltpu.SMEM),
                ],
                scratch_shapes=[
                    pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                    pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                    pltpu.SMEM((1,), jnp.int32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((N,), jnp.int32),
                jax.ShapeDtypeStruct((ICAO_CACHE_LEN,), jnp.int32),
                jax.ShapeDtypeStruct((ICAO_CACHE_LEN,), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ],
        )(jnp.asarray(count, jnp.int32).reshape(1),
          jnp.full(1, 1_700_000_000, jnp.int32), jnp.zeros(1, jnp.int32),
          pf, w1, w2, ca, ct)

    reps_n = -(-N // n_flat)
    pfN = jax.device_put(jnp.asarray(np.tile(pf_h, reps_n)[:N]))
    w1N = jax.device_put(jnp.asarray(np.tile(w1_h, reps_n)[:N]))
    w2N = jax.device_put(jnp.asarray(np.tile(w2_h, reps_n)[:N]))
    ca = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))
    ct = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))

    @functools.partial(jax.jit, static_argnames=("L",))
    def loop(pfN, w1N, w2N, ca, ct, L):
        def body(i, carry):
            ca, ct, acc = carry
            words, ca, ct, _ = call(pfN, w1N, w2N, ca, ct)
            return ca, ct, acc + words.sum()
        return lax.fori_loop(0, L, body, (ca, ct, jnp.int32(0)))

    _ = jax.device_get(loop(pfN, w1N, w2N, ca, ct, L)[2])
    best = 1e9
    for _t in range(2):
        t0 = time.perf_counter()
        _ = jax.device_get(loop(pfN, w1N, w2N, ca, ct, L)[2])
        best = min(best, (time.perf_counter() - t0) / L)
    log(f"blocked {mode:6s} N={N} count={count}: {best*1e3:.3f} ms"
        f" ({best/max(count,1)*1e9:.0f} ns/real-step)")

run_blocked("empty", 2048, 2048)
run_blocked("empty", 32768, 32768)
run_blocked("full", 32768, int(total))
run_blocked("full", 32768 * 12, int(total) * 12, L=8)

# ---- compaction op costs ---------------------------------------------------
MA = 28672
@jax.jit
def compact_cost(cand):
    n = cand.n
    pos = flat(cand.pos)
    slot = jnp.arange(n_flat, dtype=jnp.int32)
    valid = (slot % mc) < jnp.repeat(jnp.minimum(n, mc), mc)
    cum = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
    tgt = jnp.where(valid & (cum < MA), cum, MA)
    sel = jnp.zeros(MA, jnp.int32).at[tgt].set(slot, mode="drop")
    total = valid.sum().astype(jnp.int32)
    pos_c = jnp.take(pos, sel)
    m1 = jnp.take(flat(cand.msg1), sel, axis=0)
    m2 = jnp.take(flat(cand.msg2), sel, axis=0)
    e1 = jnp.take(flat(cand.errors1), sel)
    e2 = jnp.take(flat(cand.errors2), sel)
    g1 = jnp.take(flat(cand.gate1), sel)
    g2 = jnp.take(flat(cand.gate2), sel)
    return (total, pos_c.sum(), m1.astype(jnp.int32).sum(), m2.astype(jnp.int32).sum(),
            e1.sum(), e2.sum(), g1.sum(), g2.sum())

@functools.partial(jax.jit, static_argnames=("L",))
def compact_loop(x, L):
    def body(i, acc):
        cand2 = demod_batch(perturb(x, i), scan_len=scan_len, max_candidates=MC)
        outs = compact_cost(cand2)
        return acc + sum(o.astype(jnp.float32) for o in outs)
    return lax.fori_loop(0, L, body, jnp.float32(0))

L = 64
_ = float(jax.device_get(compact_loop(x, L)))
best = 1e9
for _t in range(2):
    t0 = time.perf_counter()
    _ = float(jax.device_get(compact_loop(x, L)))
    best = min(best, (time.perf_counter() - t0) / L)
log(f"demod+compact(MA={MA}): {best*1e3:.2f} ms/batch (compare vs demod baseline)")
