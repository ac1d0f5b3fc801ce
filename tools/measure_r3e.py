"""Ablation 2: precompute internals + kernel hash-prefetch variant."""
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    cache = os.path.expanduser("~/.cache/dump1090_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dump1090_tpu.constants import (
    BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES, ICAO_CACHE_LEN,
    ICAO_CACHE_TTL,
)
import dump1090_tpu.ops.resolve as R
from dump1090_tpu.parallel.sharding import demod_batch, overlapping_buffers

NB, MC, G = 128, 256, 12
FIXTURE = Path("/root/reference/testfiles/modes1.bin")
def log(m): print(m, file=sys.stderr, flush=True)

raw = np.fromfile(FIXTURE, dtype=np.uint8)
reps = int(np.ceil((G * NB + 2) * BLOCK_SAMPLES * 2 / len(raw)))
stream = np.concatenate([np.full(476, 127, np.uint8)] + [raw] * reps)
bufs = np.asarray(overlapping_buffers(stream))
xg = jax.device_put(jnp.asarray(
    np.stack([bufs[k * NB:(k + 1) * NB] for k in range(G)])))
xg.block_until_ready()
scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
per_batch = NB * MC

def perturb(x, i):
    w = lax.bitcast_convert_type(x.reshape(x.shape[0], x.shape[1], -1, 4), jnp.int32)
    return lax.bitcast_convert_type(w + i, jnp.uint8).reshape(x.shape)

def group_ablate(xg, stage):
    fe, ag = jnp.asarray(True), jnp.asarray(False)

    def demod_pre(_, xb):
        cand = demod_batch(xb, scan_len=scan_len, max_candidates=MC)
        fb = lambda a: a.reshape((per_batch,) + a.shape[2:])
        acc = jnp.int32(0)
        for msgs, errors, gate in ((cand.msg1, cand.errors1, cand.gate1),
                                   (cand.msg2, cand.errors2, cand.gate2)):
            m, e, g = fb(msgs), fb(errors), fb(gate)
            x = m.astype(jnp.int32)
            msgtype = x[:, 0] >> 3
            is_long = (msgtype >= 16) & (msgtype <= 21)
            msgbits = jnp.where(is_long, 112, 56)
            syn_long, syn_short = R.device_syndromes(m)
            syn = jnp.where(is_long, syn_long, syn_short)
            acc = acc + syn.sum() + e.sum() + g.sum()
            if stage in ("fix", "full"):
                is_std = (msgtype == 11) | (msgtype == 17) | (msgtype == 18)
                want_fix = fe & (syn != 0) & is_std
                mf, ebit, nfix = R.fix_candidates(
                    m, syn, msgbits, want_fix, jnp.where(ag, 2, 1))
                acc = acc + mf.astype(jnp.int32).sum() + ebit.sum() + nfix.sum()
        return _, acc

    _, accs = lax.scan(demod_pre, 0, xg)
    return accs.sum().astype(jnp.float32)

def timeit_ablate(name, stage, L=6):
    @functools.partial(jax.jit, static_argnames=("L",))
    def loop(xg, L):
        def body(i, acc):
            return acc + group_ablate(perturb(xg, i), stage)
        return lax.fori_loop(0, L, body, jnp.float32(0))
    t0 = time.perf_counter()
    _ = jax.device_get(loop(xg, L))
    log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
    best = 1e9
    for _t in range(2):
        t0 = time.perf_counter()
        _ = jax.device_get(loop(xg, L))
        best = min(best, (time.perf_counter() - t0) / L / G)
    log(f"{name}: {best*1e3:.2f} ms/batch")

timeit_ablate("P1 demod+syndromes", "syn")
timeit_ablate("P2 demod+syndromes+fix", "fix")

# ---- kernel with prefetched hashes (4th stream word) ------------------------
def make_hash_kernel():
    def kernel(nbuf_ref, now_ref,
               pf_ref, w1_ref, w2_ref, h12_ref, ca_in_ref, ct_in_ref,
               words_ref, ca_out_ref, ct_out_ref,
               ca_ref, ct_ref, skip_ref):
        c = pl.program_id(0)
        nc = pl.num_programs(0)
        now = now_ref[0]

        @pl.when(c == 0)
        def _():
            skip_ref[0] = 0
            def cp(i, _):
                ca_ref[i] = ca_in_ref[i]
                ct_ref[i] = ct_in_ref[i]
                return 0
            lax.fori_loop(0, ICAO_CACHE_LEN, cp, 0)

        def step(i, skip):
            pf = pf_ref[i]
            h12 = h12_ref[i]
            pos = pf & R.PF_POS_MASK
            skip = jnp.where((pf & R.PF_NEWBUF) != 0, 0, skip)
            run = ((pf & R.PF_VALID) != 0) & (pos >= skip)

            def one_pass(w, h, run_p):
                addr = w & R.W_ADDR_MASK
                a = ca_ref[h]; t = ct_ref[h]
                seen = (a == addr) & (a != 0) & (now - t <= ICAO_CACHE_TTL)
                att = run_p & ((w & R.W_ATTEMPT) != 0)
                crcok = jnp.where(seen, (w & R.W_CRCOK_SEEN) != 0,
                                  (w & R.W_CRCOK_NOSEEN) != 0)
                good = att & crcok
                do_add = att & ((w & R.W_ADDABLE) != 0)
                return att, crcok, good, do_add, addr, (w & R.W_LONG) != 0

            h1 = h12 & 0x3FF
            h2 = (h12 >> 10) & 0x3FF
            w1 = w1_ref[i]; w2 = w2_ref[i]
            att1, crcok1, good1, add1, addr1, long1 = one_pass(w1, h1, run)
            skip = jnp.where(good1, pos + R.SKIP_SHORT
                             + jnp.where(long1, R.SKIP_EXTRA_LONG, 0), skip)
            run2 = run & ((pf & R.PF_GATE1) != 0) & ~good1
            att2, crcok2, good2, add2, addr2, long2 = one_pass(w2, h2, run2)
            skip = jnp.where(good2, pos + R.SKIP_SHORT
                             + jnp.where(long2, R.SKIP_EXTRA_LONG, 0), skip)
            cond = add1 | add2
            addr = jnp.where(add1, addr1, addr2)
            h = jnp.where(add1, h1, h2)

            @pl.when(cond)
            def _():
                ca_ref[h] = addr
                ct_ref[h] = now

            rb = lambda f, v: f.astype(jnp.int32) * v
            words_ref[i] = (rb(run, 1) | rb(att1, 2) | rb(crcok1, 4)
                            | rb(good1, 8) | rb(run2, 16) | rb(att2, 32)
                            | rb(crcok2, 64) | rb(good2, 128))
            return skip

        bufs_per_chunk = 2048 // MC
        def buf_body(bi, skip):
            cnt = nbuf_ref[c * bufs_per_chunk + bi]
            base = bi * MC
            return lax.fori_loop(0, cnt, lambda k, s: step(base + k, s), skip)
        skip_ref[0] = lax.fori_loop(0, bufs_per_chunk, buf_body, skip_ref[0])

        @pl.when(c == nc - 1)
        def _():
            def cp(i, _):
                ca_out_ref[i] = ca_ref[i]
                ct_out_ref[i] = ct_ref[i]
                return 0
            lax.fori_loop(0, ICAO_CACHE_LEN, cp, 0)
    return kernel

def hash_call(pf, w1, w2, h12, nbuf, ca, ct, now):
    n = pf.shape[0]
    blk = lambda c, *_: (c,)
    rep = lambda c, *_: (0,)
    sp = lambda shape=( 2048,): pl.BlockSpec(shape, blk, memory_space=pltpu.SMEM)
    return pl.pallas_call(
        make_hash_kernel(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n // 2048,),
            in_specs=[sp(), sp(), sp(), sp(),
                      pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
                      pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM)],
            out_specs=[sp(),
                       pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM),
                       pl.BlockSpec((ICAO_CACHE_LEN,), rep, memory_space=pltpu.SMEM)],
            scratch_shapes=[pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                            pltpu.SMEM((ICAO_CACHE_LEN,), jnp.int32),
                            pltpu.SMEM((1,), jnp.int32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.int32),
                   jax.ShapeDtypeStruct((ICAO_CACHE_LEN,), jnp.int32),
                   jax.ShapeDtypeStruct((ICAO_CACHE_LEN,), jnp.int32)],
    )(nbuf, jnp.asarray(now, jnp.int32).reshape(1), pf, w1, w2, h12, ca, ct)

def group_scan_variant(xg, ca, ct, with_hash):
    g_n = xg.shape[0]
    fe, ag = jnp.asarray(True), jnp.asarray(False)
    now = jnp.int32(1_700_000_000)

    def demod_pre(_, xb):
        cand = demod_batch(xb, scan_len=scan_len, max_candidates=MC)
        fb = lambda a: a.reshape((per_batch,) + a.shape[2:])
        w1, m1, a1 = R._pass_precompute(fb(cand.msg1), fb(cand.errors1), fb(cand.gate1), ag, fe)
        w2, m2, a2 = R._pass_precompute(fb(cand.msg2), fb(cand.errors2), fb(cand.gate2), ag, fe)
        nbuf_b = jnp.minimum(cand.n, MC).astype(jnp.int32)
        slot = jnp.arange(per_batch, dtype=jnp.int32)
        valid_b = (slot % MC) < jnp.repeat(nbuf_b, MC)
        pos_b = fb(cand.pos)
        pf_b = (jnp.minimum(pos_b, R.PF_POS_MASK)
                | valid_b.astype(jnp.int32) * R.PF_VALID
                | ((slot % MC) == 0).astype(jnp.int32) * R.PF_NEWBUF
                | fb(cand.gate1).astype(jnp.int32) * R.PF_GATE1)
        h12_b = (R.icao_hash(w1 & R.W_ADDR_MASK)
                 | (R.icao_hash(w2 & R.W_ADDR_MASK) << 10))
        return _, (nbuf_b, pf_b, w1, w2, h12_b)

    _, (nbuf_st, pf_st, w1_st, w2_st, h12_st) = lax.scan(demod_pre, 0, xg)
    n_flat = g_n * per_batch
    flat = lambda a: a.reshape((n_flat,) + a.shape[2:])
    pf, w1, w2, h12 = flat(pf_st), flat(w1_st), flat(w2_st), flat(h12_st)
    nbuf = nbuf_st.reshape(g_n * NB)
    if with_hash:
        words, ca, ct = hash_call(pf, w1, w2, h12, nbuf, ca, ct, now)
    else:
        words, ca, ct = R._resolve_words_pallas(pf, w1, w2, nbuf, ca, ct, now, mc=MC)
    return words.sum().astype(jnp.float32), ca, ct

def timeit_scan(name, with_hash, L=6):
    @functools.partial(jax.jit, static_argnames=("L",))
    def loop(xg, ca, ct, L):
        def body(i, carry):
            ca, ct, acc = carry
            a, ca, ct = group_scan_variant(perturb(xg, i), ca, ct, with_hash)
            return ca, ct, acc + a
        return lax.fori_loop(0, L, body, (ca, ct, jnp.float32(0)))
    ca = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))
    ct = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))
    t0 = time.perf_counter()
    _ = jax.device_get(loop(xg, ca, ct, L)[2])
    log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
    best = 1e9
    for _t in range(2):
        t0 = time.perf_counter()
        _ = jax.device_get(loop(xg, ca, ct, L)[2])
        best = min(best, (time.perf_counter() - t0) / L / G)
    log(f"{name}: {best*1e3:.2f} ms/batch")

timeit_scan("S1 scan baseline(+h12 precompute)", False)
timeit_scan("S2 scan hash-prefetch", True)
