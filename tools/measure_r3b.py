"""Round-3 experiments: demod front-half refusion + pallas scan overhead."""
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
    return lax.bitcast_convert_type(w + (i & 0), jnp.uint8).reshape(x.shape)

def demod_variant(iq, barrier_m=False, barrier_mask=False, barrier_w=False):
    m = jax.vmap(lambda r: magnitude_from_iq(r, out_dtype=jnp.uint16))(iq)
    if barrier_m:
        m = lax.optimization_barrier(m)
    mask = jax.vmap(lambda r: preamble_mask(r, scan_len))(m)
    if barrier_mask:
        mask = lax.optimization_barrier(mask)
    n = mask.sum(axis=1).astype(jnp.int32)
    pos = jax.vmap(lambda r: compact_positions(r, MC, scan_len))(mask)
    w = gather_candidate_windows(m, pos, pallas=True)
    if barrier_w:
        w = lax.optimization_barrier(w)
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
time_demod("barrier_all", barrier_m=True, barrier_mask=True, barrier_w=True)

# ---- pallas kernel overhead attribution ------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dump1090_tpu.ops.resolve import (
    _pass_precompute, _step_semantics, icao_hash, PF_POS_MASK, PF_VALID,
    PF_NEWBUF, PF_GATE1, ICAO_CACHE_TTL, RESOLVE_CHUNK,
)

cand = demod_batch(x, scan_len=scan_len, max_candidates=MC)
nb, mc = cand.pos.shape
n_flat = nb * mc
flat = lambda a: a.reshape((n_flat,) + a.shape[2:])

@jax.jit
def make_words(cand):
    fe = jnp.asarray(True); ag = jnp.asarray(False)
    w1, _, _ = _pass_precompute(flat(cand.msg1), flat(cand.errors1), flat(cand.gate1), ag, fe)
    w2, _, _ = _pass_precompute(flat(cand.msg2), flat(cand.errors2), flat(cand.gate2), ag, fe)
    slot = jnp.arange(n_flat, dtype=jnp.int32)
    valid = (slot % mc) < jnp.repeat(jnp.minimum(cand.n, mc), mc)
    pos = flat(cand.pos)
    pf = (jnp.minimum(pos, PF_POS_MASK) | valid.astype(jnp.int32) * PF_VALID
          | ((slot % mc) == 0).astype(jnp.int32) * PF_NEWBUF
          | flat(cand.gate1).astype(jnp.int32) * PF_GATE1)
    return pf, w1, w2, valid.sum().astype(jnp.int32)

pf_h, w1_h, w2_h, total = jax.device_get(make_words(cand))
log(f"total valid: {total} of {n_flat}")

def make_kernel(mode):
    """mode: 'full' (current), 'nocopy' (no cache copy loops),
    'empty' (loop with trivial body), 'count' (dynamic bound, full body)."""
    def kernel(count_ref, pf_ref, w1_ref, w2_ref, now_ref, skip_in_ref,
               ca_in_ref, ct_in_ref,
               words_ref, ca_out_ref, ct_out_ref, skip_out_ref,
               ca_ref, ct_ref, skip_ref):
        c = pl.program_id(0)
        nc = pl.num_programs(0)
        now = now_ref[0]

        @pl.when(c == 0)
        def _():
            skip_ref[0] = skip_in_ref[0]
            if mode != "nocopy":
                def cp(i, _):
                    ca_ref[i] = ca_in_ref[i]
                    ct_ref[i] = ct_in_ref[i]
                    return 0
                lax.fori_loop(0, ICAO_CACHE_LEN, cp, 0)

        base = c * RESOLVE_CHUNK

        def body(k, skip):
            i = base + k
            if mode == "empty":
                words_ref[k] = pf_ref[i]
                return skip + 1
            state = {}
            def lookup(addr):
                h = icao_hash(addr)
                a = ca_ref[h]; t = ct_ref[h]
                return (a == addr) & (a != 0) & (now - t <= ICAO_CACHE_TTL)
            def add(cond, addr):
                prev = state.get("add")
                if prev is None:
                    state["add"] = (cond, addr)
                else:
                    pc, pa = prev
                    state["add"] = (pc | cond, jnp.where(pc, pa, addr))
            word, skip = _step_semantics(pf_ref[i], w1_ref[i], w2_ref[i], skip, lookup, add)
            cond, addr = state["add"]
            @pl.when(cond)
            def _():
                h = icao_hash(addr)
                ca_ref[h] = addr
                ct_ref[h] = now
            words_ref[k] = word
            return skip

        if mode == "count":
            todo = jnp.clip(count_ref[0] - base, 0, RESOLVE_CHUNK)
        else:
            todo = RESOLVE_CHUNK
        skip_ref[0] = lax.fori_loop(0, todo, body, skip_ref[0])

        @pl.when(c == nc - 1)
        def _():
            skip_out_ref[0] = skip_ref[0]
            if mode != "nocopy":
                def cp(i, _):
                    ca_out_ref[i] = ca_ref[i]
                    ct_out_ref[i] = ct_ref[i]
                    return 0
                lax.fori_loop(0, ICAO_CACHE_LEN, cp, 0)
    return kernel

def run_variant(mode, N, count):
    kern = make_kernel(mode)
    def call(pf, w1, w2, ca, ct):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=8,
                grid=(N // RESOLVE_CHUNK,),
                in_specs=[],
                out_specs=[
                    pl.BlockSpec((RESOLVE_CHUNK,), lambda c, *_: (c,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((ICAO_CACHE_LEN,), lambda c, *_: (0,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((ICAO_CACHE_LEN,), lambda c, *_: (0,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((1,), lambda c, *_: (0,), memory_space=pltpu.SMEM),
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
        )(jnp.asarray(count, jnp.int32).reshape(1), pf, w1, w2,
          jnp.full(1, 1_700_000_000, jnp.int32), jnp.zeros(1, jnp.int32), ca, ct)

    pfN = jax.device_put(jnp.asarray(pf_h[:N]))
    w1N = jax.device_put(jnp.asarray(w1_h[:N]))
    w2N = jax.device_put(jnp.asarray(w2_h[:N]))
    ca = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))
    ct = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))

    @functools.partial(jax.jit, static_argnames=("L",))
    def loop(pfN, w1N, w2N, ca, ct, L):
        def body(i, carry):
            ca, ct, acc = carry
            words, ca, ct, _ = call(pfN, w1N, w2N, ca, ct)
            return ca, ct, acc + words.sum()
        return lax.fori_loop(0, L, body, (ca, ct, jnp.int32(0)))

    L = 32
    _ = jax.device_get(loop(pfN, w1N, w2N, ca, ct, L)[2])
    best = 1e9
    for _t in range(2):
        t0 = time.perf_counter()
        _ = jax.device_get(loop(pfN, w1N, w2N, ca, ct, L)[2])
        best = min(best, (time.perf_counter() - t0) / L)
    log(f"pallas {mode:7s} N={N} count={count}: {best*1e3:.3f} ms"
        f" ({best/max(count,1)*1e9:.0f} ns/real-step)")

run_variant("full", 32768, 32768)
run_variant("nocopy", 32768, 32768)
run_variant("empty", 32768, 32768)
run_variant("count", 32768, int(total))
run_variant("count", 2048, 2048)
run_variant("empty", 2048, 2048)
