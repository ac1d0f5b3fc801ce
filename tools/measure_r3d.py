"""Ablation: where does the fused batch spend its 9.2 ms?  A=demod,
B=+precompute, C=+scan, D=full (emission).  Group-amortized (G=12)."""
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

def perturb(x, i):
    w = lax.bitcast_convert_type(x.reshape(x.shape[0], x.shape[1], -1, 4), jnp.int32)
    return lax.bitcast_convert_type(w + i, jnp.uint8).reshape(x.shape)

def group_variant(xg, ca, ct, stage):
    """stage: 'pre' (demod+precompute), 'scan' (+kernel), both group-level."""
    g_n, nb, nbytes = xg.shape
    per_batch = nb * MC
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
        return _, (nbuf_b, pf_b, w1, w2, m1, m2)

    _, (nbuf_st, pf_st, w1_st, w2_st, m1_st, m2_st) = lax.scan(demod_pre, 0, xg)
    n_flat = g_n * per_batch
    flat = lambda a: a.reshape((n_flat,) + a.shape[2:])
    pf, w1, w2 = flat(pf_st), flat(w1_st), flat(w2_st)
    if stage == "pre":
        acc = (pf.sum() + w1.sum() + w2.sum()
               + m1_st.astype(jnp.int32).sum() + m2_st.astype(jnp.int32).sum())
        return acc.astype(jnp.float32), ca, ct
    nbuf = nbuf_st.reshape(g_n * nb)
    words, ca, ct = R._resolve_words_pallas(pf, w1, w2, nbuf, ca, ct, now, mc=MC)
    acc = (words.sum() + m1_st.astype(jnp.int32).sum()
           + m2_st.astype(jnp.int32).sum())
    return acc.astype(jnp.float32), ca, ct

def timeit(name, stage, L=6):
    @functools.partial(jax.jit, static_argnames=("L",))
    def loop(xg, ca, ct, L):
        def body(i, carry):
            ca, ct, acc = carry
            a, ca, ct = group_variant(perturb(xg, i), ca, ct, stage)
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
    log(f"{name}: {best*1e3:.2f} ms/batch (group-amortized)")

timeit("B demod+precompute", "pre")
timeit("C +scan", "scan")
