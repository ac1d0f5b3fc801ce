"""Round-3 measurement probe: where does sustained_e2e time go?

Reproduces bench.py's steady state with per-phase instrumentation:
  - dispatch enqueue cost per group
  - fetch (device_get) wall time, with vs without compute in flight
  - Pallas resolve scan cost vs candidate count (per-step ns)
Run on the real chip.  Throwaway numbers land in stderr.
"""
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax
import os

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    cache = os.path.expanduser("~/.cache/dump1090_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dump1090_tpu.constants import (
    BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES, ICAO_CACHE_LEN,
)
from dump1090_tpu.ops.resolve import demod_resolve_group, demod_resolve_batch
from dump1090_tpu.parallel.sharding import demod_batch, overlapping_buffers

NB, G, W, T, MC, MO = 128, 12, 2, 6, 256, 16384
FIXTURE = Path("/root/reference/testfiles/modes1.bin")

def log(m): print(m, file=sys.stderr, flush=True)

raw = np.fromfile(FIXTURE, dtype=np.uint8)
n_bufs_total = W * G * NB
reps = int(np.ceil((n_bufs_total + W * G) * BLOCK_SAMPLES * 2 / len(raw)))
stream = np.concatenate([np.full(476, 127, np.uint8)] + [raw] * reps)
bufs = np.asarray(overlapping_buffers(stream))
groups_np = [
    np.stack([bufs[(g * G + k) * NB:(g * G + k) * NB + NB] for k in range(G)])
    for g in range(W)
]
t0 = time.perf_counter()
groups = [jax.device_put(jnp.asarray(x)) for x in groups_np]
for x in groups: x.block_until_ready()
log(f"h2d: {sum(x.nbytes for x in groups_np)/1e6:.0f} MB in {time.perf_counter()-t0:.2f}s")

scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES

def run_group(x, ca, ct):
    out = demod_resolve_group(
        x, ca, ct, 1_700_000_000, True, False,
        scan_len=scan_len, max_candidates=MC, max_out=MO,
        crcok_only=True, packed=True)
    return out[:4], out[-2], out[-1]

ca = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))
ct = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))
t0 = time.perf_counter()
outs, ca, ct = run_group(groups[0], ca, ct)
_ = jax.device_get(outs[1])
log(f"compile+first: {time.perf_counter()-t0:.1f}s")

# how many real candidates per batch? (n = per-buffer counts)
n_h = jax.device_get(outs[0])
log(f"candidates/batch: mean {n_h.sum(axis=1).mean():.0f} of {NB*MC} slots "
    f"({100*n_h.sum(axis=1).mean()/(NB*MC):.1f}%); per-buffer max {n_h.max()}")
count_h = jax.device_get(outs[1])
log(f"messages/batch: mean {count_h.mean():.0f} (MO={MO})")

# ---- 1. compute-only time per group (fetch scalar) -------------------------
for trial in range(2):
    t0 = time.perf_counter()
    o1, ca1, ct1 = run_group(groups[0], ca, ct)
    _ = jax.device_get(o1[1][0])  # scalar-ish fetch (G,)
    t_compute = time.perf_counter() - t0
    log(f"group compute (tiny fetch): {t_compute*1e3:.0f} ms")

# ---- 2. fetch cost idle vs in-flight ---------------------------------------
o1, ca1, ct1 = run_group(groups[0], ca, ct)
_ = jax.device_get(o1[1][0])  # drain
t0 = time.perf_counter()
host = jax.device_get(list(o1[:4]))
t_fetch_idle = time.perf_counter() - t0
nbytes = sum(np.asarray(h).nbytes for h in host)
log(f"fetch idle: {t_fetch_idle*1e3:.0f} ms for {nbytes/1e6:.2f} MB "
    f"-> {nbytes/t_fetch_idle/1e6:.0f} MB/s")

o2, ca2, ct2 = run_group(groups[1], ca1, ct1)  # in flight
t0 = time.perf_counter()
host = jax.device_get(list(o1[:4]))  # previous group's (already done) outputs
t_fetch_busy = time.perf_counter() - t0
log(f"fetch of DONE outputs while next group computes: {t_fetch_busy*1e3:.0f} ms")
t0 = time.perf_counter()
_ = jax.device_get(o2[1][0])
log(f"then drain compute: {(time.perf_counter()-t0)*1e3:.0f} ms")

# ---- 3. steady-state with per-phase accounting -----------------------------
t_disp, t_fetch = 0.0, 0.0
pending = None
t0 = time.perf_counter()
for t in range(T):
    ta = time.perf_counter()
    outs, ca, ct = run_group(groups[t % W], ca, ct)
    t_disp += time.perf_counter() - ta
    if pending is not None:
        ta = time.perf_counter()
        _ = jax.device_get(list(pending[:4]))
        t_fetch += time.perf_counter() - ta
    pending = outs
ta = time.perf_counter()
_ = jax.device_get(list(pending[:4]))
t_fetch += time.perf_counter() - ta
wall = time.perf_counter() - t0
new_per_group = G * NB * BLOCK_SAMPLES
log(f"steady: {T} groups in {wall*1e3:.0f} ms -> {T*new_per_group/wall/1e6:.0f} Ms/s; "
    f"dispatch-enqueue {t_disp*1e3:.0f} ms, fetch-blocked {t_fetch*1e3:.0f} ms")

# ---- 4. resolve scan cost vs N (pallas kernel alone) -----------------------
from dump1090_tpu.ops.resolve import (
    _pass_precompute, _resolve_words_pallas, PF_POS_MASK, PF_VALID,
    PF_NEWBUF, PF_GATE1,
)

cand = demod_batch(groups[0][0], scan_len=scan_len, max_candidates=MC)
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
    return pf, w1, w2

pf, w1, w2 = jax.device_get(make_words(cand))
for N in (2048, 8192, 32768):
    pfN = jax.device_put(jnp.asarray(pf[:N]))
    w1N = jax.device_put(jnp.asarray(w1[:N]))
    w2N = jax.device_put(jnp.asarray(w2[:N]))

    @functools.partial(jax.jit, static_argnames=("L",))
    def loop(pfN, w1N, w2N, ca, ct, L):
        def body(i, carry):
            ca, ct, acc = carry
            words, ca, ct, _ = _resolve_words_pallas(pfN ^ (i & 0), w1N, w2N, ca, ct, 1_700_000_000)
            return ca, ct, acc + words.sum()
        return lax.fori_loop(0, L, body, (ca, ct, jnp.int32(0)))

    L = 32
    _ = jax.device_get(loop(pfN, w1N, w2N, ca, ct, L)[2])
    best = 1e9
    for _t in range(2):
        t0 = time.perf_counter()
        _ = jax.device_get(loop(pfN, w1N, w2N, ca, ct, L)[2])
        best = min(best, (time.perf_counter() - t0) / L)
    log(f"pallas scan N={N}: {best*1e3:.3f} ms -> {best/N*1e9:.0f} ns/step")
