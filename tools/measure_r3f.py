"""Ablation 3: syndrome-computation variants."""
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

from dump1090_tpu.constants import BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES
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

def syndromes_v2(msgs):
    """Both frame lengths; unpack straight to bf16 (no int8 hop)."""
    m_long, m_short = R._bit_matrices()
    shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
    b = ((msgs[:, :11, None].astype(jnp.int32) >> shifts[None, None, :]) & 1)
    bits = b.reshape(msgs.shape[0], 88).astype(jnp.bfloat16)

    def gf2(b, m):
        acc = jnp.dot(b, jnp.asarray(m, dtype=jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return acc.astype(jnp.int32) & 1

    w = jnp.asarray(1 << np.arange(23, -1, -1, dtype=np.int32))
    crc_long = (gf2(bits, m_long) * w).sum(axis=1)
    crc_short = (gf2(bits[:, :32], m_short) * w).sum(axis=1)

    def rem(b0, b1, b2):
        x = msgs.astype(jnp.int32)
        return (x[:, b0] << 16) | (x[:, b1] << 8) | x[:, b2]

    return crc_long ^ rem(11, 12, 13), crc_short ^ rem(4, 5, 6)

def syndromes_v3(msgs):
    """Byte-table XOR-fold: syn = XOR_j T[j, byte_j]; T is (11, 256) int32
    per frame length, gathered (small tables -> VMEM)."""
    @functools.cache
    def tables():
        from dump1090_tpu.ops import crc as crc_ops
        tl = np.zeros((11, 256), np.int32)
        ts = np.zeros((4, 256), np.int32)
        for j in range(11):
            for v in range(256):
                m = np.zeros(14, np.uint8); m[j] = v
                tl[j, v] = crc_ops.checksum(m, 112)
        for j in range(4):
            for v in range(256):
                m = np.zeros(14, np.uint8); m[j] = v
                ts[j, v] = crc_ops.checksum(m, 56)
        return tl, ts
    tl, ts = tables()
    x = msgs.astype(jnp.int32)
    syn_l = jnp.zeros(msgs.shape[0], jnp.int32)
    for j in range(11):
        syn_l = syn_l ^ jnp.asarray(tl[j])[x[:, j]]
    syn_s = jnp.zeros(msgs.shape[0], jnp.int32)
    for j in range(4):
        syn_s = syn_s ^ jnp.asarray(ts[j])[x[:, j]]
    def rem(b0, b1, b2):
        return (x[:, b0] << 16) | (x[:, b1] << 8) | x[:, b2]
    return syn_l ^ rem(11, 12, 13), syn_s ^ rem(4, 5, 6)

def group_ablate(xg, fn, both_at_once):
    def demod_pre(_, xb):
        cand = demod_batch(xb, scan_len=scan_len, max_candidates=MC)
        fb = lambda a: a.reshape((per_batch,) + a.shape[2:])
        acc = jnp.int32(0)
        if both_at_once:
            m = jnp.concatenate([fb(cand.msg1), fb(cand.msg2)], axis=0)
            sl, ss = fn(m)
            acc = acc + sl.sum() + ss.sum()
            acc = acc + fb(cand.errors1).sum() + fb(cand.gate1).sum()
            acc = acc + fb(cand.errors2).sum() + fb(cand.gate2).sum()
        else:
            for msgs, errors, gate in ((cand.msg1, cand.errors1, cand.gate1),
                                       (cand.msg2, cand.errors2, cand.gate2)):
                sl, ss = fn(fb(msgs))
                acc = acc + sl.sum() + ss.sum() + fb(errors).sum() + fb(gate).sum()
        return _, acc
    _, accs = lax.scan(demod_pre, 0, xg)
    return accs.sum().astype(jnp.float32)

def timeit(name, fn, both=False, L=6):
    @functools.partial(jax.jit, static_argnames=("L",))
    def loop(xg, L):
        def body(i, acc):
            return acc + group_ablate(perturb(xg, i), fn, both)
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

timeit("V1 current (int8 hop)", R.device_syndromes)
timeit("V2 direct bf16 unpack", syndromes_v2)
timeit("V3 byte-table gathers", syndromes_v3)
timeit("V2 both-passes-one-matmul", syndromes_v2, both=True)
