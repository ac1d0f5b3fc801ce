#!/usr/bin/env python3
"""Parameterized real-TPU measurement probes.

Consolidates the round-3 throwaway scripts (measure_r3.py .. measure_r3g.py)
into one harness; conclusions from retired one-shot ablations live in
docs/DESIGN.md ("Perf ledger") and CLAUDE.md.  Probe -> ancestry map:

  steady     group dispatch/fetch accounting + steady-state Ms/s   (r3 §1-3)
  scan       Pallas resolve kernel ns/step vs stream length N      (r3 §4)
  front      full demod_batch A/B over front formulations          (r3b; the
             isolated front-only timing lives in exp_demod_front.py)
  stages     per-stage demod breakdown + HBM roofline fractions    (r3c/r3d)
  link       H2D/D2H transfer regimes (pre/post-compute windows)   (r3, bench)
  staged-h2d do uploads issued DURING the first compile retain the
             fast H2D window?  (round-4 experiment: decides whether a
             staged preload can buy back time-to-first-message)

Retired without a probe (negative results, recorded in DESIGN.md): r3e's
kernel hash-prefetch toy (wash on the toy body, shipped in the real kernel
after an in-situ win), r3f's syndrome-computation variants (GF(2) matmul
won), r3g's two-program demod split (program boundary did not reclaim the
re-read tax; the packed front did, round 4).

Usage:  python tools/measure.py --probe stages [--nb 128] [--mc 256]
Requires the real chip (asserts backend == tpu) except --probe staged-h2d,
which only needs *a* device but is meaningless off the tunnel.
"""

from __future__ import annotations

import argparse
import functools
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FIXTURE = Path("/root/reference/testfiles/modes1.bin")
HBM_GBPS = 720e9  # v5e HBM bandwidth (CLAUDE.md)


def log(m):
    print(m, flush=True)


def load_buffers(n_bufs: int) -> np.ndarray:
    """n_bufs reference-geometry buffers of real traffic (fixture tiled)."""
    from dump1090_tpu.constants import BLOCK_SAMPLES
    from dump1090_tpu.parallel.sharding import overlapping_buffers

    raw = np.fromfile(FIXTURE, np.uint8)
    reps = int(np.ceil((n_bufs + 1) * BLOCK_SAMPLES * 2 / len(raw)))
    stream = np.concatenate([np.full(476, 127, np.uint8)] + [raw] * reps)
    bufs = np.asarray(overlapping_buffers(stream))
    reps = -(-n_bufs // bufs.shape[0])
    return np.concatenate([bufs] * reps)[:n_bufs].copy()


def best_of(fn, warm=1, trials=3):
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------------------
# steady: product-path group dispatch/fetch accounting (from measure_r3.py)
# ---------------------------------------------------------------------------

def probe_steady(args):
    import jax
    import jax.numpy as jnp

    from dump1090_tpu.constants import (
        BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES, ICAO_CACHE_LEN,
    )
    from dump1090_tpu.ops.resolve import demod_resolve_group

    NB, G, W, T, MC, MO = args.nb, 12, 2, 6, args.mc, 16384
    bufs = load_buffers(W * G * NB)
    groups_np = [
        bufs[g * G * NB:(g + 1) * G * NB].reshape(G, NB, -1) for g in range(W)
    ]
    t0 = time.perf_counter()
    groups = [jax.device_put(jnp.asarray(x)) for x in groups_np]
    for x in groups:
        x.block_until_ready()
    log(f"h2d: {sum(x.nbytes for x in groups_np)/1e6:.0f} MB in "
        f"{time.perf_counter()-t0:.2f}s")

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

    n_h = jax.device_get(outs[0])
    log(f"candidates/batch: mean {n_h.sum(axis=1).mean():.0f} of {NB*MC} "
        f"slots; per-buffer max {n_h.max()}")

    for _ in range(2):
        t0 = time.perf_counter()
        o1, ca1, ct1 = run_group(groups[0], ca, ct)
        _ = jax.device_get(o1[1][0])
        log(f"group compute (tiny fetch): {(time.perf_counter()-t0)*1e3:.0f} ms")

    o1, ca1, ct1 = run_group(groups[0], ca, ct)
    _ = jax.device_get(o1[1][0])
    t0 = time.perf_counter()
    host = jax.device_get(list(o1[:4]))
    dt = time.perf_counter() - t0
    nbytes = sum(np.asarray(h).nbytes for h in host)
    log(f"fetch idle: {dt*1e3:.0f} ms for {nbytes/1e6:.2f} MB "
        f"-> {nbytes/dt/1e6:.0f} MB/s")

    t_disp = t_fetch = 0.0
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
    log(f"steady: {T} groups in {wall*1e3:.0f} ms -> "
        f"{T*G*NB*BLOCK_SAMPLES/wall/1e6:.0f} Ms/s; dispatch-enqueue "
        f"{t_disp*1e3:.0f} ms, fetch-blocked {t_fetch*1e3:.0f} ms")


# ---------------------------------------------------------------------------
# scan: resolve kernel ns/step (from measure_r3.py §4)
# ---------------------------------------------------------------------------

def probe_scan(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dump1090_tpu.constants import (
        BUF_SAMPLES, FULL_LEN_SAMPLES, ICAO_CACHE_LEN,
    )
    from dump1090_tpu.ops.resolve import (
        PF_GATE1, PF_NEWBUF, PF_POS_MASK, PF_VALID, _pass_precompute,
        _resolve_words_pallas,
    )
    from dump1090_tpu.parallel.sharding import demod_batch

    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
    MC = args.mc
    iq = jax.device_put(load_buffers(args.nb))
    cand = demod_batch(iq, scan_len=scan_len, max_candidates=MC)
    nb, mc = cand.pos.shape
    n_flat = nb * mc
    flat = lambda a: a.reshape((n_flat,) + a.shape[2:])

    @jax.jit
    def make_words(cand):
        fe = jnp.asarray(True)
        ag = jnp.asarray(False)
        w1, _, _ = _pass_precompute(
            flat(cand.msg1), flat(cand.errors1), flat(cand.gate1), ag, fe)
        w2, _, _ = _pass_precompute(
            flat(cand.msg2), flat(cand.errors2), flat(cand.gate2), ag, fe)
        slot = jnp.arange(n_flat, dtype=jnp.int32)
        valid = (slot % mc) < jnp.repeat(jnp.minimum(cand.n, mc), mc)
        pf = (jnp.minimum(flat(cand.pos), PF_POS_MASK)
              | valid.astype(jnp.int32) * PF_VALID
              | ((slot % mc) == 0).astype(jnp.int32) * PF_NEWBUF
              | flat(cand.gate1).astype(jnp.int32) * PF_GATE1)
        return pf, w1, w2

    pf, w1, w2 = jax.device_get(make_words(cand))
    ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
    for N in (2048, 8192, 32768):
        pfN = jax.device_put(jnp.asarray(pf[:N]))
        w1N = jax.device_put(jnp.asarray(w1[:N]))
        w2N = jax.device_put(jnp.asarray(w2[:N]))

        @functools.partial(jax.jit, static_argnames=("L",))
        def loop(pfN, w1N, w2N, ca, ct, L):
            def body(i, carry):
                ca, ct, acc = carry
                words, ca, ct, _ = _resolve_words_pallas(
                    pfN ^ (i & 0), w1N, w2N, ca, ct, 1_700_000_000)
                return ca, ct, acc + words.sum()
            return lax.fori_loop(0, L, body, (ca, ct, jnp.int32(0)))

        L = 32
        dt = best_of(lambda: jax.device_get(
            loop(pfN, w1N, w2N, ca, ct, L)[2]), warm=1, trials=2) / L
        log(f"pallas scan N={N}: {dt*1e3:.3f} ms -> {dt/N*1e9:.0f} ns/step")


# ---------------------------------------------------------------------------
# front: full demod_batch A/B over front formulations (from measure_r3b)
# ---------------------------------------------------------------------------

def probe_front(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dump1090_tpu.constants import BUF_SAMPLES, FULL_LEN_SAMPLES
    from dump1090_tpu.parallel.sharding import demod_batch

    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
    d_iq = jax.device_put(load_buffers(args.nb))
    L = 32
    for front in ("mask", "packed-plain", "packed", "packed-mxu"):
        def run(x, front=front):
            def body(i, acc):
                # perturb per iteration or LICM hoists the demod out of
                # the loop and the numbers are fiction (see ab-sustained)
                w = lax.bitcast_convert_type(
                    x.reshape(x.shape[0], -1, 4), jnp.int32)
                xi = lax.bitcast_convert_type(w + i, jnp.uint8).reshape(x.shape)
                c = demod_batch(xi, scan_len=scan_len,
                                max_candidates=args.mc, front=front)
                s = jnp.int32(0)
                for f in jax.tree_util.tree_leaves(c):
                    s = s + f.astype(jnp.int32).sum()
                return acc + s
            return lax.fori_loop(0, L, body, jnp.int32(0))

        f = jax.jit(run)
        dt = best_of(lambda: jax.device_get(f(d_iq)), warm=1, trials=3) / L
        log(f"{front}: {dt*1e3:.3f} ms/batch full demod (nb={args.nb})")


# ---------------------------------------------------------------------------
# ab-sustained: the decisive front A/B — the real grouped product protocol,
# interleaved in ONE process so tunnel/chip mood drift hits both variants.
# (probe_front's isolated loop is LICM-contaminated: packed "won" it 1.87 vs
# 2.76 ms but LOST the real program — always trust this probe over it.)
# ---------------------------------------------------------------------------

def probe_ab_sustained(args):
    import jax
    import jax.numpy as jnp

    from dump1090_tpu.constants import (
        BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES, ICAO_CACHE_LEN,
    )
    from dump1090_tpu.models.pipeline import start_d2h
    from dump1090_tpu.ops.resolve import _group_back, _group_front

    NB, G, W, T, MC, MOS, MOL = args.nb, 12, 2, 6, args.mc, 5632, 9216
    bufs = load_buffers(W * G * NB)
    groups = [jax.device_put(jnp.asarray(
        bufs[g * G * NB:(g + 1) * G * NB].reshape(G, NB, -1)))
        for g in range(W)]
    for x in groups:
        x.block_until_ready()
    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES

    def run_group(x, ca, ct, front):
        m, n, pos = _group_front(
            x, scan_len=scan_len, max_candidates=MC, front=front)
        out = _group_back(
            m, n, pos, ca, ct, 1_700_000_000, True, False,
            scan_len=scan_len, max_candidates=MC, max_out=0,
            max_out_short=MOS, max_out_long=MOL,
            crcok_only=True, pallas=True, packed=True)
        start_d2h(out[:6])
        return out[:6], out[-2], out[-1]

    def sustained(front):
        ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
        ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
        pending, tot = None, 0
        t0 = time.perf_counter()
        for t in range(T):
            outs, ca, ct = run_group(groups[t % W], ca, ct, front)
            if pending is not None:
                tot += int(jax.device_get(list(pending))[1].sum())
            pending = outs
        tot += int(jax.device_get(list(pending))[1].sum())
        return T * G * NB * BLOCK_SAMPLES / (time.perf_counter() - t0) / 1e6, tot

    fronts = ("mask", "packed")
    for f in fronts:
        r, n = sustained(f)
        log(f"warm {f}: {r:.0f} Ms/s ({n} msgs)")
    for rep in range(3):
        for f in fronts:
            r, _ = sustained(f)
            log(f"rep{rep} {f}: {r:.0f} Ms/s")


# ---------------------------------------------------------------------------
# ab-front2: magnitude-placement A/B in the real sustained protocol.
# The round-5 trace attributed the mask front's 2.23 ms/batch NOT to the
# 15-tap predicate (0.34 ms) but to the magnitude chain (~1.45 ms): inside
# the per-batch scan, XLA lowers the u8->u16 pair bitcast as
# convert+reshape+combine in a buffers-minor layout at T(2,128) tiling
# (2 of 8 sublanes) — 6x the isolated magnitude cost.  Variants hoist the
# magnitude out of the scan (or drop the scan) so it computes on the
# entry-layout parameter.
# ---------------------------------------------------------------------------

def _front_variants():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.layout import Format, Layout

    from dump1090_tpu.ops.demod import front_candidates
    from dump1090_tpu.ops.magnitude import magnitude_from_iq, magnitude_from_pairs
    from dump1090_tpu.ops.resolve import _group_front

    def mag_rows(x2d):
        return jax.vmap(
            lambda r: magnitude_from_iq(r, out_dtype=jnp.uint16))(x2d)

    def hoist_body(xg, *, scan_len, max_candidates, front=None):
        m_g = jax.vmap(mag_rows)(xg)
        n_pos = lax.scan(
            lambda c, mb: (c, front_candidates(
                mb, scan_len, max_candidates, front)),
            0, m_g)[1]
        return m_g, n_pos[0], n_pos[1]

    front_hoist = functools.partial(
        jax.jit, static_argnames=("scan_len", "max_candidates", "front")
    )(hoist_body)

    # entry layout pinned samples-minor (row-major): tests whether the
    # magnitude chain's T(2,128) pathology is purely the buffers-minor
    # entry layout XLA picks for the group stack.  (pjit rejects kwargs
    # alongside in_shardings, so statics are baked via closure.)
    _pin_cache = {}

    def front_pin(xg, *, scan_len, max_candidates, front=None):
        key = (scan_len, max_candidates, front)
        if key not in _pin_cache:
            fmt = Format(
                Layout(major_to_minor=(0, 1, 2)),
                jax.sharding.SingleDeviceSharding(jax.devices()[0]),
            )
            _pin_cache[key] = jax.jit(
                lambda x: hoist_body(
                    x, scan_len=scan_len, max_candidates=max_candidates,
                    front=front),
                in_shardings=fmt,
            )
        return _pin_cache[key](xg)

    @functools.partial(
        jax.jit, static_argnames=("scan_len", "max_candidates", "front"))
    def front_flat(xg, *, scan_len, max_candidates, front=None):
        g, nb, s2 = xg.shape
        m = mag_rows(xg.reshape(g * nb, s2))
        n, pos = front_candidates(m, scan_len, max_candidates, front)
        return (m.reshape(g, nb, -1), n.reshape(g, nb),
                pos.reshape(g, nb, -1))

    # host uploads the SAME wire bytes as a numpy uint16 view; the whole
    # magnitude becomes elementwise (no reshape/bitcast for XLA to place).
    @functools.partial(
        jax.jit, static_argnames=("scan_len", "max_candidates", "front"))
    def front_hoist16(xg16, *, scan_len, max_candidates, front=None):
        m_g = magnitude_from_pairs(xg16, out_dtype=jnp.uint16)
        n_pos = lax.scan(
            lambda c, mb: (c, front_candidates(
                mb, scan_len, max_candidates, front)),
            0, m_g)[1]
        return m_g, n_pos[0], n_pos[1]

    return {
        "scan": _group_front,
        "hoist": front_hoist,
        "pin": front_pin,
        "flat": front_flat,
        "hoist16": front_hoist16,
    }


def probe_ab_front2(args):
    import jax
    import jax.numpy as jnp

    from dump1090_tpu.constants import (
        BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES, ICAO_CACHE_LEN,
    )
    from dump1090_tpu.models.pipeline import start_d2h
    from dump1090_tpu.ops.resolve import _group_back

    NB, G, W, T, MC, MOS, MOL = args.nb, 12, 2, 6, args.mc, 5632, 9216
    bufs = load_buffers(W * G * NB)
    groups = [jax.device_put(jnp.asarray(
        bufs[g * G * NB:(g + 1) * G * NB].reshape(G, NB, -1)))
        for g in range(W)]
    # same wire bytes, zero-copy host uint16 view (the *16 variants)
    groups16 = [jax.device_put(jnp.asarray(
        bufs.view("<u2")[g * G * NB:(g + 1) * G * NB].reshape(G, NB, -1)))
        for g in range(W)]
    for x in groups + groups16:
        x.block_until_ready()
    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
    variants = _front_variants()
    pallas = jax.default_backend() != "cpu"

    def run_group(x, ca, ct, fv):
        m, n, pos = fv(x, scan_len=scan_len, max_candidates=MC, front=None)
        out = _group_back(
            m, n, pos, ca, ct, 1_700_000_000, True, False,
            scan_len=scan_len, max_candidates=MC, max_out=0,
            max_out_short=MOS, max_out_long=MOL,
            crcok_only=True, pallas=pallas, packed=True)
        start_d2h(out[:6])
        return out[:6], out[-2], out[-1]

    def sustained(name):
        fv = variants[name]
        gs = groups16 if name.endswith("16") else groups
        ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
        ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
        pending, tot = None, 0
        t0 = time.perf_counter()
        for t in range(T):
            outs, ca, ct = run_group(gs[t % W], ca, ct, fv)
            if pending is not None:
                tot += int(jax.device_get(list(pending))[1].sum())
            pending = outs
        tot += int(jax.device_get(list(pending))[1].sum())
        return T * G * NB * BLOCK_SAMPLES / (time.perf_counter() - t0) / 1e6, tot

    names = list(variants)
    base = {}
    for name in names:  # warm (compile) + equivalence check
        r, msgs = sustained(name)
        base[name] = msgs
        log(f"warm {name}: {r:.0f} Ms/s ({msgs} msgs)")
    assert len(set(base.values())) == 1, f"variants disagree: {base}"
    for rep in range(3):
        for name in names:
            r, _ = sustained(name)
            log(f"rep{rep} {name}: {r:.0f} Ms/s")


def probe_ab_depth(args):
    """Dispatch-ahead depth A/B on the product (hoist16) wire: with device
    compute ~= fetch on this link, does holding more than one group in
    flight (fetch g-D instead of g-1) hide link jitter?"""
    import collections

    import jax
    import jax.numpy as jnp

    from dump1090_tpu.constants import (
        BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES, ICAO_CACHE_LEN,
    )
    from dump1090_tpu.models.pipeline import start_d2h
    from dump1090_tpu.ops.resolve import _group_back

    NB, G, W, T, MC, MOS, MOL = args.nb, 12, 3, 10, args.mc, 5632, 9216
    bufs = load_buffers(W * G * NB)
    groups16 = [jax.device_put(jnp.asarray(
        bufs.view("<u2")[g * G * NB:(g + 1) * G * NB].reshape(G, NB, -1)))
        for g in range(W)]
    for x in groups16:
        x.block_until_ready()
    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
    fv = _front_variants()["hoist16"]
    pallas = jax.default_backend() != "cpu"

    def run_group(x, ca, ct):
        m, n, pos = fv(x, scan_len=scan_len, max_candidates=MC, front=None)
        out = _group_back(
            m, n, pos, ca, ct, 1_700_000_000, True, False,
            scan_len=scan_len, max_candidates=MC, max_out=0,
            max_out_short=MOS, max_out_long=MOL,
            crcok_only=True, pallas=pallas, packed=True)
        start_d2h(out[:6])
        return out[:6], out[-2], out[-1]

    def sustained(depth):
        ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
        ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
        q, tot = collections.deque(), 0
        t0 = time.perf_counter()
        for t in range(T):
            outs, ca, ct = run_group(groups16[t % W], ca, ct)
            q.append(outs)
            if len(q) > depth:
                tot += int(jax.device_get(list(q.popleft()))[1].sum())
        while q:
            tot += int(jax.device_get(list(q.popleft()))[1].sum())
        return T * G * NB * BLOCK_SAMPLES / (time.perf_counter() - t0) / 1e6, tot

    depths = [1, 2, 3]
    base = {}
    for d in depths:
        r, msgs = sustained(d)
        base[d] = msgs
        log(f"warm depth={d}: {r:.0f} Ms/s ({msgs} msgs)")
    assert len(set(base.values())) == 1, f"depths disagree: {base}"
    for rep in range(3):
        for d in depths:
            r, _ = sustained(d)
            log(f"rep{rep} depth={d}: {r:.0f} Ms/s")


# ---------------------------------------------------------------------------
# trace: jax.profiler op-level attribution of the grouped product program
# (round-5 directive: settle the demod floor with EVIDENCE, not hypotheses)
# ---------------------------------------------------------------------------

def _trace_device_ops(trace_dir: str):
    """Aggregate device-lane op self-times from the trace-viewer JSON that
    jax.profiler.trace writes (no tensorboard needed).  Returns
    {op_name: (total_us, count, example_args)} for events on device
    processes, plus the process-name map for diagnostics."""
    import collections
    import glob
    import gzip
    import json

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    d = json.loads(gzip.open(max(paths)).read())
    evs = d["traceEvents"]
    pnames, tnames = {}, {}
    for e in evs:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        elif e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"]["name"]
    dev_pids = {p for p, n in pnames.items()
                if "TPU" in n or "/device" in n.lower()}
    # CPU backend: XLA op events live on the PjRt client thread instead
    dev_tids = {k for k, n in tnames.items()
                if "XLAPjRt" in n or "TensorCore" in n}
    agg = collections.defaultdict(lambda: [0.0, 0, None])
    for e in evs:
        if e.get("ph") != "X":
            continue
        if e["pid"] not in dev_pids and (e["pid"], e.get("tid")) not in dev_tids:
            continue
        a = agg[e["name"]]
        a[0] += e.get("dur", 0.0)
        a[1] += 1
        if a[2] is None and e.get("args"):
            a[2] = e["args"]
    return dict(agg), pnames


def probe_trace(args):
    import os
    import shutil

    import jax
    import jax.numpy as jnp

    from dump1090_tpu.constants import (
        BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES, ICAO_CACHE_LEN,
    )
    from dump1090_tpu.models.pipeline import start_d2h
    from dump1090_tpu.ops.resolve import _group_back, _group_front

    NB, G, T, MC, MOS, MOL = args.nb, 12, 2, args.mc, 5632, 9216
    bufs = load_buffers(G * NB)
    if args.variant and args.variant.endswith("16"):
        bufs = bufs.view("<u2")
    x = jax.device_put(jnp.asarray(bufs.reshape(G, NB, -1)))
    x.block_until_ready()
    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES

    pallas = jax.default_backend() != "cpu"
    fv = _front_variants()[args.variant] if args.variant else _group_front

    def run_group(x, ca, ct, front):
        m, n, pos = fv(
            x, scan_len=scan_len, max_candidates=MC, front=front)
        out = _group_back(
            m, n, pos, ca, ct, 1_700_000_000, True, False,
            scan_len=scan_len, max_candidates=MC, max_out=0,
            max_out_short=MOS, max_out_long=MOL,
            crcok_only=True, pallas=pallas, packed=True)
        start_d2h(out[:6])
        return out[:6], out[-2], out[-1]

    fronts = args.front.split(",") if args.front else ["mask", "packed"]
    reports = {}
    for front in fronts:
        ca = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
        ct = jnp.zeros(ICAO_CACHE_LEN, jnp.int32)
        # warm: compile outside the trace window
        outs, ca, ct = run_group(x, ca, ct, front)
        _ = jax.device_get(list(outs))
        tdir = f"/tmp/d1090_trace_{front}"
        shutil.rmtree(tdir, ignore_errors=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(tdir):
            for _t in range(T):
                outs, ca, ct = run_group(x, ca, ct, front)
                _ = jax.device_get(list(outs))
        wall = time.perf_counter() - t0
        agg, pnames = _trace_device_ops(tdir)
        log(f"\n=== front={front}: {T} groups x {G} batches in "
            f"{wall*1e3:.0f} ms wall "
            f"({T*G*NB*BLOCK_SAMPLES/wall/1e6:.0f} Ms/s incl. trace "
            f"overhead); trace: {tdir}")
        log(f"device processes: "
            f"{sorted(n for n in pnames.values() if 'TPU' in n or 'device' in n.lower())}")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        total_us = sum(v[0] for v in agg.values())
        log(f"{'per-batch':>10}  {'total':>9}  {'count':>6}  op")
        for name, (us, n, a) in rows[: args.top]:
            extra = ""
            if a:
                for k in ("long_name", "hlo_op", "tf_op", "source"):
                    if a.get(k) and a[k] != name:
                        extra = f"  [{str(a[k])[:120]}]"
                        break
            log(f"{us/1e3/(T*G):8.3f} ms  {us/1e3:7.1f} ms  {n:6d}  "
                f"{name[:90]}{extra}")
        log(f"device total: {total_us/1e3:.1f} ms "
            f"({total_us/1e3/(T*G):.3f} ms/batch)")
        reports[front] = agg
    return reports


# ---------------------------------------------------------------------------
# stages: per-stage demod breakdown + HBM roofline (from measure_r3c/r3d)
# ---------------------------------------------------------------------------

def probe_stages(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dump1090_tpu.constants import BUF_SAMPLES, FULL_LEN_SAMPLES
    from dump1090_tpu.ops.demod import (
        candidate_passes_window, front_candidates, gather_candidate_windows,
    )
    from dump1090_tpu.ops.magnitude import magnitude_from_iq
    from dump1090_tpu.parallel.sharding import demod_batch

    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
    MC = args.mc
    iq_np = load_buffers(args.nb)
    d_iq = jax.device_put(iq_np)
    nb, nbytes = iq_np.shape
    S = nbytes // 2
    L = 32

    def perturb(a, i):
        # int32-bitcast add on the PRIMARY array input: defeats XLA's
        # loop-invariant code motion, which otherwise hoists the whole
        # stage out of the timing loop and leaves only the ~1.5 ms
        # dispatch floor (observed; same trap as the front probe)
        per = 4 // a.dtype.itemsize  # uint8 -> 4, uint16 -> 2
        w = lax.bitcast_convert_type(
            a.reshape(a.shape[:-1] + (a.shape[-1] // per, per)), jnp.int32)
        return lax.bitcast_convert_type(w + i, a.dtype).reshape(a.shape)

    def timed(name, build, min_bytes):
        def run(*xs):
            def body(i, acc):
                out = build(perturb(xs[0], i), *xs[1:])
                s = jnp.int32(0)
                for f in jax.tree_util.tree_leaves(out):
                    s = s + f.astype(jnp.int32).sum()
                return acc + s
            return lax.fori_loop(0, L, body, jnp.int32(0))
        return name, run, min_bytes

    mag = jax.jit(jax.vmap(lambda r: magnitude_from_iq(r, out_dtype=jnp.uint16)))
    m = mag(d_iq)
    m.block_until_ready()
    cand = demod_batch(d_iq, scan_len=scan_len, max_candidates=MC)
    w = gather_candidate_windows(m, cand.pos, pallas=True)
    w.block_until_ready()

    stages = [
        # (name, thunk factory args, minimal HBM bytes: inputs + outputs)
        timed("magnitude", lambda x: mag(x), nb * (2 * S + 2 * S)),
        timed("front", lambda mm: front_candidates(mm, scan_len, MC),
              nb * 2 * S + nb * MC * 4),
        timed("gather",
              lambda mm, pp: gather_candidate_windows(mm, pp, pallas=True),
              nb * 2 * S + nb * MC * 256 * 2),
        timed("passes",
              lambda ww, pp: jax.vmap(jax.vmap(candidate_passes_window))(ww, pp),
              nb * MC * 256 * 2 * 2),
        timed("demod_full",
              lambda x: demod_batch(x, scan_len=scan_len, max_candidates=MC),
              nb * 2 * S + nb * 2 * S),  # IQ in + magnitudes materialized
    ]
    inputs = {
        "magnitude": (d_iq,), "front": (m,), "gather": (m, cand.pos),
        "passes": (w, cand.pos), "demod_full": (d_iq,),
    }
    log(f"nb={nb} S={S} MC={MC}  (roofline = min-bytes / {HBM_GBPS/1e9:.0f} GB/s)")
    for name, run, min_bytes in stages:
        f = jax.jit(run)
        dt = best_of(lambda: jax.device_get(f(*inputs[name])),
                     warm=1, trials=3) / L
        sol = min_bytes / HBM_GBPS / dt
        log(f"{name:>10}: {dt*1e3:6.3f} ms  min {min_bytes/1e6:7.1f} MB  "
            f"SoL {100*sol:5.1f}%")


# ---------------------------------------------------------------------------
# link: transfer regimes (from measure_r3 + bench diagnostics)
# ---------------------------------------------------------------------------

def probe_link(args):
    import jax
    import jax.numpy as jnp

    mb = 64
    xs = [np.random.randint(0, 255, mb << 20, dtype=np.uint8) for _ in range(3)]
    t0 = time.perf_counter()
    ds = [jax.device_put(x) for x in xs]
    for d in ds:
        d.block_until_ready()
    dt = time.perf_counter() - t0
    log(f"H2D pre-compute: {3*mb/1024/dt:.2f} GB/s ({3*mb} MB in {dt*1e3:.0f} ms)")

    y = jnp.arange(1024, dtype=jnp.int32)
    _ = jax.device_get(jnp.sum(y))  # first compute: regime switch
    t0 = time.perf_counter()
    d2 = jax.device_put(xs[0])
    d2.block_until_ready()
    dt = time.perf_counter() - t0
    log(f"H2D post-compute: {mb/1024/dt:.3f} GB/s ({mb} MB in {dt*1e3:.0f} ms)")

    t0 = time.perf_counter()
    _ = jax.device_get(ds[0])
    dt = time.perf_counter() - t0
    log(f"D2H (no pre-issued copy): {mb/1024/dt:.3f} GB/s "
        f"({mb} MB in {dt*1e3:.0f} ms)")
    ds[1].copy_to_host_async()
    ds[2].copy_to_host_async()
    t0 = time.perf_counter()
    _ = jax.device_get([ds[1], ds[2]])
    dt = time.perf_counter() - t0
    log(f"D2H (pre-issued copy_to_host_async x2): {2*mb/1024/dt:.3f} GB/s "
        f"({2*mb} MB in {dt*1e3:.0f} ms)")
    for sz_kb in (4, 512):
        small = jax.device_put(np.zeros(sz_kb << 10, np.uint8))
        small.block_until_ready()
        dt = best_of(lambda: jax.device_get(small), warm=1, trials=3)
        log(f"D2H floor ({sz_kb} KB): {dt*1e3:.1f} ms")


# ---------------------------------------------------------------------------
# staged-h2d: do uploads issued during the FIRST compile ride the fast
# window?  Decides the staged-preload design (round-4 directive).
# ---------------------------------------------------------------------------

def probe_staged_h2d(args):
    import jax
    import jax.numpy as jnp

    from dump1090_tpu.constants import BUF_SAMPLES, FULL_LEN_SAMPLES
    from dump1090_tpu.parallel.sharding import demod_batch

    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
    # group 1: uploaded pre-compute (the known-fast window)
    g1_np = load_buffers(args.nb)
    chunk_np = [load_buffers(args.nb) for _ in range(6)]

    t0 = time.perf_counter()
    g1 = jax.device_put(g1_np)
    g1.block_until_ready()
    log(f"[pre-compute ] g1 {g1_np.nbytes/1e6:.0f} MB at "
        f"{g1_np.nbytes/1e9/(time.perf_counter()-t0):.2f} GB/s")

    events = []
    stop = threading.Event()

    def uploader():
        k = 0
        while not stop.is_set() and k < len(chunk_np):
            x = chunk_np[k]
            t0 = time.perf_counter()
            d = jax.device_put(x)
            d.block_until_ready()
            events.append((t0, time.perf_counter(), x.nbytes))
            k += 1

    th = threading.Thread(target=uploader, daemon=True)
    t_compile0 = time.perf_counter()
    th.start()
    # defeat the persistent compilation cache: mc is salted so this exact
    # program was never compiled before
    mc = args.mc + 2 * (int(time.time()) % 1000) + 1
    cand = demod_batch(g1, scan_len=scan_len, max_candidates=mc)
    t_dispatched = time.perf_counter()
    jax.block_until_ready(cand)
    t_done = time.perf_counter()
    stop.set()
    th.join(timeout=30)
    log(f"compile (dispatch returned): {t_dispatched-t_compile0:.1f}s; "
        f"first execution done: {t_done-t_compile0:.1f}s")
    for (a, b, nb_) in events:
        if b <= t_dispatched:
            win = "during-compile"
        elif a >= t_done:
            win = "post-execute"
        else:
            win = "straddles-exec"
        log(f"[{win:>14}] {nb_/1e6:.0f} MB at {nb_/1e9/(b-a):.2f} GB/s "
            f"(t={a-t_compile0:.1f}..{b-t_compile0:.1f}s)")
    # post-execute control
    t0 = time.perf_counter()
    d = jax.device_put(chunk_np[0])
    d.block_until_ready()
    log(f"[ post-execute] control {chunk_np[0].nbytes/1e6:.0f} MB at "
        f"{chunk_np[0].nbytes/1e9/(time.perf_counter()-t0):.2f} GB/s")


PROBES = {
    "steady": probe_steady,
    "scan": probe_scan,
    "front": probe_front,
    "ab-sustained": probe_ab_sustained,
    "ab-front2": probe_ab_front2,
    "ab-depth": probe_ab_depth,
    "trace": probe_trace,
    "stages": probe_stages,
    "link": probe_link,
    "staged-h2d": probe_staged_h2d,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", required=True, choices=sorted(PROBES))
    ap.add_argument("--nb", type=int, default=128)
    ap.add_argument("--mc", type=int, default=256)
    ap.add_argument("--front", default=None,
                    help="comma-separated front variants for --probe trace")
    ap.add_argument("--top", type=int, default=30,
                    help="ops to print per trace report")
    ap.add_argument("--variant", default=None,
                    help="front-program variant for --probe trace "
                    "(scan|hoist|pin|flat|hoist16; default the shipped "
                    "_group_front)")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="dry-run the probe machinery on the CPU backend "
                    "(numbers are meaningless; for logic checks only)")
    args = ap.parse_args()

    import jax

    if args.allow_cpu:
        jax.config.update("jax_platforms", "cpu")
    elif args.probe != "staged-h2d":
        assert jax.default_backend() == "tpu", jax.default_backend()
    log(f"device: {jax.devices()[0]}")
    PROBES[args.probe](args)


if __name__ == "__main__":
    main()
