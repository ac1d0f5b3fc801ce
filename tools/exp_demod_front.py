#!/usr/bin/env python3
"""A/B experiment: demod front-half formulations (mask -> n/pos compaction).

Motivation (CLAUDE.md perf notes): the in-graph front half costs ~2.2 ms per
128-buffer batch while the standalone stage sum is ~1.9 ms and a
single-evaluation bound is ~0.7 ms — the 15-tap preamble predicate
(ops/demod.py:preamble_mask) has MULTIPLE consumers (mask.sum for `n`, the
bit-pack inside compact_positions, and its zero-padding copy), and XLA
re-evaluates the taps per consumer instead of materializing the bool mask.

Variants (all must be bit-identical to v0 on real traffic + noise):
  v0  current demod_batch front half (baseline)
  v1  single-evaluation: pack group bytes as the predicate's ONLY consumer,
      derive n = popcount(bytes), skip the zero-pad copy (predicate computed
      directly over the padded domain, masked by position)
  v2  v1 with the bit-pack as a bf16 one-hot-weights MXU matmul
  v3  algebraic-reuse predicate: shared pairwise compare arrays (gt/lt),
      shared 2-/4-wide running max (mm/mm2) serving the s3..s6-vs-s0,
      s4/s5-vs-high and s11..s14-vs-high terms, shared pair-sum q for high;
      packed like v1

Usage:
  python tools/exp_demod_front.py --check          # CPU bit-exactness
  python tools/exp_demod_front.py --time           # real-TPU timings
(--check pins the CPU backend; --time requires the chip and uploads inputs
before any compute, per the tunnel's fast-H2D window rule.)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FIXTURE = Path("/root/reference/testfiles/modes1.bin")


# ---------------------------------------------------------------------------
# variant front halves: m (uint16[N,S]) -> (n int32[N], pos int32[N,MC])
# ---------------------------------------------------------------------------

def _compact_from_bytes(byte, max_candidates: int, scan_len: int):
    """compact_positions' levels, entered at the packed group-byte array
    (ops/demod.py:301-361 keeps the byte build fused with its own mask
    consumer; here the bytes arrive precomputed)."""
    import jax.numpy as jnp
    from jax import lax

    n_grp = byte.shape[0]
    n_sup = -(-n_grp // 8)

    if max_candidates <= n_sup:
        bpad = jnp.zeros(n_sup * 8, jnp.int32)
        bpad = lax.dynamic_update_slice(bpad, byte, (0,))
        b8 = bpad.reshape(n_sup, 8)
        si = lax.iota(jnp.int32, n_sup)
        sscore = jnp.where((b8 > 0).any(axis=1), -si, jnp.int32(-(2**30)))
        svals, _ = lax.top_k(sscore, max_candidates)
        ssel = -svals
        valid_s = ssel < n_sup
        ssel_c = jnp.where(valid_s, ssel, 0)
        oh = (ssel_c[:, None] == si[None, :]) & valid_s[:, None]
        gbytes = jnp.dot(
            oh.astype(jnp.bfloat16), b8.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        t8 = jnp.arange(8, dtype=jnp.int32)
        gidx = ssel_c[:, None] * 8 + t8[None, :]
        gscore = jnp.where(
            (gbytes > 0) & valid_s[:, None],
            -(gidx * 256 + 255 - gbytes), jnp.int32(-(2**30)),
        ).reshape(-1)
        vals, _ = lax.top_k(gscore, max_candidates)
    else:
        gi = lax.iota(jnp.int32, n_grp)
        score = jnp.where(byte > 0, -(gi * 256 + 255 - byte), jnp.int32(-(2**30)))
        vals, _ = lax.top_k(score, max_candidates)

    v = -vals
    grp = v // 256
    gbyte = jnp.where(v < 2**30 - 1, 255 - (v % 256), 0)
    t = jnp.arange(8, dtype=jnp.int32)
    hit = ((gbyte[:, None] >> (7 - t[None, :])) & 1) > 0
    pos = grp[:, None] * 8 + t[None, :]
    pscore = jnp.where(hit & (pos < scan_len), -pos, jnp.int32(-(2**30)))
    pvals, _ = lax.top_k(pscore.reshape(-1), max_candidates)
    return jnp.minimum(-pvals, jnp.int32(scan_len))


def front_v0(m, scan_len: int, mc: int):
    import jax
    import jax.numpy as jnp

    from dump1090_tpu.ops.demod import compact_positions, preamble_mask

    mask = jax.vmap(lambda r: preamble_mask(r, scan_len))(m)
    n = mask.sum(axis=1).astype(jnp.int32)
    pos = jax.vmap(lambda r: compact_positions(r, mc, scan_len))(mask)
    return n, pos


def _predicate_padded(m, scan_len: int, n_pad: int, algebra: bool):
    """Preamble predicate over n_pad >= scan_len positions (tail forced 0).

    n_pad must satisfy n_pad + 15 <= len(m), which holds for the group
    geometry (m carries FULL_LEN_SAMPLES = 240 samples beyond scan_len)."""
    import jax.numpy as jnp
    from jax import lax

    def s(k: int):
        return lax.dynamic_slice_in_dim(m, k, n_pad).astype(jnp.int32)

    if not algebra:
        c = (
            (s(0) > s(1)) & (s(1) < s(2)) & (s(2) > s(3)) & (s(3) < s(0))
            & (s(4) < s(0)) & (s(5) < s(0)) & (s(6) < s(0))
            & (s(7) > s(8)) & (s(8) < s(9)) & (s(9) > s(6))
        )
        high = (s(0) + s(2) + s(7) + s(9)) // 6
        c &= (s(4) < high) & (s(5) < high)
        c &= (s(11) < high) & (s(12) < high) & (s(13) < high) & (s(14) < high)
    else:
        # shared subexpressions; each builds once and is tapped shifted.
        # Max tap offset is 11 (mm2) and mm2 itself reaches 2 further into
        # mm, so build over n_pad + 16 positions: the jnp.roll wraparound
        # garbage then lives beyond every tap.  m carries 240 samples past
        # scan_len >= n_pad - 7, so sb(1) below stays in bounds.
        nb = n_pad + 16

        def sb(k: int):
            return lax.dynamic_slice_in_dim(m, k, nb).astype(jnp.int32)

        a0, a1 = sb(0), sb(1)
        gt = a0 > a1                      # gt[j]  = m[j] >  m[j+1]
        lt = a0 < a1                      # lt[j]  = m[j] <  m[j+1]
        mm = jnp.maximum(a0, a1)          # mm[j]  = max(m[j], m[j+1])
        mm2 = jnp.maximum(mm, jnp.roll(mm, -2))   # max(m[j..j+3]) for j<nb-2
        q = a0 + jnp.roll(a0, -2)         # m[j] + m[j+2] for j < nb-2

        def tap(arr, k: int):
            return lax.dynamic_slice_in_dim(arr, k, n_pad)

        high = (tap(q, 0) + tap(q, 7)) // 6
        c = (
            tap(gt, 0) & tap(lt, 1) & tap(gt, 2)
            & (tap(mm2, 3) < tap(a0, 0))          # s3..s6 all < s0
            & (tap(gt, 7)) & (tap(lt, 8))
            & (tap(a0, 9) > tap(a0, 6))           # s9 > s6
            & (tap(mm, 4) < high)                 # s4, s5 < high
            & (tap(mm2, 11) < high)               # s11..s14 < high
        )
    iota = lax.iota(jnp.int32, n_pad)
    return c & (iota < scan_len)


def _front_packed(m, scan_len: int, mc: int, *, mxu: bool, algebra: bool):
    import jax
    import jax.numpy as jnp
    from jax import lax

    n_grp = -(-scan_len // 8)
    n_pad = n_grp * 8

    def one(row):
        c = _predicate_padded(row, scan_len, n_pad, algebra)
        bits = c.reshape(n_grp, 8)
        if mxu:
            w = (1 << (7 - jnp.arange(8))).astype(jnp.bfloat16)
            byte = jnp.dot(
                bits.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
            ).astype(jnp.int32)
        else:
            byte = jnp.bitwise_or.reduce(
                bits.astype(jnp.int32) << (7 - jnp.arange(8, dtype=jnp.int32)),
                axis=1,
            )
        n = lax.population_count(byte).sum().astype(jnp.int32)
        pos = _compact_from_bytes(byte, mc, scan_len)
        return n, pos

    return jax.vmap(one)(m)


VARIANTS = {
    "v0": front_v0,
    "v1": lambda m, sl, mc: _front_packed(m, sl, mc, mxu=False, algebra=False),
    "v2": lambda m, sl, mc: _front_packed(m, sl, mc, mxu=True, algebra=False),
    "v3": lambda m, sl, mc: _front_packed(m, sl, mc, mxu=False, algebra=True),
    "v4": lambda m, sl, mc: _front_packed(m, sl, mc, mxu=True, algebra=True),
}


def load_batch(nb: int) -> np.ndarray:
    from dump1090_tpu.parallel.sharding import overlapping_buffers

    raw = np.fromfile(FIXTURE, np.uint8)
    pad = np.full(476, 127, np.uint8)
    stream = np.concatenate([pad] + [raw] * 8)
    bufs = overlapping_buffers(stream)
    reps = -(-nb // bufs.shape[0])
    return np.concatenate([bufs] * reps)[:nb].copy()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--nb", type=int, default=128)
    ap.add_argument("--mc", type=int, default=256)
    ap.add_argument("--loops", type=int, default=16)
    args = ap.parse_args()

    import jax

    if args.check and not args.time:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import lax

    from dump1090_tpu.constants import BUF_SAMPLES, FULL_LEN_SAMPLES
    from dump1090_tpu.ops.magnitude import magnitude_from_iq

    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
    iq = load_batch(args.nb)

    # noise rows stress the padded tail + empty-group paths
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, iq[:8].shape, np.uint8)
    iq_noise = noise.copy()

    # upload BEFORE any compute: fast-H2D window (CLAUDE.md)
    d_iq = jax.device_put(iq)
    d_noise = jax.device_put(iq_noise)

    mag = jax.jit(jax.vmap(
        lambda r: magnitude_from_iq(r, out_dtype=jnp.uint16)))

    if args.check:
        m = mag(d_iq)
        mn = mag(d_noise)
        ref = None
        for name, fn in VARIANTS.items():
            f = jax.jit(lambda mm_, fn=fn: fn(mm_, scan_len, args.mc))
            got = tuple(np.asarray(x) for x in f(m))
            gotn = tuple(np.asarray(x) for x in f(mn))
            if ref is None:
                ref = (got, gotn)
                print(f"{name}: baseline  n.sum={got[0].sum()}")
                continue
            for a, b in zip(ref[0] + ref[1], got + gotn):
                np.testing.assert_array_equal(a, b)
            print(f"{name}: bit-identical to v0 (traffic + noise)")

    if args.time:
        assert jax.default_backend() == "tpu", jax.default_backend()
        m = mag(d_iq)
        m.block_until_ready()
        L = args.loops
        for name, fn in VARIANTS.items():
            def run(mm_, fn=fn):
                def body(_, acc):
                    n, pos = fn(mm_, scan_len, args.mc)
                    # consume both outputs (DCE guard, CLAUDE.md)
                    return acc + n.sum() + pos.sum()
                return lax.fori_loop(0, L, body, jnp.int32(0))

            f = jax.jit(run)
            jax.device_get(f(m))           # compile + warm
            t0 = time.perf_counter()
            out = jax.device_get(f(m))
            dt = (time.perf_counter() - t0) / L
            print(f"{name}: {dt*1e3:.3f} ms/batch (nb={args.nb}, "
                  f"mc={args.mc}, consumed {out})")


if __name__ == "__main__":
    main()
