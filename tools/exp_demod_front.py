#!/usr/bin/env python3
"""A/B experiment: demod front-half formulations (mask -> n/pos compaction).

Motivation (CLAUDE.md perf notes): the in-graph front half costs ~2.2 ms per
128-buffer batch while the standalone stage sum is ~1.9 ms and a
single-evaluation bound is ~0.7 ms — the 15-tap preamble predicate
(ops/demod.py:preamble_mask) has MULTIPLE consumers (mask.sum for `n`, the
bit-pack inside compact_positions, and its zero-padding copy), and XLA
re-evaluates the taps per consumer instead of materializing the bool mask.

Variants (all must be bit-identical to v0 on real traffic + noise; the
implementations are the production ones in ops/demod.py, selected by the
front_candidates name in parentheses):
  v0  demod_batch's default front half ("mask")
  v1  single-evaluation ("packed-plain"): pack group bytes as the
      predicate's ONLY consumer, derive n = popcount(bytes), skip the
      zero-pad copy (predicate computed directly over the padded domain,
      masked by position)
  v2  v1 with the bit-pack as a bf16 one-hot-weights MXU matmul
      ("packed-plain-mxu")
  v3  algebraic-reuse predicate ("packed"): shared pairwise compare arrays
      (gt/lt), shared 2-/4-wide running max (mm/mm2) serving the
      s3..s6-vs-s0, s4/s5-vs-high and s11..s14-vs-high terms, shared
      pair-sum q for high; packed like v1
  v4  v3 + the MXU bit-pack ("packed-mxu")

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
# variant front halves: m (uint16[N,S]) -> (n int32[N], pos int32[N,MC]).
# The implementations live in ops/demod.py (front_candidates and friends) —
# this harness only names and times them, so --time drives the exact
# production graphs.
# ---------------------------------------------------------------------------

def _front(name):
    def run(m, sl, mc):
        from dump1090_tpu.ops.demod import front_candidates

        return front_candidates(m, sl, mc, name)

    return run


VARIANTS = {
    "v0": _front("mask"),
    "v1": _front("packed-plain"),
    "v2": _front("packed-plain-mxu"),
    "v3": _front("packed"),
    "v4": _front("packed-mxu"),
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
