"""Benchmark: TPU demodulation throughput vs the reference CPU decoder.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Extra detail goes to stderr.

Baseline (BASELINE.md): the reference C decoder sustains ~72-88 Msamples/s on
one Xeon core over 60x-concatenated modes1.bin (hot loop dump1090.c:1593-1726
+ computeMagnitudeVector).  vs_baseline is measured against the best CPU
figure (88 Msamples/s).

Measurement protocol: the demodulation of a resident batch of reference-
geometry IQ buffers is looped L times *inside one jitted program* (inputs
perturbed per iteration so no pass can be cached), and the wall time of the
single dispatch is divided by L.  This defeats two artifacts of tunneled TPU
runtimes: block_until_ready returning early, and per-dispatch relay latency.
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

CPU_BASELINE_SAMPLES_PER_S = 88e6
FIXTURE = Path("/root/reference/testfiles/modes1.bin")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dump1090_tpu.constants import BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES
    from dump1090_tpu.parallel.sharding import demod_batch, overlapping_buffers

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    if FIXTURE.exists():
        raw = np.fromfile(FIXTURE, dtype=np.uint8)
    else:  # synthetic fallback: silence
        raw = np.full(4 * BLOCK_SAMPLES * 2, 127, dtype=np.uint8)

    n_target = 128  # amortizes the runtime's ~1.8 ms fixed per-step overhead
    reps = max(1, int(np.ceil(n_target * BLOCK_SAMPLES * 2 / len(raw))))
    stream = np.concatenate([np.full(476, 127, np.uint8)] + [raw] * reps)
    bufs = np.asarray(overlapping_buffers(stream))[:n_target]
    n_buf = bufs.shape[0]
    new_samples = n_buf * BLOCK_SAMPLES
    print(f"batch: {n_buf} buffers x {BUF_SAMPLES} samples "
          f"({new_samples/1e6:.1f} M samples/pass)", file=sys.stderr)

    x = jax.device_put(jnp.asarray(bufs))
    MC = 256  # the product default (PipelineConfig.max_candidates)

    def perturb(x, i):
        # vary the input each iteration so XLA cannot hoist the pass out of
        # the loop.  NOTE: a uint8 `x + i` costs ~1.2 ms by itself (sub-byte
        # VPU ops unpack per element); an int32 add over a bitcast view of
        # the same bytes is ~10x cheaper and perturbs just as well.
        w = lax.bitcast_convert_type(x.reshape(x.shape[0], -1, 4), jnp.int32)
        return lax.bitcast_convert_type(w + i, jnp.uint8).reshape(x.shape)

    @functools.partial(jax.jit, static_argnames=("L",))
    def looped(x, L):
        def body(i, acc):
            cand = demod_batch(
                perturb(x, i),
                scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
                max_candidates=MC,
            )
            # consume EVERY output field: anything not reduced here would be
            # dead-code-eliminated (the phase-corrected pass in particular)
            return (
                acc
                + cand.n.sum().astype(jnp.float32)
                + cand.pos.sum().astype(jnp.float32)
                + cand.msg1.astype(jnp.int32).sum().astype(jnp.float32)
                + cand.errors1.sum().astype(jnp.float32)
                + cand.gate1.sum().astype(jnp.float32)
                + cand.msg2.astype(jnp.int32).sum().astype(jnp.float32)
                + cand.errors2.sum().astype(jnp.float32)
                + cand.gate2.sum().astype(jnp.float32)
            )
        return lax.fori_loop(0, L, body, jnp.float32(0))

    t0 = time.perf_counter()
    _ = float(jax.device_get(looped(x, 1)))
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # L amortizes the tunneled runtime's fixed dispatch+fetch cost (~35 ms)
    L = 128
    _ = float(jax.device_get(looped(x, L)))  # compile the L version
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jax.device_get(looped(x, L)))
        best = min(best, (time.perf_counter() - t0) / L)
    sps = new_samples / best
    print(f"device demod: {best*1e3:.2f} ms/pass -> {sps/1e6:.0f} Msamples/s "
          f"({sps/2e6:.0f}x realtime @2 Msps)", file=sys.stderr)

    # host resolve cost (O(candidates)) for context — native C++ runtime,
    # falling back to the pure-Python resolver if g++ is unavailable
    from dump1090_tpu.models.decoder import DecoderConfig, DecoderStats, IcaoCache
    from dump1090_tpu.models.resolver import BlockCandidates, resolve_block

    try:
        from dump1090_tpu.native import NativeResolver

        native = NativeResolver()
        resolver_name = "native C++"
    except Exception:
        native = None
        resolver_name = "pure Python"

    cand = jax.device_get(demod_batch(
        x, scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES, max_candidates=MC))
    t0 = time.perf_counter()
    cache, cfg, stats = IcaoCache(), DecoderConfig(), DecoderStats()
    msgs = []
    for b in range(n_buf):
        one = type(cand)(*[f[b] for f in cand])
        host = BlockCandidates.from_device(one)
        if native is not None:
            native.resolve_block(host, cache, cfg, stats, msgs.append)
        else:
            resolve_block(host, cache, cfg, stats, msgs.append)
    t_resolve = time.perf_counter() - t0
    n_good = sum(1 for m in msgs if m.crcok)
    e2e = new_samples / (best + t_resolve)
    print(f"host resolve ({resolver_name}): {t_resolve*1e3:.0f} ms / {n_buf} "
          f"buffers, {n_good} messages; effective end-to-end {e2e/1e6:.0f} "
          f"Msamples/s (resolve overlaps device work in streaming mode)",
          file=sys.stderr)

    if native is not None:
        # bulk record path (the CLI's pure --raw mode): the whole batch in
        # ONE native call, hex lines formatted vectorially
        from dump1090_tpu.native import records_to_raw_lines

        cache2, stats2 = IcaoCache(), DecoderStats()
        host = list(cand)
        t0 = time.perf_counter()
        records, counts = native.resolve_blocks_records(
            host[1:], np.asarray(host[0]), cache2, cfg, stats2)
        nbytes = len(records_to_raw_lines(records))
        t_bulk = time.perf_counter() - t0
        e2e_bulk = new_samples / (best + t_bulk)
        print(f"bulk raw path: {t_bulk*1e3:.0f} ms / {n_buf} buffers "
              f"({nbytes} output bytes); end-to-end {e2e_bulk/1e6:.0f} "
              f"Msamples/s", file=sys.stderr)

    print(json.dumps({
        "metric": "demod_throughput",
        "value": round(sps / 1e6, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sps / CPU_BASELINE_SAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
