"""Benchmark: sustained end-to-end decode throughput vs the reference CPU.

Prints ONE JSON line to stdout:
  {"metric": "sustained_e2e", "value": N, "unit": "Msamples/s/chip", "vs_baseline": N}
Component detail goes to stderr.

Baseline (BASELINE.md): the reference C decoder sustains ~72-88 Msamples/s on
one Xeon core over 60x-concatenated modes1.bin (hot loop dump1090.c:1593-1726
+ computeMagnitudeVector).  vs_baseline is against the best CPU figure
(88 Msamples/s).

What `sustained_e2e` measures
-----------------------------
The steady-state rate of the PRODUCT decode path (the CLI's
--raw --tpu-device-resolve pipeline, models/pipeline.py stream_raw_device):

  uint8 IQ buffers -> magnitude -> preamble scan -> both demod passes ->
  on-device sequential resolve (CRC/fix/ICAO-cache/skip semantics,
  ops/resolve.py) -> emitted messages fetched to the host -> `*<hex>;`
  raw byte stream materialized on the host,

with device compute, device->host transfers, and host formatting genuinely
overlapped (group g+1 is dispatched before group g is fetched), the ICAO
cache chained on-device across every batch, and EVERY emitted message
fetched + formatted.  Wall time is measured across the whole steady-state
run — nothing is amortized away except program compilation.

Input IQ is resident on the device (uploaded once, W distinct chunks cycled
round-robin).  Host->device ingest is a property of this harness's tunneled
runtime (~1.5 GB/s blocking; a production PCIe host moves >10 GB/s), so it
is measured and reported separately on stderr rather than serialized into
the headline number.  The strict ingest-bound ceiling (2 bytes/sample over
the measured H2D rate) is printed alongside.

Measurement pitfalls this protocol avoids (see CLAUDE.md): per-dispatch
relay latency (~35 ms) is overlapped, not amortized into a fake number;
block_until_ready returns early on tunneled runtimes (we always fetch real
results); jnp.zeros inputs constant-fold (we use real modes1.bin traffic,
the densest known fixture).
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

NB = 128        # reference-geometry buffers per batch (16.8 M samples)
G = 12          # batches chained per dispatch group (one fetch per group)
W = 2           # distinct resident input groups, cycled
T = 8           # steady-state groups timed
MC = 256        # max preamble candidates per buffer (product default)
MO = 16384      # max emitted messages per batch


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp
    from jax import lax

    # persistent XLA compilation cache: the fused program compiles once per
    # machine, not once per bench run (first-ever compile is 1-4 min)
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        try:
            cache = os.path.expanduser("~/.cache/dump1090_tpu/jax")
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except OSError:
            pass

    from dump1090_tpu.constants import (
        BLOCK_SAMPLES,
        BUF_SAMPLES,
        FULL_LEN_SAMPLES,
        ICAO_CACHE_LEN,
    )
    from dump1090_tpu.native import raw_lines_from_fields
    from dump1090_tpu.ops.resolve import (
        META_LONG,
        demod_resolve_batch,
        demod_resolve_group,
    )
    from dump1090_tpu.parallel.sharding import demod_batch, overlapping_buffers

    dev = jax.devices()[0]
    log(f"device: {dev}")

    if FIXTURE.exists():
        raw = np.fromfile(FIXTURE, dtype=np.uint8)
    else:  # synthetic fallback: silence
        raw = np.full(4 * BLOCK_SAMPLES * 2, 127, dtype=np.uint8)

    # W*G distinct batches: slide a window over the repeated capture so every
    # batch decodes a different message mix
    n_bufs_total = W * G * NB
    reps = int(np.ceil((n_bufs_total + W * G) * BLOCK_SAMPLES * 2 / len(raw)))
    stream = np.concatenate([np.full(476, 127, np.uint8)] + [raw] * reps)
    bufs = np.asarray(overlapping_buffers(stream))
    groups_np = [
        np.stack([
            bufs[(g * G + k) * NB : (g * G + k) * NB + NB]
            for k in range(G)
        ])
        for g in range(W)
    ]

    t0 = time.perf_counter()
    groups = [jax.device_put(jnp.asarray(x)) for x in groups_np]
    for x in groups:
        x.block_until_ready()
    t_h2d = time.perf_counter() - t0
    bytes_in = sum(x.nbytes for x in groups_np)
    h2d_rate = bytes_in / t_h2d
    log(f"ingest: {bytes_in/1e6:.0f} MB uploaded in {t_h2d*1e3:.0f} ms "
        f"({h2d_rate/1e9:.2f} GB/s; tunneled runtime — PCIe hosts do >10)")

    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES
    new_per_batch = NB * BLOCK_SAMPLES
    new_per_group = G * new_per_batch

    def run_group(x, ca, ct):
        """The PRODUCT group program (ops.resolve.demod_resolve_group, the
        same function DemodPipeline dispatches): G chained batches, one
        fetch."""
        out = demod_resolve_group(
            x, ca, ct, 1_700_000_000, True, False,
            scan_len=scan_len, max_candidates=MC, max_out=MO,
            crcok_only=True, packed=True,
        )
        return out[:4], out[-2], out[-1]

    ca = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))
    ct = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))

    t0 = time.perf_counter()
    outs, ca, ct = run_group(groups[0], ca, ct)
    _ = jax.device_get(outs[1])
    log(f"compile+first group: {time.perf_counter()-t0:.1f}s")

    # ---- steady state: dispatch g+1, fetch g, format on a worker thread ----
    from concurrent.futures import ThreadPoolExecutor

    def fetch(outs):
        n, count, merged, stats = jax.device_get(list(outs))
        assert int(n.max()) <= MC and int(count.max()) <= MO, "overflow"
        return count, merged

    def format_group(fetched) -> tuple[int, bytes]:
        count, merged = fetched
        total, out = 0, []
        for k in range(G):
            c = int(count[k])
            total += c
            bits = np.where(merged[k, :c, 14] & META_LONG, 112, 56)
            out.append(raw_lines_from_fields(
                merged[k, :c, :14], bits, np.ones(c, dtype=bool)))
        return total, b"".join(out)

    pending = None
    futures = []
    n_msgs = 0
    out_bytes = 0
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=1) as pool:
        for t in range(T):
            outs, ca, ct = run_group(groups[t % W], ca, ct)
            if pending is not None:
                futures.append(pool.submit(format_group, fetch(pending)))
            pending = outs
        futures.append(pool.submit(format_group, fetch(pending)))
        for f in futures:
            c, b = f.result()
            n_msgs += c
            out_bytes += len(b)
    wall = time.perf_counter() - t0
    sustained = T * new_per_group / wall
    log(f"sustained: {T} groups x {new_per_group/1e6:.1f} M samples in "
        f"{wall*1e3:.0f} ms -> {sustained/1e6:.0f} Msamples/s "
        f"({sustained/2e6:.0f}x realtime @2 Msps); {n_msgs} messages, "
        f"{out_bytes} raw bytes")
    ingest_bound = h2d_rate / 2
    log(f"ingest-bound ceiling through this tunnel: {ingest_bound/1e6:.0f} "
        f"Msamples/s (2 B/sample over measured H2D)")

    # ---- component rates (stderr detail) -----------------------------------
    x = groups[0][0]

    def perturb(x, i):
        w = lax.bitcast_convert_type(x.reshape(x.shape[0], -1, 4), jnp.int32)
        return lax.bitcast_convert_type(w + i, jnp.uint8).reshape(x.shape)

    @functools.partial(jax.jit, static_argnames=("L",))
    def demod_only(x, L):
        def body(i, acc):
            cand = demod_batch(perturb(x, i), scan_len=scan_len,
                               max_candidates=MC)
            return acc + sum(
                f.astype(jnp.int32).sum().astype(jnp.float32) for f in cand
            )
        return lax.fori_loop(0, L, body, jnp.float32(0))

    L = 64
    _ = float(jax.device_get(demod_only(x, L)))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(jax.device_get(demod_only(x, L)))
        best = min(best, (time.perf_counter() - t0) / L)
    log(f"device demod only: {best*1e3:.2f} ms/batch -> "
        f"{new_per_batch/best/1e6:.0f} Msamples/s")

    @functools.partial(jax.jit, static_argnames=("L",))
    def fused(x, ca, ct, L):
        def body(i, carry):
            ca, ct, acc = carry
            n, count, merged, stats, ca, ct = demod_resolve_batch(
                perturb(x, i), ca, ct, 1_700_000_000, True, False,
                scan_len=scan_len, max_candidates=MC, max_out=MO,
                crcok_only=True, packed=True,
            )
            acc = (acc + count.astype(jnp.float32)
                   + n.sum().astype(jnp.float32)
                   + merged.astype(jnp.int32).sum().astype(jnp.float32)
                   + stats.sum().astype(jnp.float32))
            return ca, ct, acc
        return lax.fori_loop(0, L, body, (ca, ct, jnp.float32(0)))

    L = 16
    _ = float(jax.device_get(fused(x, ca, ct, L)[2]))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(jax.device_get(fused(x, ca, ct, L)[2]))
        best = min(best, (time.perf_counter() - t0) / L)
    log(f"device demod+resolve: {best*1e3:.2f} ms/batch -> "
        f"{new_per_batch/best/1e6:.0f} Msamples/s")

    print(json.dumps({
        "metric": "sustained_e2e",
        "value": round(sustained / 1e6, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sustained / CPU_BASELINE_SAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
