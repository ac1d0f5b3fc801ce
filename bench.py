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
MC = 256        # max preamble candidates per buffer (dense-air shape)
MOS = 8192      # max emitted short frames per batch (9-byte rows)
MOL = 10240     # max emitted long frames per batch (14-byte rows)


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
        demod_resolve_batch,
        demod_resolve_group,
        interleave_packed,
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
        same function DemodPipeline dispatches): G batches resolved in ONE
        Pallas kernel pass, one fetch."""
        out = demod_resolve_group(
            x, ca, ct, 1_700_000_000, True, False,
            scan_len=scan_len, max_candidates=MC,
            max_out_short=MOS, max_out_long=MOL,
            crcok_only=True, packed=True,
        )
        return out[:6], out[-2], out[-1]

    ca = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))
    ct = jax.device_put(jnp.zeros(ICAO_CACHE_LEN, jnp.int32))

    t0 = time.perf_counter()
    outs, ca, ct = run_group(groups[0], ca, ct)
    _ = jax.device_get(outs[1])
    log(f"compile+first group: {time.perf_counter()-t0:.1f}s")

    # ---- steady state: dispatch g+1, fetch g, format on a worker thread ----
    from concurrent.futures import ThreadPoolExecutor

    def fetch(outs):
        n, count, clong, shorts, longs, stats = jax.device_get(list(outs))
        assert int(n.max()) <= MC, "candidate overflow"
        assert int((count - clong).max()) <= MOS, "short-frame overflow"
        assert int(clong.max()) <= MOL, "long-frame overflow"
        return count, clong, shorts, longs

    def format_group(fetched) -> tuple[int, bytes]:
        count, clong, shorts, longs = fetched
        total, out = 0, []
        for k in range(G):
            msg, bits = interleave_packed(
                count[k], clong[k], shorts[k], longs[k]
            )
            total += msg.shape[0]
            out.append(raw_lines_from_fields(
                msg, bits, np.ones(msg.shape[0], dtype=bool)))
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
            n, count, clong, shorts, longs, stats, ca, ct = demod_resolve_batch(
                perturb(x, i), ca, ct, 1_700_000_000, True, False,
                scan_len=scan_len, max_candidates=MC,
                max_out_short=MOS, max_out_long=MOL,
                crcok_only=True, packed=True,
            )
            acc = (acc + count.astype(jnp.float32)
                   + clong.astype(jnp.float32)
                   + n.sum().astype(jnp.float32)
                   + shorts.astype(jnp.int32).sum().astype(jnp.float32)
                   + longs.astype(jnp.int32).sum().astype(jnp.float32)
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

    # ---- sparse air: resolve tax must be density-proportional --------------
    # Realistic quiet-air density (~3 frames per 65 ms buffer vs modes1's
    # ~209 candidates); the adapted sparse shape is mc=64 (the pipeline's
    # density adaptation reaches it after 3 quiet groups).
    from dump1090_tpu.utils.synth import frame_to_iq, make_df17_frame

    rng = np.random.default_rng(5)
    sparse = np.full((NB, x.shape[1]), 127, dtype=np.uint8)
    for b in range(NB):
        at = 600
        for k in range(3):
            iq = frame_to_iq(
                make_df17_frame(0x100000 + 64 * b + k), amplitude=80,
                noise_sigma=2.0, phase=float(rng.uniform(0, 6.28)), rng=rng,
            )
            sparse[b, at : at + len(iq)] = iq
            at += len(iq) + 70000
    xs = jax.device_put(jnp.asarray(sparse))
    MCS = 64

    @functools.partial(jax.jit, static_argnames=("L",))
    def sparse_demod(x, L):
        def body(i, acc):
            cand = demod_batch(perturb(x, i), scan_len=scan_len,
                               max_candidates=MCS)
            return acc + sum(
                f.astype(jnp.int32).sum().astype(jnp.float32) for f in cand
            )
        return lax.fori_loop(0, L, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnames=("L",))
    def sparse_fused(x, ca, ct, L):
        def body(i, carry):
            ca, ct, acc = carry
            n, count, clong, shorts, longs, stats, ca, ct = demod_resolve_batch(
                perturb(x, i), ca, ct, 1_700_000_000, True, False,
                scan_len=scan_len, max_candidates=MCS,
                max_out_short=2048, max_out_long=2048,
                crcok_only=True, packed=True,
            )
            acc = (acc + count.astype(jnp.float32)
                   + n.sum().astype(jnp.float32)
                   + shorts.astype(jnp.int32).sum().astype(jnp.float32)
                   + longs.astype(jnp.int32).sum().astype(jnp.float32)
                   + stats.sum().astype(jnp.float32))
            return ca, ct, acc
        return lax.fori_loop(0, L, body, (ca, ct, jnp.float32(0)))

    L = 32
    _ = float(jax.device_get(sparse_demod(xs, L)))
    t_d = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(jax.device_get(sparse_demod(xs, L)))
        t_d = min(t_d, (time.perf_counter() - t0) / L)
    _ = float(jax.device_get(sparse_fused(xs, ca, ct, L)[2]))
    t_f = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(jax.device_get(sparse_fused(xs, ca, ct, L)[2]))
        t_f = min(t_f, (time.perf_counter() - t0) / L)
    log(f"sparse air (3 msgs/buffer, mc={MCS}): demod {t_d*1e3:.2f} ms, "
        f"demod+resolve {t_f*1e3:.2f} ms -> resolve tax {(t_f-t_d)*1e3:.2f} ms"
        f"/batch ({new_per_batch/t_f/1e6:.0f} Msamples/s e2e)")

    # ---- cold-file CLI end-to-end (disk -> raw lines, nothing resident) ----
    # Run the product CLI in a fresh process twice: the first warms the
    # persistent XLA cache for the CLI's own shapes, the second's stderr
    # meter is the cold-file number (includes file read, preload upload,
    # cache-hit program load, decode, formatting).
    import subprocess
    import tempfile

    if FIXTURE.exists():
        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as tf:
            for _ in range(60):
                tf.write(raw.tobytes())
            cold_path = tf.name
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env.setdefault(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/dump1090_tpu/jax"),
        )
        for t_run in range(2):
            r = subprocess.run(
                [sys.executable, "-m", "dump1090_tpu", "--ifile", cold_path,
                 "--stats"],
                capture_output=True, text=True, timeout=1200, env=env,
                cwd=str(Path(__file__).resolve().parent),
            )
        os.unlink(cold_path)
        meter = [ln for ln in r.stderr.splitlines() if ln.startswith("#")]
        log(f"cold-file CLI (43 MB from disk, warmed code cache): "
            f"{meter[-1] if meter else r.stderr[-200:]}")

    print(json.dumps({
        "metric": "sustained_e2e",
        "value": round(sustained / 1e6, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sustained / CPU_BASELINE_SAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
