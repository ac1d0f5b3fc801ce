"""One process of a multi-host dump1090-tpu decode — spawned by
tests/test_multihost.py (and usable standalone for scaling runs).

Usage: python tools/multihost_worker.py <process_id> <num_processes> <port>
           [--devices-per-proc N] [--sp N] [--dp N] [--bench]

Each process hosts N virtual CPU devices (xla_force_host_platform_device
count), joins a jax.distributed cluster via the coordinator on
localhost:<port>, contributes its local slice of the magnitude timeline with
make_array_from_process_local_data, and runs the time-sharded demodulation
(parallel/sharding.py) over the GLOBAL (dp, sp) mesh — halos cross the
process boundary through the same lax.ppermute that crosses chips.

Process 0 verifies the globally-gathered candidates against an unsharded
local scan of the same timeline and prints `MULTIHOST PASS ...`; with
--bench every process times the sharded step and process 0 prints
`MULTIHOST BENCH <seconds per step>`.
"""

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("process_id", type=int)
    ap.add_argument("num_processes", type=int)
    ap.add_argument("port")
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--sp", type=int, default=None)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--total", type=int, default=131072)
    args = ap.parse_args()

    # environment must be fixed BEFORE jax imports anywhere
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_proc}"
    )
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{args.port}"
    os.environ["JAX_NUM_PROCESSES"] = str(args.num_processes)
    os.environ["JAX_PROCESS_ID"] = str(args.process_id)

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(REPO))

    from dump1090_tpu.parallel import multihost

    if args.num_processes > 1:
        assert multihost.initialize_from_env() is True, "distributed init failed"
    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = args.num_processes * args.devices_per_proc
    assert jax.device_count() == n_global, jax.device_count()

    import numpy as np

    from dump1090_tpu.io.sources import iq_buffers
    from dump1090_tpu.ops.magnitude import magnitude_from_iq
    from dump1090_tpu.parallel.sharding import (
        make_sharded_demod,
        merge_sharded_candidates,
    )

    sp = args.sp or (n_global // args.dp)
    mesh = multihost.global_mesh(dp=args.dp, sp=sp)

    # deterministic shared input: the first reference buffer of modes1.bin
    # (all processes read the same file; each contributes only its slice)
    fixture = Path(
        os.environ.get("DUMP1090_FIXTURE",
                       "/root/reference/testfiles/modes1.bin")
    )
    if fixture.exists():
        with open(fixture, "rb") as f:
            buf = next(iq_buffers(f))
        import jax.numpy as jnp

        m_full = np.asarray(
            magnitude_from_iq(jnp.asarray(buf)), dtype=np.int32
        )
    else:
        rng = np.random.default_rng(0)
        m_full = rng.integers(0, 60000, 131310, dtype=np.int32)

    shard = args.total // sp
    total = sp * shard
    base = np.tile(m_full, 1 + total // len(m_full))[:total]
    m = np.tile(base[None, :], (args.dp, 1))

    if args.dp == 1:
        # the sp axis is laid out across the global device list, so process
        # p owns contiguous time columns: contribute exactly its slice via
        # make_array_from_process_local_data (the multi-host input path)
        per_proc_cols = total // args.num_processes
        lo = args.process_id * per_proc_cols
        local = np.ascontiguousarray(m[:, lo : lo + per_proc_cols])
        x = multihost.shard_timeline(local, mesh)
    else:
        # dp > 1 splits processes across ROWS (or mixed layouts); every
        # process has the full input here, so let each device pull its own
        # global slice — layout-agnostic
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("dp", "sp"))
        x = jax.make_array_from_callback(m.shape, sharding, lambda idx: m[idx])

    fn = make_sharded_demod(mesh, shard_samples=shard, max_candidates=128)
    cand = fn(x)

    from jax.experimental import multihost_utils

    cand_host = multihost_utils.process_allgather(cand, tiled=True)

    ok = True
    if args.process_id == 0:
        from dump1090_tpu.ops.demod import Candidates, demod_block

        n, merged = merge_sharded_candidates(
            Candidates(*[np.asarray(f) for f in cand_host]), scan_total=total
        )
        import jax.numpy as jnp

        ext = np.concatenate([m[0], np.zeros(240, np.int32)])
        ref = jax.device_get(demod_block(
            jnp.asarray(ext), scan_len=total, max_candidates=1024
        ))
        nref = int(ref.n)
        ok = (
            n == nref
            and list(merged.pos) == list(np.asarray(ref.pos)[:nref])
            and np.array_equal(merged.msg1, np.asarray(ref.msg1)[:nref])
            and np.array_equal(merged.msg2, np.asarray(ref.msg2)[:nref])
        )
        print(f"MULTIHOST {'PASS' if ok else 'FAIL'}: "
              f"{args.num_processes} processes x {args.devices_per_proc} "
              f"devices, mesh dp={args.dp} sp={sp}, {n} candidates "
              f"== unsharded {nref}", flush=True)

    if args.bench:
        # time the sharded step: all processes participate (the collective
        # inside fn synchronizes them)
        r = fn(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            r = fn(x)
            jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / args.steps
        if args.process_id == 0:
            print(f"MULTIHOST BENCH {dt:.6f} s/step total={total} "
                  f"sp={sp} nproc={args.num_processes}", flush=True)

    jax.distributed.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
