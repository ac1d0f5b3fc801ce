"""Multi-host entry points: jax.distributed + a global (dp, sp) mesh.

The compute plane scales past one host exactly like past one chip: the
timeline (sp axis) and the channel batch (dp axis) shard over a global mesh,
halos move with `lax.ppermute` (ICI within a slice, DCN across hosts — XLA
picks the fabric from the mesh layout), and the host-side resolver runs on
whichever process owns each channel row.  The serving plane (io/net.py) is
per-process, like running several reference instances behind one relay
(README.md:162-172 documents the nc-based relay pattern the reference uses).

This module only wires the session up; the sharded program itself is
`parallel.sharding.make_sharded_demod`, which is device-count-agnostic and
is validated on a virtual 8-device mesh in tests and by the driver's
multi-chip dry run (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import os

import numpy as np


def initialize_from_env() -> bool:
    """Initialize jax.distributed when launched as one process per host.

    Reads the standard coordination variables (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID — or their auto-detected platform
    equivalents).  Returns True when a multi-process runtime was started,
    False for single-process runs (no-op)."""
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if not addr or not nproc or int(nproc) <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def global_mesh(dp: int | None = None, sp: int | None = None):
    """Build a (dp, sp) mesh over ALL devices of the (possibly multi-host)
    runtime.  Defaults: dp = 1 row of channels, sp = every device on the
    time axis.  Lay dp across hosts and sp within a host so the per-step
    halo exchange (240 samples) rides ICI and only channel-independent work
    crosses DCN."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = devices.size
    if dp is None and sp is None:
        dp, sp = 1, n
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp}*{sp} != {n} devices")
    return Mesh(devices.reshape(dp, sp), ("dp", "sp"))


def shard_timeline(mag: np.ndarray, mesh) -> "jax.Array":
    """Place a (B, T) magnitude array onto the mesh with (dp, sp) sharding —
    from a single process this is device_put; under multi-host, each process
    contributes its local rows via make_array_from_process_local_data."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp", "sp"))
    if jax.process_count() == 1:
        return jax.device_put(mag, sharding)
    return jax.make_array_from_process_local_data(sharding, mag)
