"""Candidate-window gather kernel (Pallas TPU).

XLA's gather lowering on TPU issues one serial row-copy per window
(~1.3 us each — measured; width- and alignment-independent), which makes the
16K-window gather the demodulator's bottleneck.  An earlier revision of this
kernel streamed one explicit HBM->VMEM DMA per candidate (16 in flight); at
65K windows/pass the DMA issue rate, not bytes, bound it at ~2.8 ms.

This version exploits that a whole magnitude row is small (131310 samples =
262 KB uint16): the Pallas pipeline stages each row into VMEM ONCE (the
BlockSpec index map depends only on the batch coordinate, so consecutive
grid steps over the same row reuse the resident block), and every window is
then cut out with register loads + in-register rolls — no per-candidate DMA
at all.  HBM traffic drops to one contiguous read of m and one write of the
windows.  Measured: ~0.9 ms for 128x256 windows (1.75x over the DMA kernel).

Mosaic constrains VMEM sublane slices to 8-row alignment, so each candidate
loads an aligned (16, 128) tile covering its 241-sample window; the window is
cut out with a dynamic sublane roll + lane funnel-shift.

A jnp fallback (flat vmapped dynamic_slice) keeps CPU tests exact; interpret
mode validates the kernel itself off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW_PAD = 256   # emitted window width (241 used)
CHUNK = 16         # candidates extracted per grid step
TILE_ROWS = 16     # aligned rows loaded per candidate (16*128 = 2048 samples)
LANES = 128


def _gather_kernel(pos_ref, m_ref, out_ref):
    b = pl.program_id(0)
    c = pl.program_id(1)
    n_mc = pl.num_programs(1)
    base = b * (n_mc * CHUNK) + c * CHUNK

    for k in range(CHUNK):
        p = pos_ref[base + k]
        r8 = (p // LANES) & ~7  # 8-aligned row base, window fits in 16 rows
        r8 = pl.multiple_of(r8, 8)
        t = m_ref[0, pl.ds(r8, TILE_ROWS), :]  # VMEM register load
        off = p - r8 * LANES          # window start within the tile, < 1024+128
        a = off // LANES              # starting row inside the tile (< 9)
        r = off % LANES               # starting lane
        # tpu.dynamic_rotate only handles 32-bit lanes — widen before rolling
        t = t.astype(jnp.int32)              # (16, 128)
        t = pltpu.roll(t, TILE_ROWS - a, 0)  # rows a.. to the top (dyn sublane roll)
        # funnel shift: pair each of the first two rows with its successor,
        # rotate lanes by r, keep the left half — row i then holds the 128
        # consecutive samples starting at window offset 128*i
        paired = jnp.concatenate(
            [t[:2], pltpu.roll(t, TILE_ROWS - 1, 0)[:2]], axis=1
        )                                               # (2, 256)
        shifted = pltpu.roll(paired, 2 * LANES - r, 1)[:, :LANES]  # (2, 128)
        out_ref[0, k] = shifted.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_windows(m_pad: jax.Array, pos: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Gather (B, MC, WINDOW_PAD) uint16 windows from m_pad (B, S_pad).

    m_pad must include the one-sample lead (m[pos-1] at index pos), at least
    WINDOW_PAD + 2048 samples of tail padding beyond the largest pos, and
    S_pad must be a multiple of 1024 (8 rows x 128 lanes)."""
    B, S_pad = m_pad.shape
    assert S_pad % (8 * LANES) == 0, S_pad
    _, MC = pos.shape
    mc_pad = -(-MC // CHUNK) * CHUNK
    if mc_pad != MC:  # grid works in CHUNK units; pad with position 0
        pos = jnp.concatenate(
            [pos, jnp.zeros((B, mc_pad - MC), pos.dtype)], axis=1
        )
    n_rows = S_pad // LANES
    m2d = m_pad.reshape(B, n_rows, LANES)
    grid = (B, mc_pad // CHUNK)
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # whole row resident in VMEM; index map ignores c, so the
                # block is fetched once per row and reused across grid steps
                pl.BlockSpec(
                    (1, n_rows, LANES),
                    lambda b, c, pos_ref: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, CHUNK, 2, LANES),
                lambda b, c, pos_ref: (b, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, mc_pad, 2, LANES), jnp.uint16),
        interpret=interpret,
    )(pos.reshape(-1), m2d)
    return out.reshape(B, mc_pad, WINDOW_PAD)[:, :MC]


def gather_windows_xla(m_pad: jax.Array, pos: jax.Array, width: int = WINDOW_PAD) -> jax.Array:
    """Reference jnp implementation (flat single-level vmapped slice)."""
    B, S_pad = m_pad.shape
    flat = m_pad.reshape(-1)
    gpos = pos + (jnp.arange(B, dtype=jnp.int32) * S_pad)[:, None]
    w = jax.vmap(lambda p: lax.dynamic_slice_in_dim(flat, p, width))(
        gpos.reshape(-1)
    )
    return w.reshape(B, pos.shape[1], width)
