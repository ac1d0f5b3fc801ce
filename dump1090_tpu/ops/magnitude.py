"""IQ -> magnitude conversion (TPU kernel).

Behavioral contract: computeMagnitudeVector + maglut, dump1090.c:346-364,
1452-1469: m = round(sqrt(i^2 + q^2) * 360) with i = |I-127|, q = |Q-127|,
values in 0..65167.

TPU-first design: the reference builds a 129x129 uint16 lookup table because
libc sqrt is slow; on TPU a table gather is the slow path and the VPU sqrt is
fast, so we compute an *exact* rounded integer sqrt directly:

    round(sqrt(v) * 360) == round(sqrt(129600 * v))    (360^2 == 129600)

A float32 sqrt gives a candidate within +-1 of floor(sqrt(W)); two integer
Newton-style correction steps pin it exactly, and the final half-up rounding
test is integer (W - c^2 > c).  This is bit-identical to the C double
expression for all 16641 possible (i, q) pairs (proof sketch: 4W is never an
odd perfect square, so sqrt(W) is at least 0.25/(2*sqrt(W)) ~ 2e-6 away from
any .5 boundary, far beyond double rounding error).  No gather, pure VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAG_SCALE_SQ


def magnitude_from_iq(iq: jax.Array) -> jax.Array:
    """uint8 interleaved IQ [2N] (or [..., 2N]) -> int32 magnitudes [N].

    Exact equivalent of the reference maglut path (dump1090.c:1461-1468).
    """
    x = iq.astype(jnp.int32) - 127
    i = jnp.abs(x[..., 0::2])
    q = jnp.abs(x[..., 1::2])
    v = (i * i + q * q).astype(jnp.uint32)
    w = v * jnp.uint32(MAG_SCALE_SQ)  # <= 129600*32768 = 4.25e9, fits uint32
    c = jnp.sqrt(w.astype(jnp.float32)).astype(jnp.uint32)
    # pin c = floor(sqrt(w)) exactly (f32 estimate is within +-1)
    c = jnp.where(c * c > w, c - jnp.uint32(1), c)
    c = jnp.where(c * c > w, c - jnp.uint32(1), c)
    c1 = c + jnp.uint32(1)
    c = jnp.where(c1 * c1 <= w, c1, c)
    c1 = c + jnp.uint32(1)
    c = jnp.where(c1 * c1 <= w, c1, c)
    # round half up: sqrt(w) >= c + 0.5  <=>  w >= c^2 + c + 1
    m = jnp.where(w - c * c > c, c + jnp.uint32(1), c)
    return m.astype(jnp.int32)


def reference_maglut() -> np.ndarray:
    """The reference's 129x129 lookup table, for differential tests
    (dump1090.c:359-364). C round() rounds half away from zero; all values
    here are nonnegative so floor(x+0.5) matches."""
    i = np.arange(129, dtype=np.float64)[:, None]
    q = np.arange(129, dtype=np.float64)[None, :]
    return np.floor(np.sqrt(i * i + q * q) * 360.0 + 0.5).astype(np.uint16)
