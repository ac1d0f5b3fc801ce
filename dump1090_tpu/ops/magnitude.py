"""IQ -> magnitude conversion (TPU kernel).

Behavioral contract: computeMagnitudeVector + maglut, dump1090.c:346-364,
1452-1469: m = round(sqrt(i^2 + q^2) * 360) with i = |I-127|, q = |Q-127|,
values in 0..65167.

TPU-first design: the reference builds a 129x129 uint16 lookup table because
libc sqrt is slow; on TPU a table gather is the slow path and the VPU sqrt is
fast, so we compute an *exact* rounded integer sqrt directly:

    round(sqrt(v) * 360) == round(sqrt(129600 * v))    (360^2 == 129600)

A float32 sqrt gives a candidate within +-1 of R = round(sqrt(W)); a single
integer test d = W - c^2 against +-c then pins R exactly (R is the unique
integer with R^2 - R < W <= R^2 + R).  This is bit-identical to the C double
expression for all 16641 possible (i, q) pairs (proof sketch: 4W is never an
odd perfect square, so sqrt(W) is at least 0.25/(2*sqrt(W)) ~ 2e-6 away from
any .5 boundary, far beyond double rounding error; exhaustively verified in
tests/test_magnitude.py).  No gather, one integer multiply, pure VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAG_SCALE_SQ


def magnitude_from_iq(iq: jax.Array, out_dtype=jnp.int32) -> jax.Array:
    """uint8 interleaved IQ [2N] (or [..., 2N]) -> magnitudes [N].

    Exact equivalent of the reference maglut path (dump1090.c:1461-1468).
    Values are <= 65167, so out_dtype=jnp.uint16 is lossless and halves the
    HBM write traffic on the hot path.
    """
    # Deinterleave via a uint16 bitcast instead of stride-2 uint8 slices:
    # strided sub-byte loads cost lane shuffles on the VPU (~4x measured on
    # this whole function); one contiguous uint16 load + shift/mask does not.
    # Little-endian: pair k = I | (Q << 8).
    pairs = jax.lax.bitcast_convert_type(
        iq.reshape(*iq.shape[:-1], -1, 2), jnp.uint16
    )
    return magnitude_from_pairs(pairs, out_dtype=out_dtype)


def magnitude_from_pairs(pairs: jax.Array, out_dtype=jnp.int32) -> jax.Array:
    """uint16 IQ pairs [..., N] (little-endian I | Q<<8) -> magnitudes.

    Same computation as magnitude_from_iq after the deinterleave, exposed
    separately because the bitcast above is only free when XLA keeps the
    sample axis minor; when the group program picks a buffers-minor layout
    it decomposes into convert+reshape+combine at T(2,128) tiling (~0.96
    ms/batch measured, docs/DESIGN.md).  Uploading the raw bytes as a host
    numpy uint16 VIEW (zero-copy, same wire bytes) and entering here makes
    the whole chain elementwise — no reshape for XLA to mis-lay-out.
    """
    pairs = pairs.astype(jnp.int32)
    i = jnp.abs((pairs & 0xFF) - 127)
    q = jnp.abs((pairs >> 8) - 127)
    v = i * i + q * q                 # <= 32768
    # All arithmetic stays int32/f32: unsigned multiplies and uint32->f32
    # conversions lower ~12x slower on the VPU (measured).  W = 129600*v can
    # exceed int32 range, but both W and c*c below wrap identically mod 2^32,
    # so their difference is exact.
    #
    # f32 sqrt gives a candidate c within +-1 of R = round(sqrt(W)) (v is
    # f32-exact, the product and sqrt carry ~2^-24 relative error each, so
    # |c_f - sqrt(W)| < 0.01).  R is the unique integer with
    # R^2 - R < W <= R^2 + R, so with d = W - c^2:
    #   d >  c  =>  W > c^2 + c  =>  R = c + 1
    #   d <= -c =>  W <= c^2 - c =>  R = c - 1  (guard c > 0: W = 0 stays 0)
    #   else        R = c
    c = (jnp.sqrt(v.astype(jnp.float32) * float(MAG_SCALE_SQ)) + 0.5).astype(
        jnp.int32
    )
    d = v * MAG_SCALE_SQ - c * c      # wraps mod 2^32 on both sides; |d| small
    m = c + (d > c).astype(jnp.int32) - ((c > 0) & (d <= -c)).astype(jnp.int32)
    return m.astype(out_dtype)


def reference_maglut() -> np.ndarray:
    """The reference's 129x129 lookup table, for differential tests
    (dump1090.c:359-364). C round() rounds half away from zero; all values
    here are nonnegative so floor(x+0.5) matches."""
    i = np.arange(129, dtype=np.float64)[:, None]
    q = np.arange(129, dtype=np.float64)[None, :]
    return np.floor(np.sqrt(i * i + q * q) * 360.0 + 0.5).astype(np.uint16)
