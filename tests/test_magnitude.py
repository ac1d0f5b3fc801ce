"""Magnitude kernel exactness (contract: dump1090.c:346-364, 1452-1469)."""

import numpy as np

from dump1090_tpu.ops.magnitude import magnitude_from_iq, reference_maglut


def test_exhaustive_iq_space():
    """All 65536 possible (I, Q) byte pairs must match the reference LUT."""
    import jax.numpy as jnp

    I, Q = np.meshgrid(np.arange(256, dtype=np.uint8),
                       np.arange(256, dtype=np.uint8), indexing="ij")
    iq = np.stack([I.ravel(), Q.ravel()], axis=1).reshape(-1)
    m = np.asarray(magnitude_from_iq(jnp.asarray(iq)))
    lut = reference_maglut()
    i = np.abs(I.astype(np.int32) - 127).ravel()
    q = np.abs(Q.astype(np.int32) - 127).ravel()
    assert (m == lut[i, q]).all()


def test_maglut_range():
    lut = reference_maglut()
    assert lut[0, 0] == 0
    assert lut[128, 128] == round(np.sqrt(2 * 128 * 128) * 360)
    assert lut.max() == 65167
