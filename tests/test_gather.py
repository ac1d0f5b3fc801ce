"""Pallas window-gather kernel logic, validated off-TPU in interpret mode.

The default CPU suite otherwise only runs the jnp fallback
(gather_windows_xla); interpret mode executes the kernel body itself —
the roll/funnel-shift extraction, the 8-row alignment math, the resident-
block reuse, and the CHUNK padding — so kernel regressions surface without
a chip."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from dump1090_tpu.ops.gather import (
    CHUNK,
    WINDOW_PAD,
    gather_windows,
    gather_windows_xla,
)


@pytest.mark.parametrize("mc", [CHUNK, 64, 24])  # incl. non-CHUNK-multiple
def test_gather_kernel_interpret_matches_xla(mc):
    rng = np.random.default_rng(0)
    B, s_pad = 3, 8 * 1024
    m_pad = rng.integers(0, 65168, (B, s_pad), dtype=np.uint16)
    max_pos = s_pad - WINDOW_PAD - 2048
    pos = np.sort(rng.integers(0, max_pos, (B, mc)), axis=1).astype(np.int32)

    got = np.asarray(gather_windows(jnp.asarray(m_pad), jnp.asarray(pos), interpret=True))
    want = np.asarray(gather_windows_xla(jnp.asarray(m_pad), jnp.asarray(pos)))
    assert got.shape == (B, mc, WINDOW_PAD)
    assert (got == want).all()


def test_gather_kernel_edge_positions():
    """Window starts at 0, at lane boundaries, at 8-row-alignment edges, and
    at the maximum allowed position."""
    rng = np.random.default_rng(1)
    B, s_pad = 1, 8 * 1024
    m_pad = rng.integers(0, 65168, (B, s_pad), dtype=np.uint16)
    max_pos = s_pad - WINDOW_PAD - 2048
    edges = [0, 1, 127, 128, 129, 1023, 1024, 1025, 2047, 2048, max_pos - 1]
    pos = np.sort(np.array(edges + [5] * (CHUNK - len(edges) % CHUNK)))[None]
    pos = pos.astype(np.int32)

    got = np.asarray(gather_windows(jnp.asarray(m_pad), jnp.asarray(pos), interpret=True))
    for k, p in enumerate(pos[0]):
        assert (got[0, k] == m_pad[0, p : p + WINDOW_PAD]).all(), p
