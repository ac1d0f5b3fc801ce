"""Synthetic Mode S IQ generation: frame -> CRC -> PPM -> 2 Msps IQ.

The reference has no test-signal generator (SURVEY §4); this module is the
framework's generative test backbone: encode known frames into uint8 IQ at a
chosen amplitude / noise level / carrier phase, feed them through the full
demodulation pipeline, and assert on what comes back.  Also drives the
decode-rate-vs-SNR benchmark curve.

Waveform model (Mode S downlink, 1090 MHz PPM at 1 Mbit/s, sampled 2 Msps):
  preamble: pulses in sample slots 0, 2, 7, 9 of 16 (dump1090.c:1569-1588)
  data bit 1: (pulse, silence); bit 0: (silence, pulse) — 2 samples/bit
"""

from __future__ import annotations

import numpy as np

from ..constants import LONG_MSG_BITS, SHORT_MSG_BITS
from ..ops import crc as crc_ops

PREAMBLE_PATTERN = np.array(
    [1, 0, 1, 0, 0, 0, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0], dtype=np.float64
)


def make_df17_frame(
    addr: int,
    metype: int = 11,
    mesub: int = 0,
    me_payload: bytes = b"\x00\x00\x00\x00\x00\x00",
    ca: int = 5,
) -> bytes:
    """Assemble a 112-bit DF17 frame with a valid CRC."""
    msg = bytearray(14)
    msg[0] = (17 << 3) | (ca & 7)
    msg[1] = (addr >> 16) & 0xFF
    msg[2] = (addr >> 8) & 0xFF
    msg[3] = addr & 0xFF
    msg[4] = ((metype & 31) << 3) | (mesub & 7)
    msg[5:11] = me_payload[:6].ljust(6, b"\x00")
    c = crc_ops.compute_crc(np.frombuffer(bytes(msg), np.uint8), LONG_MSG_BITS)
    msg[11], msg[12], msg[13] = (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF
    return bytes(msg)


def envelope(frame: bytes) -> np.ndarray:
    """Unit-amplitude PPM envelope of preamble + frame, 2 samples/us."""
    bits = np.unpackbits(np.frombuffer(frame, np.uint8))
    cells = np.zeros((len(bits), 2), dtype=np.float64)
    cells[bits == 1, 0] = 1.0
    cells[bits == 0, 1] = 1.0
    return np.concatenate([PREAMBLE_PATTERN, cells.reshape(-1)])


def frame_to_iq(
    frame: bytes,
    *,
    amplitude: float = 80.0,
    noise_sigma: float = 0.0,
    phase: float = 0.3,
    pad_before: int = 200,
    pad_after: int = 400,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Modulate one frame into interleaved uint8 IQ centered at 127.

    amplitude: pulse magnitude in ADC counts (<= ~127).
    noise_sigma: AWGN added independently to I and Q.
    phase: carrier phase in radians (splits energy between I and Q).
    """
    rng = rng or np.random.default_rng(0)
    env = envelope(frame)
    env = np.concatenate([np.zeros(pad_before), env, np.zeros(pad_after)])
    i = amplitude * np.cos(phase) * env
    q = amplitude * np.sin(phase) * env
    if noise_sigma > 0:
        i = i + rng.normal(0, noise_sigma, env.shape)
        q = q + rng.normal(0, noise_sigma, env.shape)
    iq = np.empty(2 * env.shape[0], dtype=np.float64)
    iq[0::2] = i
    iq[1::2] = q
    return np.clip(np.round(iq) + 127, 0, 255).astype(np.uint8)


def snr_db(amplitude: float, noise_sigma: float) -> float:
    """Pulse-power to noise-power ratio in dB (per complex sample)."""
    if noise_sigma <= 0:
        return float("inf")
    return 10 * np.log10((amplitude**2) / (2 * noise_sigma**2))
