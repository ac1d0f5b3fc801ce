"""Sequential candidate resolver — exact replay of the reference scan rules.

Behavioral contract: the control flow of detectModeS, dump1090.c:1563-1793.

The TPU demodulator (ops/demod.py) evaluates every candidate position
independently; this module replays, in scan order and in O(candidates), the
three sequential rules a data-parallel kernel cannot absorb:

  * the skip rule — after a good-CRC message at j the scanner jumps to
    j + (8 + msglen*8)*2 + 1, so preambles inside a decoded frame are never
    examined (dump1090.c:1769-1771);
  * the phase-correction retry — a failed position is retried once with the
    corrected pass (pass 2), whose result the kernel already computed
    (dump1090.c:1786-1791);
  * stateful decode — the ICAO cache couples acceptance of address/parity
    frames to decode history (dump1090.c:942-983, 1196-1209).

It also reproduces the reference's stat counters exactly, including their
asymmetric update condition `(crcok || use_correction)` and the single-bit
double count (dump1090.c:1737-1753; SURVEY §2.4/C21).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterable

import numpy as np

from ..constants import LONG_MSG_BITS, PREAMBLE_US
from .decoder import DecoderConfig, DecoderStats, IcaoCache, ModesMessage, decode_message


@dataclass
class BlockCandidates:
    """Host-side (numpy) view of one block's compacted kernel output,
    trimmed to the true candidate count and sorted by position."""

    pos: np.ndarray       # [n] int32, ascending scan positions
    msg1: np.ndarray      # [n, 14] uint8
    errors1: np.ndarray   # [n] int32
    gate1: np.ndarray     # [n] bool
    msg2: np.ndarray
    errors2: np.ndarray
    gate2: np.ndarray

    @classmethod
    def from_device(cls, cand) -> "BlockCandidates":
        n = int(cand.n)
        c = min(n, cand.pos.shape[0])
        if n > cand.pos.shape[0]:
            raise OverflowError(
                f"candidate overflow: {n} preambles > max_candidates "
                f"{cand.pos.shape[0]}; raise max_candidates"
            )
        return cls(
            pos=np.asarray(cand.pos)[:c],
            msg1=np.asarray(cand.msg1)[:c],
            errors1=np.asarray(cand.errors1)[:c],
            gate1=np.asarray(cand.gate1)[:c],
            msg2=np.asarray(cand.msg2)[:c],
            errors2=np.asarray(cand.errors2)[:c],
            gate2=np.asarray(cand.gate2)[:c],
        )


def resolve_block(
    cands: BlockCandidates,
    cache: IcaoCache,
    cfg: DecoderConfig,
    stats: DecoderStats,
    emit: Callable[[ModesMessage], None],
) -> None:
    """Replay one block's candidates in scan order, emitting every message
    the reference would hand to useModesMessage (dump1090.c:1777)."""
    next_j = 0
    for k in range(len(cands.pos)):
        j = int(cands.pos[k])
        if j < next_j:
            continue  # inside a previously decoded good message
        stats.valid_preamble += 1

        # ---- pass 1: uncorrected (use_correction == 0) --------------------
        good = False
        if not bool(cands.gate1[k]):
            # noise-gate failure skips the retry entirely (dump1090.c:1724-1726)
            continue
        errors = int(cands.errors1[k])
        if errors == 0 or (cfg.aggressive and errors < 3):
            mm = decode_message(cands.msg1[k], cache, cfg, stats)
            if mm.crcok:  # stats gated on (crcok || use_correction)
                _update_detect_stats(stats, mm, errors)
            if mm.crcok:
                next_j = j + (PREAMBLE_US + (mm.msgbits // 8) * 8) * 2 + 1
                good = True
            emit(mm)
        if good:
            continue

        # ---- pass 2: phase-corrected retry (use_correction == 1) ----------
        if j > 0:
            stats.out_of_phase += 1  # correction applied only when j > 0
        if not bool(cands.gate2[k]):
            continue
        errors = int(cands.errors2[k])
        if errors == 0 or (cfg.aggressive and errors < 3):
            mm = decode_message(cands.msg2[k], cache, cfg, stats)
            _update_detect_stats(stats, mm, errors)  # unconditional on retry
            if mm.crcok:
                mm.phase_corrected = True
                next_j = j + (PREAMBLE_US + (mm.msgbits // 8) * 8) * 2 + 1
            emit(mm)


def _update_detect_stats(stats: DecoderStats, mm: ModesMessage, errors: int) -> None:
    """detectModeS stat block, dump1090.c:1737-1753.  The errorbit <
    LONG_MSG_BITS test is always true (errorbit is a message bit position),
    so single_bit_fix double counts and two_bits_fix is decode-path only —
    a reference quirk we reproduce."""
    if errors == 0:
        stats.demodulated += 1
    if mm.errorbit == -1:
        if mm.crcok:
            stats.goodcrc += 1
        else:
            stats.badcrc += 1
    else:
        stats.badcrc += 1
        stats.fixed += 1
        if mm.errorbit < LONG_MSG_BITS:
            stats.single_bit_fix += 1
        else:
            stats.two_bits_fix += 1
