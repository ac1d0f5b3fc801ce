"""End-to-end demodulation pipeline: IQ bytes -> decoded Mode S messages.

This is the framework's single-chip forward path (the reference's main decode
loop, dump1090.c:2968-2990): per buffer, the TPU computes magnitudes and both
demodulation passes for every preamble candidate (ops/magnitude.py,
ops/demod.py); the host replays the sequential scan semantics and decodes
fields (models/resolver.py, models/decoder.py).

The device work is one fixed-shape XLA program per block size, dispatched
asynchronously: buffer N+1's kernel is enqueued while buffer N's candidates
are resolved on the host, reproducing the reference's reader/decoder pipeline
parallelism (dump1090.c:436-527) with JAX's async dispatch instead of
pthreads.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import BinaryIO, Callable, Iterator

import numpy as np

from ..constants import BUF_SAMPLES, FULL_LEN_SAMPLES
from ..io.sources import iq_buffers
from ..ops.demod import demod_block
from ..ops.magnitude import magnitude_from_iq
from .decoder import DecoderConfig, DecoderStats, IcaoCache, ModesMessage
from .resolver import BlockCandidates, resolve_block


@dataclass
class PipelineConfig:
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    max_candidates: int = 1024
    loop: bool = False


class DemodPipeline:
    """Streaming demodulator over reference-geometry IQ buffers."""

    def __init__(self, cfg: PipelineConfig | None = None, clock=None):
        self.cfg = cfg or PipelineConfig()
        self.stats = DecoderStats()
        self.cache = IcaoCache(clock=clock)

    def _demod(self, buf: np.ndarray):
        import jax.numpy as jnp

        mag = magnitude_from_iq(jnp.asarray(buf))
        return demod_block(
            mag,
            scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
            max_candidates=self.cfg.max_candidates,
        )

    def run(self, stream: BinaryIO, emit: Callable[[ModesMessage], None]) -> None:
        """Decode a whole IQ stream, calling `emit` for every message the
        reference would hand to useModesMessage."""
        pending = None  # device results for the previous buffer (async)
        for buf in iq_buffers(stream, loop=self.cfg.loop):
            cand = self._demod(buf)  # enqueued asynchronously by JAX
            if pending is not None:
                self._resolve(pending, emit)
            pending = cand
        if pending is not None:
            self._resolve(pending, emit)

    def _resolve(self, cand, emit) -> None:
        host = BlockCandidates.from_device(cand)
        resolve_block(host, self.cache, self.cfg.decoder, self.stats, emit)

    def messages(self, stream: BinaryIO) -> Iterator[ModesMessage]:
        out: list[ModesMessage] = []
        pending = None
        for buf in iq_buffers(stream, loop=self.cfg.loop):
            cand = self._demod(buf)
            if pending is not None:
                host = BlockCandidates.from_device(pending)
                resolve_block(host, self.cache, self.cfg.decoder, self.stats, out.append)
                yield from out
                out.clear()
            pending = cand
        if pending is not None:
            host = BlockCandidates.from_device(pending)
            resolve_block(host, self.cache, self.cfg.decoder, self.stats, out.append)
            yield from out
