"""High-level decode API: captures in, decoded messages out.

The CLI mirrors the reference's single-stream process model; this module is
the framework-native surface for programmatic and batch use:

  * `decode_capture` — one capture (path/bytes/array) -> list of messages.
  * `decode_captures` — MANY independent captures decoded together: all
    streams' buffers share each device dispatch along the batch axis (the
    "independent channels/files" data parallelism of SURVEY §2.5), while
    each stream keeps its own sequential host state (ICAO cache, stats),
    exactly as if it were decoded alone.  Per-stream results are
    bit-identical to `decode_capture`.

Messages are ModesMessage objects (good and bad CRC, like the reference's
useModesMessage stream); filter with `crcok_only=True` for the usable set.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np

from .constants import BUF_SAMPLES, FULL_LEN_SAMPLES, SCAN_POSITIONS
from .models.decoder import DecoderConfig, DecoderStats, IcaoCache, ModesMessage
from .models.pipeline import DemodPipeline, PipelineConfig
from .models.resolver import BlockCandidates, resolve_block


def _as_stream(capture) -> io.BufferedIOBase:
    if isinstance(capture, (str, Path)):
        return open(capture, "rb")
    if isinstance(capture, np.ndarray):
        return io.BytesIO(np.ascontiguousarray(capture, dtype=np.uint8).tobytes())
    if isinstance(capture, (bytes, bytearray, memoryview)):
        return io.BytesIO(bytes(capture))
    return capture  # already a binary stream


def decode_capture(
    capture,
    *,
    config: DecoderConfig | None = None,
    crcok_only: bool = False,
    batch_buffers: int = 16,
) -> list[ModesMessage]:
    """Decode one IQ capture (path, bytes, uint8 array, or binary stream)."""
    cfg = PipelineConfig(
        decoder=config or DecoderConfig(), batch_buffers=batch_buffers
    )
    p = DemodPipeline(cfg)
    out: list[ModesMessage] = []
    stream = _as_stream(capture)
    try:
        p.run(stream, out.append)
    finally:
        if stream is not capture:
            stream.close()
    if crcok_only:
        out = [m for m in out if m.crcok]
    return out


@dataclass
class _StreamState:
    """Per-capture sequential host state (each stream decodes as if alone)."""

    cache: IcaoCache = field(default_factory=IcaoCache)
    stats: DecoderStats = field(default_factory=DecoderStats)
    messages: list = field(default_factory=list)
    resolver: object = None
    done: bool = False


def decode_captures(
    captures: Sequence,
    *,
    config: DecoderConfig | None = None,
    crcok_only: bool = False,
) -> list[list[ModesMessage]]:
    """Decode many independent captures with shared device dispatches.

    Each dispatch demodulates one reference-geometry buffer from EVERY
    still-active capture (batch axis = channels); exhausted captures pad
    with silence.  Host resolution stays per-stream sequential."""
    import jax
    import jax.numpy as jnp

    from .io.sources import iq_buffers
    from .parallel.sharding import demod_batch

    dcfg = config or DecoderConfig()
    # mutable holder: grown candidate shapes stick for subsequent batches,
    # matching DemodPipeline's sticky-growth policy
    mc_box = {"mc": PipelineConfig().max_candidates}
    scan_len = BUF_SAMPLES - FULL_LEN_SAMPLES

    streams = [_as_stream(c) for c in captures]
    iters = [iq_buffers(s) for s in streams]
    states = [_StreamState() for _ in captures]
    try:
        from .native import NativeResolver

        for st in states:
            st.resolver = NativeResolver()
    except Exception:
        pass

    buf_bytes = BUF_SAMPLES * 2
    try:
        pending = None
        while True:
            x = np.full((len(captures), buf_bytes), 127, dtype=np.uint8)
            live = []
            for k, (it, st) in enumerate(zip(iters, states)):
                if st.done:
                    continue
                try:
                    x[k] = next(it)
                    live.append(k)
                except StopIteration:
                    st.done = True
            work = None
            if live:
                cand = demod_batch(
                    jnp.asarray(x), scan_len=scan_len,
                    max_candidates=mc_box["mc"],
                )
                work = (cand, live, x)
            if pending is not None:
                _resolve_rows(pending, states, dcfg, mc_box)
            if work is None:
                break
            pending = work
        # trailing batch resolved in the loop's last iteration via pending
    finally:
        for s, c in zip(streams, captures):
            if s is not c:
                s.close()

    results = []
    for st in states:
        msgs = st.messages
        if crcok_only:
            msgs = [m for m in msgs if m.crcok]
        results.append(msgs)
    return results


def _redemod_with_retry(buf: np.ndarray, mc: int, mc_box: dict) -> BlockCandidates:
    import jax.numpy as jnp

    from .ops.demod import demod_iq_block

    while True:
        mc *= 4
        big = demod_iq_block(
            jnp.asarray(buf),
            scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
            max_candidates=mc,
        )
        try:
            bc = BlockCandidates.from_device(big)
            mc_box["mc"] = max(mc_box["mc"], mc)  # sticky for later batches
            return bc
        except OverflowError:
            # every-other-position bound (adjacent preambles are excluded)
            if mc >= SCAN_POSITIONS // 2 + 1:
                raise


def _resolve_rows(work, states, dcfg, mc_box) -> None:
    import jax
    import jax.numpy as jnp

    cand, live, x = work
    host = jax.device_get(list(cand))
    for k in live:
        row = type(cand)(*[f[k] for f in host])
        try:
            bc = BlockCandidates.from_device(row)
        except OverflowError:
            bc = _redemod_with_retry(x[k], row.pos.shape[0], mc_box)
        st = states[k]
        if st.resolver is not None:
            st.resolver.resolve_block(bc, st.cache, dcfg, st.stats, st.messages.append)
        else:
            resolve_block(bc, st.cache, dcfg, st.stats, st.messages.append)
