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

from ..constants import BLOCK_SAMPLES, BUF_SAMPLES, FULL_LEN_SAMPLES, SCAN_POSITIONS
from ..io.sources import iq_buffers
from ..ops.demod import demod_block
from ..ops.magnitude import magnitude_from_iq
from .decoder import DecoderConfig, DecoderStats, IcaoCache, ModesMessage
from .resolver import BlockCandidates, resolve_block


def start_d2h(arrays) -> None:
    """Enqueue async device->host copies of `arrays` (any iterable of
    jax.Arrays) so a later jax.device_get finds the bytes already on — or
    streaming to — the host.

    On the tunneled TPU runtime a plain device_get serializes per-array
    round trips (~12 MB/s measured, ~34 ms floor each); copies pre-issued
    with copy_to_host_async pipeline on the link (~32 MB/s measured — 2.6x).
    Every overlapped decode loop calls this at DISPATCH time: the copies
    execute as soon as the program finishes, concurrently with the next
    group's compute, which is the difference between a hidden and an
    exposed fetch stage.  No-op on arrays/backends without the method."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except (AttributeError, RuntimeError):
            return


@dataclass
class PipelineConfig:
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    # Preamble candidates per buffer the device kernels are shaped for.
    # Densest real traffic measured: modes1.bin (dead-air-stripped) peaks at
    # 215 preambles in one 131072-sample buffer, so 256 covers real traffic;
    # a buffer that still overflows is retried at 4x (the kernel reports
    # the exact preamble count, so overflow is detected, never silent) and
    # the session then ADOPTS the larger shape permanently, so sustained
    # dense traffic pays one retry total, not one per buffer.  Lower is
    # faster: gather + demod-pass cost is proportional to this.  Must be a
    # multiple of 16 (the Pallas gather CHUNK).
    max_candidates: int = 256
    loop: bool = False
    # Buffers demodulated per device dispatch.  1 = lowest latency (65 ms of
    # signal per dispatch) for live stdin/network feeds; >1 amortizes the
    # per-dispatch cost for file decode (the CLI picks 16 for regular files).
    # Results are bit-identical either way: buffers are independent on the
    # device and resolved strictly in stream order on the host.
    batch_buffers: int = 1
    # seconds slept per buffer fill — the reference's --interactive playback
    # brake for --ifile (usleep(5000), dump1090.c:471-477)
    throttle_s: float = 0.0
    # Device-resolve path only: batches chained per device dispatch (one
    # program runs this many batches, one fetch returns them all).  >1
    # amortizes per-dispatch/per-fetch round trips for file decode; 1 keeps
    # latency minimal for live feeds.
    dispatch_groups: int = 1
    # Ingest strategy for regular files (see _ingest_groups): "auto"
    # preloads files up to PRELOAD_CAP_BYTES to the device before the first
    # dispatch (throughput-optimal on runtimes whose host->device link
    # degrades after the first program executes — the tunneled axon
    # runtime); "staged" uploads one group, dispatches, and uploads the
    # rest during the first compile (latency-optimal: time-to-first-message
    # = one group + compile); "off" always streams through the reader
    # thread.
    preload: str = "auto"
    # Device-resolve dispatch groups held in flight before the oldest is
    # fetched.  0 = auto: 3 for seekable (file) sources — chip-measured
    # round 5, depth 3 reads +10-12% sustained over depth 1 because the
    # deeper queue hides the tunnel link's fetch jitter — and 1 for
    # live/looped/throttled streams, where two extra groups of latency
    # (~2x dispatch_groups x batch_buffers x 65 ms of signal) would break
    # the reference's live cadence.  Bit-identical either way (the ICAO
    # cache chains on DISPATCH order, which a deeper fetch queue does not
    # change); candidate-overflow sticky growth replays every in-flight
    # group from the pre-overflow cache state.
    dispatch_ahead: int = 0


class DemodPipeline:
    """Streaming demodulator over reference-geometry IQ buffers."""

    def __init__(
        self,
        cfg: PipelineConfig | None = None,
        clock=None,
        debug_flags=None,
        debug_out=None,
        native: bool | None = None,
        lock=None,
    ):
        self.cfg = cfg or PipelineConfig()
        # Held across every host resolve step (which mutates the shared
        # IcaoCache/DecoderStats and runs the emit callbacks).  Callers that
        # also decode raw network input on another thread pass the same
        # (reentrant) lock so the two decode paths are serialized, like the
        # single-threaded reference polling sockets between buffers
        # (dump1090.c:2831-2847).
        import contextlib

        self._lock = lock if lock is not None else contextlib.nullcontext()
        # working candidate shape; sticky growth on overflow lives on the
        # INSTANCE so a PipelineConfig shared across pipelines is not mutated
        self._mc = self.cfg.max_candidates
        self._mo = None   # emitted-message shape (full-fidelity device path)
        self._mos = None  # emitted short-frame rows (packed device path)
        self._mol = None  # emitted long-frame rows (packed device path)
        self.stats = DecoderStats()
        self.samples_in = 0      # new samples demodulated (throughput meter)
        self.cache = IcaoCache(clock=clock)
        self.debug_flags = debug_flags  # utils.debug.DebugFlags | None
        self.debug_out = debug_out
        # host resolver: the native C++ runtime when available (same
        # semantics, ~100x faster).  Only the demod-dump flags (dDcCpj)
        # need the Python replay; network debugging ('n') keeps native.
        self._native = None
        needs_python = debug_flags is not None and debug_flags.any_demod_dump
        if native is not False and not needs_python:
            try:
                from ..native import NativeResolver

                self._native = NativeResolver()
            except Exception:
                if native is True:
                    raise
        # --debug p prints the scratch msg buffer's stale content; in the
        # reference that is the previous detectModeS call's last sliced
        # message (the same stack frame is reused), so it carries across
        # buffers.  Before the very first slice it is true C garbage, where
        # we deterministically use zeros (documented divergence).
        self._debug_last_msg = None

    @property
    def _debugging(self) -> bool:
        return self.debug_flags is not None and self.debug_flags.any_demod_dump

    def _demod(self, buf: np.ndarray, max_candidates: int | None = None):
        import jax.numpy as jnp

        mc = max_candidates or self._mc
        if not self._debugging:
            from ..ops.demod import demod_iq_block

            cand = demod_iq_block(
                jnp.asarray(buf),
                scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
                max_candidates=mc,
            )
            return buf, cand, None, None
        mag = magnitude_from_iq(jnp.asarray(buf))
        cand = demod_block(
            mag,
            scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
            max_candidates=mc,
        )
        from ..ops.demod import preamble_reject_stages

        rej = preamble_reject_stages(mag, scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES)
        return buf, cand, mag, rej

    def run(self, stream: BinaryIO, emit: Callable[[ModesMessage], None]) -> None:
        """Decode a whole IQ stream, calling `emit` for every message the
        reference would hand to useModesMessage."""
        for _ in self._stream(stream, emit):
            pass

    def run_source(self, buffers, emit: Callable[[ModesMessage], None]) -> None:
        """Decode an iterable of pre-framed uint8[BUF_BYTES] buffers (e.g. a
        live io.rtlsdr.RtlSdrSource) — the single-buffer low-latency path:
        buffer N+1's device work is enqueued while N resolves on the host,
        like the reference's reader/decoder thread pair."""
        pending = None
        for buf in buffers:
            self.samples_in += BLOCK_SAMPLES
            work = self._demod(buf)  # enqueued asynchronously by JAX
            if pending is not None:
                self._resolve(pending, emit)
            pending = work
        if pending is not None:
            self._resolve(pending, emit)

    def messages(self, stream: BinaryIO) -> Iterator[ModesMessage]:
        out: list[ModesMessage] = []
        yield from self._stream(stream, out.append, out)

    def _stream(self, stream, emit, drain: list | None = None):
        if self.cfg.batch_buffers > 1 and not self._debugging:
            yield from self._stream_batched(stream, emit, drain)
            return
        pending = None  # device results for the previous buffer (async)
        for buf in iq_buffers(stream, loop=self.cfg.loop, throttle_s=self.cfg.throttle_s):
            self.samples_in += BLOCK_SAMPLES
            work = self._demod(buf)  # enqueued asynchronously by JAX
            if pending is not None:
                self._resolve(pending, emit)
                if drain is not None:
                    yield from drain
                    drain.clear()
            pending = work
        if pending is not None:
            self._resolve(pending, emit)
            if drain is not None:
                yield from drain
                drain.clear()

    def _stream_batched(self, stream, emit, drain: list | None = None):
        """File-decode fast path: demodulate batch_buffers buffers per device
        dispatch (one fixed-shape program; short batches pad with silence,
        which yields zero candidates), resolve rows in stream order."""
        import itertools

        import jax.numpy as jnp

        from ..parallel.sharding import demod_batch

        nb = self.cfg.batch_buffers
        it = iq_buffers(stream, loop=self.cfg.loop, throttle_s=self.cfg.throttle_s)
        pending = None
        while True:
            bufs = list(itertools.islice(it, nb))
            if not bufs:
                break
            n_real = len(bufs)
            self.samples_in += n_real * BLOCK_SAMPLES
            x = np.full((nb, bufs[0].shape[0]), 127, dtype=np.uint8)
            x[:n_real] = np.stack(bufs)
            cand = demod_batch(
                jnp.asarray(x),
                scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
                max_candidates=self._mc,
            )
            start_d2h(cand)
            work = (x, cand, n_real)
            if pending is not None:
                yield from self._resolve_batch(pending, emit, drain)
            pending = work
        if pending is not None:
            yield from self._resolve_batch(pending, emit, drain)

    # ---- fully-fused device path ------------------------------------------

    def stream_raw_device(self, stream: BinaryIO):
        """Bulk device path: yield `*<hex>;\\n` bytes per batch with BOTH the
        O(samples) demodulation and the O(candidates) sequential resolve on
        the device (ops/resolve.py); the host only re-interleaves the packed
        short/long frame arrays (ops.resolve.interleave_packed) and formats
        hex — the split wire format moves ~25% fewer bytes than uniform
        14-byte rows on typical traffic."""
        from ..native import raw_lines_from_fields
        from ..ops.resolve import interleave_packed

        for count, count_long, shorts, longs in self._device_batches(
            stream, crcok_only=True, packed=True
        ):
            msg, bits = interleave_packed(count, count_long, shorts, longs)
            yield raw_lines_from_fields(
                msg, bits, np.ones(msg.shape[0], dtype=bool)
            )

    def run_source_device(self, buffers, emit: Callable[[ModesMessage], None]) -> None:
        """Device-resolve twin of run_source: decode an iterable of
        pre-framed uint8[BUF_BYTES] buffers (e.g. a live io.rtlsdr
        RtlSdrSource) with demod AND the sequential resolve on the TPU.
        With the live defaults (batch_buffers=1, dispatch_groups=1) the
        upload of buffer N+1 happens on the ingest thread while buffer N
        resolves on the device — 65 ms buffer latency, like the reference's
        rtlsdrCallback -> detectModeS hand-off (dump1090.c:442-458,
        2968-2990)."""
        self.run_device(None, emit, buffers=buffers)

    def run_device(self, stream: BinaryIO | None,
                   emit: Callable[[ModesMessage], None], buffers=None) -> None:
        """Full-fidelity device path: every message the reference hands to
        useModesMessage (good AND bad CRC), as ModesMessage objects in scan
        order, with demod + sequential resolve on the device.  Field decode
        on the host is stateless (models/decoder.py message_from_device):
        all cache/CRC decisions arrive in the per-message meta word, and the
        syndrome of the emitted bytes supplies crc/IID/AP-address."""
        from .decoder import messages_from_device_arrays

        for meta_h, msg_h in self._device_batches(
            stream, crcok_only=False, packed=False, buffers=buffers
        ):
            mms = messages_from_device_arrays(msg_h, meta_h)
            if not mms:
                continue
            with self._lock:
                for mm in mms:
                    emit(mm)

    def _device_batches(self, stream: BinaryIO | None, *, crcok_only: bool,
                        packed: bool, buffers=None):
        """Shared device-pipeline core: dispatch GROUPS of batches chained
        through the device-resident ICAO cache (ops.resolve
        demod_resolve_group: one program runs G batches, outputs stacked),
        fetch each group's emissions in ONE transfer, detect overflow by
        exact counts and retry from the pre-group state with sticky shape
        growth.

        Group k+1 is dispatched from group k's device-resident output state
        before k's results are fetched, so device compute, the device->host
        transfer, and the caller's host work overlap; grouping amortizes
        the per-dispatch/per-fetch cost (tunneled runtimes have ~100 ms
        fixed round-trip floors — see CLAUDE.md).  Yields per batch:
        (count, count_long, shorts, longs) when packed (see
        ops.resolve.interleave_packed for reconstruction), else
        (meta[count], msg[count, 14]).  The device cache is synced back to
        the host cache at the end of the stream; stats accumulate into
        self.stats.

        Clock granularity: `now` is sampled once per dispatch GROUP (up to
        dispatch_groups x batch_buffers x 65 ms of signal, ~33 s at the file
        defaults), coarser than the native resolver's once-per-batch sample.
        Both are approximations of the reference's per-buffer time();
        ICAO-cache TTL decisions within ~33 s of the 60 s horizon can differ
        between the two paths on real-time-paced runs (never within one
        deterministic file decode, where the clock is frozen)."""
        import itertools

        import jax
        import jax.numpy as jnp

        from ..ops.resolve import (
            _use_pallas_resolve,
            clamp_packed_out,
            demod_resolve_group,
            max_candidates_cap,
        )

        nb = max(self.cfg.batch_buffers, 1)
        ng = max(self.cfg.dispatch_groups, 1)
        mc_cap = max_candidates_cap(nb)
        if self._mo is None:
            self._mo = max(4096, nb * self._mc // 2)
        if self._mos is None:
            # sized so the densest real fixture (modes1: ~39 short / ~65
            # long emissions per buffer at mc=256) fits without a first-
            # group overflow retry; quiet air shrinks via adapt_down
            self._mos, self._mol = clamp_packed_out(
                max(2048, nb * self._mc // 4), max(2048, nb * self._mc // 3)
            )
        dcfg = self.cfg.decoder
        ca = jnp.asarray(self.cache.addr.astype(np.int64).astype(np.int32))
        ct = jnp.asarray(np.clip(self.cache.ts, 0, 2**31 - 1).astype(np.int32))

        def dispatch(xg, ca, ct):
            out = demod_resolve_group(
                jnp.asarray(xg), ca, ct, self.cache.clock(),
                dcfg.fix_errors, dcfg.aggressive,
                scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
                max_candidates=self._mc, max_out=self._mo,
                max_out_short=self._mos, max_out_long=self._mol,
                crcok_only=crcok_only, packed=packed,
            )
            # pipeline the eventual fetch on the link while the NEXT group
            # computes (see start_d2h); the cache arrays stay device-resident
            start_d2h(out[:6])
            return out

        # density adaptation: consecutive groups whose peaks sit far below
        # the static shapes shrink them (quiet air stops paying dense-shaped
        # demod/emission cost); any overflow grows them back immediately.
        quiet_groups = [0]

        def adapt_down(n_h, peak_short, peak_long, peak_total):
            if (int(n_h.max(initial=0)) * 8 <= self._mc
                    and peak_short * 8 <= self._mos
                    and peak_long * 8 <= self._mol
                    and peak_total * 8 <= self._mo):
                quiet_groups[0] += 1
            else:
                quiet_groups[0] = 0
            if quiet_groups[0] >= 3:
                quiet_groups[0] = 0
                self._mc = max(64, self._mc // 4)
                self._mos = max(2048, self._mos // 4)
                self._mol = max(2048, self._mol // 4)
                self._mo = max(4096, self._mo // 4)

        def finish(work):
            """Fetch one group; returns (per-batch payload list, redo)."""
            xg, g_real, state_before, out, disp = work
            # validate against the shapes this group was DISPATCHED with —
            # adapt_down may have shrunk self._* while it was in flight,
            # and a group that fit its own allocation must not be replayed
            mc_d, mos_d, mol_d, mo_d = disp
            redo = None
            while True:
                if packed:
                    host = jax.device_get(list(out[:5]))
                    n_h, count_h, clong_h, shorts_h, longs_h = host
                    stats_h = jax.device_get(out[5])
                    cs_peak = int((count_h - clong_h).max(initial=0))
                    cl_peak = int(clong_h.max(initial=0))
                    ct_peak = 0
                    ok = (cs_peak <= mos_d and cl_peak <= mol_d)
                else:
                    host = jax.device_get(list(out[:5]))
                    n_h, count_h, msg_h, meta_h, stats_h = host
                    cs_peak = cl_peak = 0
                    ct_peak = int(count_h.max(initial=0))
                    ok = ct_peak <= mo_d
                if int(n_h.max(initial=0)) <= mc_d and ok:
                    break
                # grow the overflowing shape(s) and replay from the
                # pre-group state (exact counts: loud, never silent)
                n_peak = int(n_h.max(initial=0))
                while self._mc < n_peak:
                    self._mc *= 4
                if _use_pallas_resolve() and self._mc > mc_cap:
                    # growing past the window-gather SMEM budget would fail
                    # Pallas lowering mid-decode; clamp, or raise with the
                    # actual remedy if the exact count can't fit at all
                    if n_peak > mc_cap:
                        raise RuntimeError(
                            f"a buffer reported {n_peak} preamble candidates "
                            f"but the window-gather SMEM budget caps "
                            f"max_candidates at {mc_cap} for {nb}-buffer "
                            f"batches — lower --tpu-batch"
                        )
                    self._mc = mc_cap
                while self._mos < cs_peak:
                    self._mos *= 4
                while self._mol < cl_peak:
                    self._mol *= 4
                if packed:
                    # 16-bit rank field: keep mos+mol under the wire
                    # format's per-batch emission cap (raises if the exact
                    # peaks themselves can't fit)
                    self._mos, self._mol = clamp_packed_out(
                        self._mos, self._mol, cs_peak, cl_peak
                    )
                while self._mo < ct_peak:
                    self._mo *= 4
                ca0, ct0 = state_before
                out = dispatch(xg, ca0, ct0)
                mc_d, mos_d, mol_d, mo_d = (
                    self._mc, self._mos, self._mol, self._mo
                )
                redo = (out[-2], out[-1])
            adapt_down(n_h, cs_peak, cl_peak, ct_peak)
            for name, d in zip(
                ("valid_preamble", "out_of_phase", "demodulated", "goodcrc",
                 "badcrc", "fixed", "single_bit_fix", "two_bits_fix"),
                stats_h.sum(axis=0).tolist(),
            ):
                setattr(self.stats, name, getattr(self.stats, name) + d)
            payloads = []
            for g in range(g_real):
                c = int(count_h[g])
                if packed:
                    payloads.append(
                        (c, int(clong_h[g]), shorts_h[g], longs_h[g])
                    )
                else:
                    payloads.append((meta_h[g, :c], msg_h[g, :c]))
            return payloads, redo

        if buffers is not None:
            it = iter(buffers)
        else:
            it = iq_buffers(
                stream, loop=self.cfg.loop, throttle_s=self.cfg.throttle_s
            )
        def shapes_now():
            return (self._mc, self._mos, self._mol, self._mo)

        import collections

        # dispatch-ahead depth: how many groups stay in flight before the
        # oldest is fetched (PipelineConfig.dispatch_ahead; 0 = auto)
        depth = self.cfg.dispatch_ahead
        if depth <= 0:
            seekable = False
            if buffers is None and stream is not None:
                try:
                    seekable = stream.seekable()
                except (OSError, AttributeError, ValueError):
                    seekable = False
            depth = (3 if seekable and not self.cfg.loop
                     and self.cfg.throttle_s == 0 else 1)

        # entries: (xg, g_real, state_before, out, dispatch_shapes)
        pending: collections.deque = collections.deque()
        groups = self._ingest_groups(stream, it, ng, nb)
        try:
            while True:
                item = next(groups, None)
                if item is not None:
                    xg, g_real, n_bufs = item
                    self.samples_in += n_bufs * BLOCK_SAMPLES
                    work = (xg, g_real, (ca, ct), dispatch(xg, ca, ct),
                            shapes_now())
                    ca, ct = work[3][-2], work[3][-1]
                    pending.append(work)
                # keep `depth` groups in flight while the stream lives;
                # drain everything at EOF
                while len(pending) > (depth if item is not None else 0):
                    payloads, redo = finish(pending.popleft())
                    yield from payloads
                    if redo:  # shapes grew: replay EVERY in-flight group
                        # from the pre-overflow cache state, in order
                        ca, ct = redo
                        requeue = [(w[0], w[1]) for w in pending]
                        pending.clear()
                        for xg2, g_real2 in requeue:
                            w2 = (xg2, g_real2, (ca, ct),
                                  dispatch(xg2, ca, ct), shapes_now())
                            ca, ct = w2[3][-2], w2[3][-1]
                            pending.append(w2)
                if item is None:
                    return
        finally:
            groups.close()
            # device cache -> host cache (keeps --tpu-state-save and any
            # later host-side decoding consistent)
            ca_h, ct_h = jax.device_get([ca, ct])
            self.cache.addr[:] = ca_h.astype(np.uint32)
            self.cache.ts[:] = ct_h.astype(np.int64)

    # uploaded IQ this large is preloaded to the device before the first
    # dispatch when the source is a regular file (overridable via
    # DUMP1090_TPU_PRELOAD_BYTES); larger/unseekable sources stream through
    # a reader thread instead
    PRELOAD_CAP_BYTES = 1536 << 20

    def _ingest_groups(self, stream, it, ng: int, nb: int):
        """Generator of device-resident dispatch groups (xg, g_real, n_bufs)
        with host->device upload OVERLAPPED against compute — the
        framework's form of the reference's reader-thread/decoder overlap
        (dump1090.c:436-527, 2968-2990).

        Two strategies:

          * preload (regular files up to PRELOAD_CAP_BYTES, no --loop/
            throttle): frame and upload EVERY group before the first
            dispatch.  On runtimes where the host->device link degrades
            once the first program has executed (the tunneled axon runtime
            drops ~30x, see CLAUDE.md), uploading while the device is still
            idle is the difference between ingest-bound and compute-bound
            cold-file decode;
          * streaming (stdin, sockets, --loop, throttled playback): a
            reader thread frames and uploads group g+1 while the main
            thread dispatches/fetches g — one group of lookahead, bounded
            memory."""
        import itertools
        import os
        import queue
        import threading

        import jax
        import jax.numpy as jnp

        def make_group(bufs):
            buf_bytes = bufs[0].shape[0]
            g_real = -(-len(bufs) // nb)
            xg = np.full((ng, nb, buf_bytes), 127, dtype=np.uint8)
            xg.reshape(ng * nb, buf_bytes)[: len(bufs)] = np.stack(bufs)
            # upload as zero-copy uint16 IQ-pair view: the u16 entry makes
            # the device magnitude elementwise (ops.resolve._group_front;
            # +10% sustained, chip-measured round 5)
            return jax.device_put(jnp.asarray(xg.view("<u2"))), g_real, len(bufs)

        preload = False
        if (self.cfg.preload != "off" and not self.cfg.loop
                and self.cfg.throttle_s == 0):
            try:
                fileno = stream.fileno() if stream is not None else None
                if fileno is not None and os.fstat(fileno).st_size <= int(
                    os.environ.get(
                        "DUMP1090_TPU_PRELOAD_BYTES", self.PRELOAD_CAP_BYTES
                    )
                ) and stream.seekable():
                    preload = True
            except (OSError, AttributeError, ValueError):
                preload = False

        if preload and self.cfg.preload == "staged":
            # Staged preload: upload ONE group, yield it (the consumer's
            # first dispatch starts the 10-50 s program compile), and keep
            # uploading the rest from a reader thread — measured (v5e,
            # tools/measure.py --probe staged-h2d): device_put issued
            # during the first compile runs at the PRE-compute fast-window
            # rate, so the whole file is usually resident before the first
            # program finishes.  Time-to-first-message becomes
            # one-group-upload + compile instead of whole-file-upload +
            # compile.  The trade: with a WARM compilation cache there is
            # no compile window to hide the tail uploads, and in slow
            # post-compute link moods the decode can become ingest-bound —
            # which is why "auto" keeps the full preload (throughput-first)
            # and staged is opt-in for latency.
            q2: queue.Queue = queue.Queue()  # unbounded: reader never blocks
            stop2 = threading.Event()
            first_bufs = list(itertools.islice(it, ng * nb))
            if not first_bufs:
                return
            first = make_group(first_bufs)

            def tail_reader():
                try:
                    while not stop2.is_set():
                        bufs = list(itertools.islice(it, ng * nb))
                        if not bufs:
                            q2.put(None)
                            return
                        q2.put(make_group(bufs))
                except BaseException as e:  # surfaced on the consumer side
                    q2.put(e)

            t2 = threading.Thread(
                target=tail_reader, name="iq-upload-tail", daemon=True
            )
            t2.start()
            try:
                yield first
                while True:
                    item = q2.get()
                    if item is None:
                        return
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                stop2.set()
            return

        if preload:
            staged = []
            while True:
                bufs = list(itertools.islice(it, ng * nb))
                if not bufs:
                    break
                staged.append(make_group(bufs))
            yield from staged
            return

        q: queue.Queue = queue.Queue(maxsize=1)
        stop = threading.Event()

        def reader():
            try:
                while not stop.is_set():
                    bufs = list(itertools.islice(it, ng * nb))
                    item = make_group(bufs) if bufs else None
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if item is None:
                        return
            except BaseException as e:  # surfaced on the consumer side
                # keep trying until the consumer drains the queue (it always
                # does) or tears the generator down: a timed-out put here
                # would silently drop the error AND the None sentinel,
                # leaving the consumer blocked in q.get() forever
                while not stop.is_set():
                    try:
                        q.put(e, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=reader, name="iq-upload", daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def stream_records(self, stream: BinaryIO):
        """Bulk fast path: yield one packed native Record array per buffer,
        in stream order, with zero per-message Python objects.  Requires the
        native resolver (raises RuntimeError otherwise); used by the CLI's
        pure --raw mode, where the hex lines are formatted vectorially."""
        import itertools

        import jax
        import jax.numpy as jnp

        from ..parallel.sharding import demod_batch

        if self._native is None:
            raise RuntimeError("stream_records requires the native resolver")
        nb = max(self.cfg.batch_buffers, 1)
        it = iq_buffers(stream, loop=self.cfg.loop, throttle_s=self.cfg.throttle_s)
        pending = None
        while True:
            bufs = list(itertools.islice(it, nb))
            if bufs:
                n_real = len(bufs)
                self.samples_in += n_real * BLOCK_SAMPLES
                x = np.full((nb, bufs[0].shape[0]), 127, dtype=np.uint8)
                x[:n_real] = np.stack(bufs)
                cand = demod_batch(
                    jnp.asarray(x),
                    scan_len=BUF_SAMPLES - FULL_LEN_SAMPLES,
                    max_candidates=self._mc,
                )
                start_d2h(cand)
                work = (x, cand, n_real)
            else:
                work = None
            if pending is not None:
                x, cand, n_real = pending
                host = jax.device_get(list(cand))
                n_arr = host[0][:n_real]
                try:
                    # whole batch in ONE native call (no per-row overhead)
                    with self._lock:
                        records, counts = self._native.resolve_blocks_records(
                            [f[:n_real] for f in host[1:]], n_arr,
                            self.cache, self.cfg.decoder, self.stats,
                        )
                    off = 0
                    for c in counts.tolist():
                        yield records[off : off + c]
                        off += c
                except OverflowError:
                    # a row denser than the shape: per-row path with retry
                    for b in range(n_real):
                        row = type(cand)(*[f[b] for f in host])
                        try:
                            bc = BlockCandidates.from_device(row)
                        except OverflowError:
                            _, bc = self._demod_retry(x[b], row.pos.shape[0])
                        with self._lock:
                            rec = self._native.resolve_block_records(
                                bc, self.cache, self.cfg.decoder, self.stats
                            )
                        yield rec
            if work is None:
                return
            pending = work

    def _resolve_batch(self, work, emit, drain: list | None):
        import jax

        x, cand, n_real = work
        host = jax.device_get(list(cand))  # ONE transfer: per-field fetches
        # each pay the runtime's round-trip latency
        if self._native is not None:
            try:
                # whole batch in one native call (matches stream_records)
                from ..native import records_to_messages

                with self._lock:
                    records, counts = self._native.resolve_blocks_records(
                        [f[:n_real] for f in host[1:]], host[0][:n_real],
                        self.cache, self.cfg.decoder, self.stats,
                    )
                    for mm in records_to_messages(records):
                        emit(mm)
                if drain is not None:
                    yield from drain
                    drain.clear()
                return
            except OverflowError:
                pass  # a dense row: fall through to the per-row path
        for b in range(n_real):
            row = type(cand)(*[f[b] for f in host])
            try:
                bc = BlockCandidates.from_device(row)
            except OverflowError:
                # single dense buffer: redo it alone with more headroom
                _, bc = self._demod_retry(x[b], row.pos.shape[0])
            with self._lock:
                if self._native is not None:
                    self._native.resolve_block(
                        bc, self.cache, self.cfg.decoder, self.stats, emit
                    )
                else:
                    resolve_block(bc, self.cache, self.cfg.decoder, self.stats, emit)
            if drain is not None:
                yield from drain
                drain.clear()

    def _demod_retry(self, buf: np.ndarray, mc: int):
        """Re-demodulate one buffer with growing candidate headroom until its
        exact preamble count fits (counts are reported by the kernel, so
        overflow is detected, never silently truncated)."""
        while True:
            mc *= 4
            work = self._demod(buf, max_candidates=mc)
            try:
                host = BlockCandidates.from_device(work[1])
                # sticky: adopt the larger shape for the rest of the session
                # so sustained dense traffic retries once, not per buffer
                self._mc = max(self._mc, mc)
                return work, host
            except OverflowError:
                # true ceiling: the preamble predicate forbids adjacent hits,
                # so a buffer holds at most every-other-position candidates
                if mc >= SCAN_POSITIONS // 2 + 1:
                    raise

    def _resolve(self, work, emit) -> None:
        buf, cand, mag, rej = work
        try:
            host = BlockCandidates.from_device(cand)
        except OverflowError:
            work, host = self._demod_retry(buf, cand.pos.shape[0])
            _, cand, mag, rej = work
        if self._native is not None and not self._debugging:
            with self._lock:
                self._native.resolve_block(
                    host, self.cache, self.cfg.decoder, self.stats, emit
                )
            return
        debug = None
        if self._debugging:
            from .resolver import DebugContext

            debug = DebugContext(
                flags=self.debug_flags,
                mag=np.asarray(mag),
                reject_code=np.asarray(rej),
                out=self.debug_out,
            )
            if self._debug_last_msg is not None:
                debug.last_msg = self._debug_last_msg
        with self._lock:
            resolve_block(host, self.cache, self.cfg.decoder, self.stats, emit, debug)
        if debug is not None:
            self._debug_last_msg = debug.last_msg
