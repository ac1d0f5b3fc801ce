"""Command line interface — flag-compatible with the reference dump1090.

Behavioral contract: main/showHelp/argv loop, dump1090.c:2787-3012.  All 26
reference flags are accepted with identical spellings and semantics,
including live RTL-SDR capture (io/rtlsdr.py binds librtlsdr at runtime;
without it the CLI degrades to --ifile/stdin/port-30001 input with a clean
error).  Framework-specific flags are prefixed --tpu-*.
"""

from __future__ import annotations

import sys
import time

from .constants import INTERACTIVE_ROWS, INTERACTIVE_TTL

HELP = """\
--device-index <index>   Select RTL device (default: 0).
--gain <db>              Set gain (default: max gain. Use -100 for auto-gain).
--enable-agc             Enable the Automatic Gain Control (default: off).
--freq <hz>              Set frequency (default: 1090 Mhz).
--ppm <error>            Set receiver error in parts per million (default: 0).
--ifile <filename>       Read data from file (use '-' for stdin).
--loop                   With --ifile, read the same file in a loop.
--interactive            Interactive mode refreshing data on screen.
--interactive-rows <num> Max number of rows in interactive mode (default: 15).
--interactive-ttl <sec>  Remove from list if idle for <sec> (default: 60).
--raw                    Show only messages hex values.
--net                    Enable networking.
--net-only               Enable just networking, no RTL device or file used.
--net-ro-port <port>     TCP listening port for raw output (default: 30002).
--net-ri-port <port>     TCP listening port for raw input (default: 30001).
--net-http-port <port>   HTTP server port (default: 8080).
--net-sbs-port <port>    TCP listening port for BaseStation format output (default: 30003).
--no-fix                 Disable single-bits error correction using CRC.
--no-crc-check           Disable messages with broken CRC (discouraged).
--aggressive             More CPU for more messages (two bits fixes, ...).
--stats                  With --ifile print stats at exit. No other output.
--onlyaddr               Show only ICAO addresses (testing purposes).
--metric                 Use metric units (meters, km/h, ...).
--snip <level>           Strip IQ file removing samples < level.
--debug <flags>          Debug mode (verbose), see README for details.
--help                   Show this help.

--tpu-max-candidates <n> Max preamble candidates per block (default: 256).
--tpu-batch <n>          IQ buffers demodulated per device dispatch
                         (default: 64 for files with device resolve, 16
                         otherwise, 1 for stdin/pipes).
--tpu-profile <dir>      Write a jax.profiler trace of the decode to <dir>
                         (view with TensorBoard / xprof).
--tpu-state-load <file>  Restore tracker/ICAO-cache/stats snapshot at start.
--tpu-state-save <file>  Save a state snapshot on exit (checkpoint/resume).
--tpu-backend <name>     JAX platform to use (e.g. cpu, tpu; default: auto).
--tpu-device-resolve <m> on|off|auto: run the sequential candidate resolver
                         on the device too (all file-decode modes except
                         --debug dumps; auto = on for TPU backends).
--tpu-shard-time <n>     Shard each buffer's timeline over <n> devices with
                         overlap-save halo exchange (multi-chip decode of
                         one stream; bit-identical to the unsharded path).
--tpu-front <name>       Preamble-scan formulation: mask or
                         packed[-plain][-mxu] (default: mask on TPU,
                         packed on CPU).  All bit-identical; see
                         ops/demod.py:front_variant.
--tpu-dispatch-ahead <n> Device-resolve dispatch groups held in flight
                         before the oldest is fetched (0 = auto: 3 for
                         seekable files, 1 for live/looped/throttled —
                         deeper queues hide fetch jitter, +10-12%
                         sustained chip-measured; bit-identical output).
--tpu-preload <m>        auto|staged|off: device preload of regular files
                         before the first dispatch (auto,
                         throughput-optimal), one group then the rest
                         during the first compile (staged,
                         latency-optimal), or always stream via the
                         reader thread (off).

Debug mode flags: d = Log frames decoded with errors
                  D = Log frames decoded with zero errors
                  c = Log frames with bad CRC
                  C = Log frames with good CRC
                  p = Log frames with bad preamble
                  n = Log network debugging info
                  j = Log frames to frames.js, loadable by debug.html.
"""


def get_term_rows() -> int:
    """Terminal row count for the interactive TUI (getTermRows,
    dump1090.c:2781-2785: TIOCGWINSZ on stdout).  The reference calls this
    unconditionally at config time (dump1090.c:316); where its ioctl fails
    (stdout not a tty) it reads uninitialized memory — we deterministically
    fall back to the 15-row compile-time default instead."""
    import os

    try:
        return os.get_terminal_size(sys.stdout.fileno()).lines
    except (OSError, ValueError, AttributeError):
        return INTERACTIVE_ROWS


class Options:
    def __init__(self):
        self.gain = 999999
        self.dev_index = 0
        self.enable_agc = False
        self.freq = 1090000000
        self.ppm = 0
        self.filename: str | None = None
        self.loop = False
        self.fix_errors = True
        self.check_crc = True
        self.raw = False
        self.net = False
        self.net_only = False
        self.onlyaddr = False
        self.debug = ""
        self.interactive = False
        self.interactive_rows = get_term_rows()
        self.interactive_ttl = INTERACTIVE_TTL
        self.aggressive = False
        self.stats = False
        self.metric = False
        self.snip: int | None = None
        self.ro_port = 30002
        self.ri_port = 30001
        self.http_port = 8080
        self.sbs_port = 30003
        self.max_candidates = 256
        self.batch: int | None = None   # buffers per device dispatch
        self.backend: str | None = None
        self.device_resolve = "auto"
        self.preload = "auto"
        self.dispatch_ahead = 0
        self.shard_time: int | None = None
        self.profile_dir: str | None = None
        self.state_load: str | None = None
        self.state_save: str | None = None


def _c_atoi(s: str) -> int:
    """C atoi/strtoll(,,10) semantics for reference-flag values: parse the
    longest leading integer prefix, 0 on junk — never an exception
    (dump1090.c:2860-2925 converts every numeric flag this way)."""
    import re

    m = re.match(r"[ \t\n\r\f\v]*[+-]?[0-9]+", s)
    return int(m.group()) if m else 0


def _c_atof(s: str) -> float:
    """C atof: longest leading float prefix, 0.0 on junk (--gain)."""
    import re

    m = re.match(r"[ \t\n\r\f\v]*[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?", s)
    return float(m.group()) if m else 0.0


def parse_args(argv: list[str]) -> Options:
    o = Options()
    j = 0
    while j < len(argv):
        arg = argv[j]
        more = j + 1 < len(argv)

        def nxt() -> str:
            nonlocal j
            j += 1
            return argv[j]

        if arg == "--device-index" and more:
            o.dev_index = _c_atoi(nxt())
        elif arg == "--gain" and more:
            o.gain = int(_c_atof(nxt()) * 10)
        elif arg == "--enable-agc":
            o.enable_agc = True
        elif arg == "--freq" and more:
            o.freq = _c_atoi(nxt())
        elif arg == "--ppm" and more:
            o.ppm = _c_atoi(nxt())
        elif arg == "--ifile" and more:
            o.filename = nxt()
        elif arg == "--loop":
            o.loop = True
        elif arg == "--no-fix":
            o.fix_errors = False
        elif arg == "--no-crc-check":
            o.check_crc = False
        elif arg == "--raw":
            o.raw = True
        elif arg == "--net":
            o.net = True
        elif arg == "--net-only":
            o.net = True
            o.net_only = True
        elif arg == "--net-ro-port" and more:
            o.ro_port = _c_atoi(nxt())
        elif arg == "--net-ri-port" and more:
            o.ri_port = _c_atoi(nxt())
        elif arg == "--net-http-port" and more:
            o.http_port = _c_atoi(nxt())
        elif arg == "--net-sbs-port" and more:
            o.sbs_port = _c_atoi(nxt())
        elif arg == "--onlyaddr":
            o.onlyaddr = True
        elif arg == "--metric":
            o.metric = True
        elif arg == "--aggressive":
            o.aggressive = True
        elif arg == "--interactive":
            o.interactive = True
        elif arg == "--interactive-rows" and more:
            o.interactive_rows = _c_atoi(nxt())
        elif arg == "--interactive-ttl" and more:
            o.interactive_ttl = _c_atoi(nxt())
        elif arg == "--debug" and more:
            flags = nxt()
            for f in flags:
                if f not in "dDcCpnj":
                    sys.stderr.write(f"Unknown debugging flag: {f}\n")
                    raise SystemExit(1)
            o.debug = flags
        elif arg == "--stats":
            o.stats = True
        elif arg == "--snip" and more:
            o.snip = _c_atoi(nxt())
        elif arg == "--tpu-max-candidates" and more:
            o.max_candidates = int(nxt())
        elif arg == "--tpu-batch" and more:
            o.batch = int(nxt())
        elif arg == "--tpu-profile" and more:
            o.profile_dir = nxt()
        elif arg == "--tpu-state-load" and more:
            o.state_load = nxt()
        elif arg == "--tpu-state-save" and more:
            o.state_save = nxt()
        elif arg == "--tpu-backend" and more:
            o.backend = nxt()
        elif arg == "--tpu-shard-time" and more:
            o.shard_time = int(nxt())
        elif arg == "--tpu-front" and more:
            # validate eagerly (front_candidates would only throw at trace
            # time, deep inside the first dispatch)
            v = nxt()
            toks = v.split("-")
            if not (v == "mask" or (toks[0] == "packed"
                                    and set(toks[1:]) <= {"plain", "mxu"})):
                sys.stderr.write(
                    f"--tpu-front: expected mask|packed[-plain][-mxu], got "
                    f"'{v}'.\n"
                )
                raise SystemExit(1)
            import os

            os.environ["DUMP1090_TPU_FRONT"] = v
        elif arg == "--tpu-dispatch-ahead" and more:
            o.dispatch_ahead = _c_atoi(nxt())
        elif arg == "--tpu-preload" and more:
            o.preload = nxt()
            if o.preload not in ("auto", "staged", "off"):
                sys.stderr.write(
                    f"--tpu-preload: expected auto|staged|off, got "
                    f"'{o.preload}'.\n"
                )
                raise SystemExit(1)
        elif arg == "--tpu-device-resolve" and more:
            o.device_resolve = nxt()
            if o.device_resolve not in ("on", "off", "auto"):
                sys.stderr.write(
                    f"--tpu-device-resolve: expected on|off|auto, got "
                    f"'{o.device_resolve}'.\n"
                )
                raise SystemExit(1)
        elif arg == "--help":
            sys.stdout.write(HELP)
            raise SystemExit(0)
        else:
            sys.stderr.write(
                f"Unknown or not enough arguments for option '{arg}'.\n\n"
            )
            sys.stdout.write(HELP)
            raise SystemExit(1)
        j += 1
    return o


def apply_backend(backend: str) -> None:
    """Pin the JAX platform for --tpu-backend.

    The env-var route (JAX_PLATFORMS) is NOT enough: a runtime that registers
    its TPU plugin programmatically (e.g. via sitecustomize) wins over the
    env var, and an env var already exported by the shell would beat the
    explicit flag.  `jax.config.update` wins over both — the same mechanism
    the test conftest uses.  Must run before any jax computation."""
    import os

    os.environ["JAX_PLATFORMS"] = backend  # subprocesses inherit the choice
    import jax

    jax.config.update("jax_platforms", backend)


def snip_mode(level: int) -> None:
    """IQ thinning filter: drop runs of >32 consecutive low samples
    (snipMode, dump1090.c:2226-2244)."""
    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    c = 0
    while True:
        pair = stdin.read(2)
        if len(pair) < 2:
            break
        i, q = pair[0], pair[1]
        if abs(i - 127) < level and abs(q - 127) < level:
            c += 1
            if c > 8 * 4:
                continue
        else:
            c = 0
        stdout.write(pair)
    stdout.flush()


def print_stats(stats) -> None:
    """Exit stats printer, byte-identical to dump1090.c:2993-3006."""
    print(f"{stats.valid_preamble} valid preambles")
    print(f"{stats.out_of_phase} demodulated again after phase correction")
    print(f"{stats.demodulated} demodulated with zero errors")
    print(f"{stats.goodcrc} with good crc")
    print(f"{stats.badcrc} with bad crc")
    print(f"{stats.fixed} errors corrected")
    print(f"{stats.single_bit_fix} single bit errors")
    print(f"{stats.two_bits_fix} two bits errors")
    print(f"{stats.goodcrc + stats.fixed} total usable messages")


def main(argv: list[str] | None = None) -> int:
    o = parse_args(sys.argv[1:] if argv is None else argv)

    # C process semantics on a closed stdout pipe: die of SIGPIPE (the
    # reference only ignores SIGPIPE in net mode, dump1090.c:2294) —
    # `... --raw | head` must not print a BrokenPipeError traceback or keep
    # decoding.  Python's default handler turns SIGPIPE into an exception;
    # restore SIG_DFL for non-net runs.
    if not o.net:
        import signal

        try:
            signal.signal(signal.SIGPIPE, signal.SIG_DFL)
        except (ValueError, OSError, AttributeError):
            pass  # non-main thread / non-POSIX: keep Python's default

    if o.snip is not None:
        snip_mode(o.snip)
        return 0

    import os

    if o.backend:
        apply_backend(o.backend)

    # persistent XLA compilation cache: the demod program compiles once per
    # (block size, max_candidates) ever, not once per process.  Only for
    # invocations that will actually compile (--net-only never touches jax,
    # and an unwritable HOME must not break it).
    if o.filename is not None and not o.net_only and not os.environ.get(
        "JAX_COMPILATION_CACHE_DIR"
    ):
        try:
            cache = os.path.expanduser("~/.cache/dump1090_tpu/jax")
            os.makedirs(cache, exist_ok=True)
            import jax

            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except OSError:
            pass

    from .models.decoder import (
        DecoderConfig,
        DecoderStats,
        IcaoCache,
        decode_hex_message,
    )
    from .models.hub import HubConfig, MessageHub
    from .models.tracker import AircraftTracker
    from .utils import display as disp

    dcfg = DecoderConfig(
        fix_errors=o.fix_errors, check_crc=o.check_crc, aggressive=o.aggressive
    )
    hub_cfg = HubConfig(
        raw=o.raw,
        onlyaddr=o.onlyaddr,
        check_crc=o.check_crc,
        interactive=o.interactive,
        net=o.net,
        stats_only=o.stats,
        metric=o.metric,
    )
    tracker = AircraftTracker(interactive_ttl=o.interactive_ttl)

    # decode state: the demod pipeline owns cache+stats in file mode; in
    # net-only mode there is no pipeline, so create them standalone
    pipeline = None
    if o.filename is not None and not o.net_only:
        from .models.pipeline import DemodPipeline, PipelineConfig
        from .utils.debug import DebugFlags

        # batched device dispatch for seekable files; single-buffer (65 ms
        # latency) for live stdin feeds.  The device-resolve path amortizes
        # per-dispatch overhead best around 64+ buffers (bench.py)
        if o.device_resolve == "auto":
            from .ops.resolve import use_device_resolve as _udr

            dev_batching = _udr()
        else:
            dev_batching = o.device_resolve == "on"
        default_batch = 64 if dev_batching else 16
        batch = o.batch if o.batch is not None else (
            1 if o.filename == "-" else default_batch
        )
        pipeline = DemodPipeline(
            PipelineConfig(
                decoder=dcfg, max_candidates=o.max_candidates, loop=o.loop,
                batch_buffers=1 if o.interactive else batch,
                # the reference slows --ifile playback in interactive mode
                # (usleep(5000) per 65.5 ms buffer, dump1090.c:471-477)
                throttle_s=0.005 if o.interactive else 0.0,
                # group dispatches on the device-resolve path for seekable
                # files (amortizes per-round-trip floors); single-group for
                # live/interactive feeds
                dispatch_groups=(
                    8 if dev_batching and not o.interactive
                    and o.filename != "-" else 1
                ),
                preload=o.preload,
                dispatch_ahead=o.dispatch_ahead,
            ),
            debug_flags=DebugFlags.parse(o.debug) if o.debug else None,
        )
        stats, cache = pipeline.stats, pipeline.cache
    else:
        stats, cache = DecoderStats(), IcaoCache()

    hub = MessageHub(hub_cfg, tracker, stats)

    # Decode state (ICAO cache, stats, tracker, stdout) is mutated both by
    # the file-decode thread and by raw network input arriving on the
    # asyncio thread; the reference is single-threaded (it polls sockets
    # between buffers, dump1090.c:2831-2847), so serialize the two here.
    # Reentrant: the pipeline holds it across resolve+emit, and the emit
    # callback re-acquires it around hub.use_message.
    import threading

    state_lock = threading.RLock()
    if pipeline is not None:
        pipeline._lock = state_lock

    # TUI redraw guard: a plain (non-reentrant) lock held while the main
    # thread mutates tracker state, so the SIGWINCH handler — which runs
    # between arbitrary bytecodes on the SAME thread — redraws immediately
    # only when the tracker is consistent, and just records the new row
    # count otherwise (the reference redraws unconditionally from the
    # handler, C's version of the same hazard; dump1090.c:2772-2777)
    tui_guard = threading.Lock()

    # live terminal resize, like the reference (sigWinchCallback,
    # installed at dump1090.c:2940)
    if o.interactive:
        _install_sigwinch(o, tracker, state_lock, tui_guard)

    if o.state_load:
        from .utils import state as state_mod

        state_mod.load(o.state_load, tracker, cache, stats)

    net = None
    if o.net:
        from .io.net import NetConfig, NetworkServices

        def on_raw_line(line: str) -> None:
            with state_lock:
                mm = decode_hex_message(line, cache, dcfg, stats)
                if mm is not None:
                    hub.use_message(mm)

        def bump(attr: str) -> None:
            setattr(stats, attr, getattr(stats, attr) + 1)

        net = NetworkServices(
            NetConfig(
                ro_port=o.ro_port,
                ri_port=o.ri_port,
                http_port=o.http_port,
                sbs_port=o.sbs_port,
                debug_net="n" in o.debug,
            ),
            on_raw_line=on_raw_line,
            data_json=lambda: disp.aircraft_json(tracker, o.metric),
            on_http_request=lambda: bump("http_requests"),
            on_sbs_connect=lambda: bump("sbs_connections"),
        )
        hub.raw_sink = net.broadcast_raw
        hub.sbs_sink = net.broadcast_sbs
        try:
            net.start()
        except OSError:
            # reference order: main announces net-only mode (dump1090.c:2945)
            # before modesInitNet fails the bind (:2282-2289), both on stderr
            if o.net_only:
                sys.stderr.write("Net-only mode, no RTL device or file open.\n")
            sys.stderr.write(net.bind_error_message() + "\n")
            return 1

    try:
        if o.net_only:
            sys.stderr.write("Net-only mode, no RTL device or file open.\n")
            last_refresh = 0.0
            while True:
                time.sleep(0.1)
                if not o.interactive:
                    with state_lock:
                        tracker.remove_stale()
                # TUI refresh gated at 250 ms like backgroundTasks
                # (MODES_INTERACTIVE_REFRESH_TIME, dump1090.c:89, 2839-2846);
                # the refresh itself evicts stale aircraft under the lock
                elif time.time() - last_refresh > 0.25:
                    _interactive_refresh(tracker, o, state_lock, tui_guard)
                    last_refresh = time.time()
            return 0  # unreachable

        sdr = None
        if o.filename is None:
            # live RTL-SDR capture (modesInitRTLSDR, dump1090.c:385-434):
            # bind librtlsdr at runtime; degrade cleanly when absent
            from .io.rtlsdr import RtlSdrError, RtlSdrSource, RtlSdrUnavailable

            try:
                sdr = RtlSdrSource(
                    dev_index=o.dev_index, gain=o.gain,
                    enable_agc=o.enable_agc, freq=o.freq, ppm=o.ppm,
                )
            except RtlSdrUnavailable as e:
                sys.stderr.write(
                    f"No RTL-SDR support on this host ({e}): provide "
                    "--ifile (use '-' for stdin) or --net-only.\n"
                )
                return 1
            except RtlSdrError:
                return 1  # enumeration/open error already printed, like exit(1)

            from .models.pipeline import DemodPipeline, PipelineConfig
            from .utils.debug import DebugFlags

            pipeline = DemodPipeline(
                PipelineConfig(
                    decoder=dcfg, max_candidates=o.max_candidates,
                    batch_buffers=1,  # 65 ms latency per device dispatch
                    dispatch_ahead=o.dispatch_ahead,
                ),
                debug_flags=DebugFlags.parse(o.debug) if o.debug else None,
                lock=state_lock,
            )
            stats, cache = pipeline.stats, pipeline.cache
            hub.stats = stats
            if o.state_load:
                # the snapshot was restored into the standalone objects
                # before the device path existed; restore again into the
                # pipeline's own cache/stats so it is not silently dropped.
                # Under the state lock: the net thread may already be
                # decoding into the same tracker/cache
                from .utils import state as state_mod

                with state_lock:
                    state_mod.load(o.state_load, tracker, cache, stats)

        from .io.sources import open_iq_source

        try:
            stream = open_iq_source(o.filename) if o.filename else None
        except OSError as e:
            # reference: perror("Opening data file") + exit(1),
            # dump1090.c:2952-2953
            print(f"Opening data file: {e.strerror}", file=sys.stderr)
            return 1
        last_refresh = [0.0]
        t_start = time.time()
        profiler_cm = None
        if o.profile_dir:
            import jax

            profiler_cm = jax.profiler.trace(o.profile_dir)
            profiler_cm.__enter__()

        def on_message(mm) -> None:
            # inline emission: keeps --debug dumps and message display
            # interleaved in scan order, exactly like the reference.  The
            # tui_guard marks the tracker-mutating region so a SIGWINCH
            # arriving mid-update defers its redraw
            with state_lock, tui_guard:
                hub.use_message(mm)
            if o.interactive:
                now = time.time()
                if now - last_refresh[0] > 0.25:
                    _interactive_refresh(tracker, o, state_lock, tui_guard)
                    last_refresh[0] = now

        # pure --raw / --stats with no other consumers: bulk fast paths
        # (file decode only; live SDR uses the low-latency streaming path)
        solo = (
            sdr is None and not o.interactive and not o.net and not o.onlyaddr
            and o.check_crc and not o.debug
        )
        # fully-fused device path: demod AND the sequential resolve on the
        # TPU (ops/resolve.py); host only formats hex lines
        if o.device_resolve == "auto":
            from .ops.resolve import use_device_resolve

            use_dev = use_device_resolve()
        else:
            use_dev = o.device_resolve == "on"
        fast_dev = solo and (o.raw or o.stats) and use_dev
        # host-resolver bulk path (native C++ runtime, no per-message objects)
        fast_raw = (
            solo and o.raw and not o.stats and not fast_dev
            and getattr(pipeline, "_native", None) is not None
        )
        try:
            if sdr is not None:
                if use_dev and not o.debug:
                    # live capture with demod AND sequential resolve on the
                    # device (65 ms buffer latency; upload of buffer N+1
                    # overlaps buffer N's resolve on the ingest thread)
                    pipeline.run_source_device(sdr.buffers(), on_message)
                else:
                    pipeline.run_source(sdr.buffers(), on_message)
            elif o.shard_time:
                # multi-chip single-stream decode: timeline sharded over the
                # sp mesh axis with ppermute halo exchange (SURVEY §2.5)
                from .api import decode_capture_sharded

                progress = {"samples": 0}
                decode_capture_sharded(
                    stream, sp=o.shard_time, config=dcfg, stats=stats,
                    cache=cache, emit=on_message,
                    max_candidates=o.max_candidates, progress=progress,
                    lock=state_lock,
                )
                pipeline.samples_in = progress["samples"]
            elif fast_dev:
                w = sys.stdout.buffer
                for line in pipeline.stream_raw_device(stream):
                    # --stats mode emits nothing (hub drops all output)
                    if line and o.raw and not o.stats:
                        w.write(line)
                        w.flush()
            elif fast_raw:
                from .native import records_to_raw_lines

                w = sys.stdout.buffer
                for rec in pipeline.stream_records(stream):
                    line = records_to_raw_lines(rec)
                    if line:
                        w.write(line)
                        w.flush()
            elif use_dev and not o.debug:
                # full-fidelity hub path (verbose/SBS/tracker/net) with the
                # sequential resolve on the device; host field decode is
                # stateless (models/decoder.py message_from_device)
                pipeline.run_device(stream, on_message)
            else:
                pipeline.run(stream, on_message)
            if o.interactive:
                # final state stays visible
                _interactive_refresh(tracker, o, state_lock, tui_guard)
        finally:
            if profiler_cm is not None:
                profiler_cm.__exit__(None, None, None)
            if o.stats:
                # framework throughput meter (stderr keeps stdout byte-exact)
                dt = max(time.time() - t_start, 1e-9)
                ns = pipeline.samples_in * 1.0
                sys.stderr.write(
                    f"# {ns/1e6:.1f} Msamples in {dt:.2f}s = "
                    f"{ns/dt/1e6:.1f} Msamples/s ({ns/dt/2e6:.0f}x realtime)\n"
                )
            if sdr is not None:
                sdr.close()
            if stream is not None and stream is not sys.stdin.buffer:
                stream.close()
    except KeyboardInterrupt:
        return 0
    finally:
        if net:
            net.stop()
        if o.state_save:
            from .utils import state as state_mod

            state_mod.save(o.state_save, tracker, cache, stats)

    if o.stats and o.filename:
        print_stats(stats)
    return 0


def _install_sigwinch(o, tracker, state_lock, tui_guard) -> None:
    """Re-read the terminal height and redraw on resize (sigWinchCallback,
    dump1090.c:2772-2777; installed for --interactive at dump1090.c:2940).

    The handler runs between arbitrary bytecodes on the main thread, so it
    redraws only when the tracker is not mid-mutation (tui_guard free);
    otherwise the new row count simply takes effect at the next refresh."""
    import signal

    def _winch(sig, frame):
        o.interactive_rows = get_term_rows()
        if tui_guard.acquire(blocking=False):
            try:
                _interactive_refresh(tracker, o, state_lock, None)
            finally:
                tui_guard.release()

    try:
        signal.signal(signal.SIGWINCH, _winch)
    except (ValueError, AttributeError):
        pass  # non-main thread or platform without SIGWINCH


def _interactive_refresh(tracker, o, state_lock=None, tui_guard=None) -> None:
    """Evict stale aircraft and redraw the table — under the state lock (the
    asyncio net thread mutates the same tracker) and flagged via tui_guard
    so a concurrent SIGWINCH defers its own redraw."""
    import contextlib
    import shutil

    from .utils import display as disp

    with (state_lock or contextlib.nullcontext()), \
         (tui_guard or contextlib.nullcontext()):
        tracker.remove_stale()
        rows = o.interactive_rows or (shutil.get_terminal_size().lines)
        now = int(time.time())
        screen = disp.interactive_screen(
            tracker, rows=rows, metric=o.metric, now=now, spinner_t=now
        )
    sys.stdout.write(screen)
    sys.stdout.flush()


if __name__ == "__main__":
    raise SystemExit(main())
