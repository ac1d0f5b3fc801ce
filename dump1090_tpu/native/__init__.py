"""Native host runtime bindings (ctypes over modes_native.cpp).

The C++ library implements the sequential candidate resolver and the full
frame decoder (the host half of the host/device split; see modes_native.cpp
for the behavioral contract).  It is compiled lazily with g++ on first use —
no pybind11 in this image, and committing binaries would pin one machine's
ABI.  Every entry point has a pure-Python twin (models/resolver.py,
models/decoder.py) used as the fallback and as the differential-test oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "modes_native.cpp"
_SO = _DIR / "modes_native.so"

# POD mirror of struct Record in modes_native.cpp (packed, order-exact).
RECORD_DTYPE = np.dtype(
    [
        ("msg", np.uint8, (14,)),
        ("msgbits", np.uint8),
        ("msgtype", np.uint8),
        ("crcok", np.uint8),
        ("phase_corrected", np.uint8),
        ("crc", np.int32),
        ("errorbit", np.int32),
        ("aa1", np.uint8),
        ("aa2", np.uint8),
        ("aa3", np.uint8),
        ("ca", np.uint8),
        ("iid", np.int32),
        ("metype", np.uint8),
        ("mesub", np.uint8),
        ("heading_is_valid", np.uint8),
        ("aircraft_type", np.uint8),
        ("heading", np.int32),
        ("fflag", np.int32),
        ("tflag", np.int32),
        ("raw_latitude", np.int32),
        ("raw_longitude", np.int32),
        ("flight", "S9"),
        ("ew_dir", np.uint8),
        ("ns_dir", np.uint8),
        ("vert_rate_source", np.uint8),
        ("vert_rate_sign", np.uint8),
        ("ew_velocity", np.int32),
        ("ns_velocity", np.int32),
        ("vert_rate", np.int32),
        ("velocity", np.int32),
        ("movement", np.int32),
        ("movement_valid", np.int32),
        ("ground_track", np.int32),
        ("ground_track_valid", np.int32),
        ("fs", np.uint8),
        ("dr", np.uint8),
        ("um", np.uint8),
        ("unit", np.uint8),
        ("identity", np.int32),
        ("altitude", np.int32),
        ("pos", np.int32),
    ],
    align=False,
)

STATS_FIELDS = (
    "valid_preamble",
    "out_of_phase",
    "demodulated",
    "goodcrc",
    "badcrc",
    "fixed",
    "single_bit_fix",
    "two_bits_fix",
)

_lib = None
_lib_failed = False


def _build() -> None:
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load():
    """Load (building if needed) the native library; None if unavailable.

    Set DUMP1090_TPU_NO_NATIVE=1 to force the pure-Python host path.
    """
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("DUMP1090_TPU_NO_NATIVE"):
        _lib_failed = True
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.d1090_record_size.restype = ctypes.c_int64
        if lib.d1090_record_size() != RECORD_DTYPE.itemsize:
            raise RuntimeError(
                f"record layout drift: C++ {lib.d1090_record_size()} B vs "
                f"dtype {RECORD_DTYPE.itemsize} B"
            )
        lib.d1090_create.restype = ctypes.c_void_p
        lib.d1090_destroy.argtypes = [ctypes.c_void_p]
        lib.d1090_checksum.restype = ctypes.c_uint32
        lib.d1090_resolve_block.restype = ctypes.c_int64
        lib.d1090_resolve_blocks.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:  # missing toolchain, compile error, ABI drift
        sys.stderr.write(f"dump1090_tpu: native runtime unavailable ({e}); "
                         "using pure-Python host path\n")
        _lib_failed = True
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeResolver:
    """Drop-in native replacement for models.resolver.resolve_block.

    Shares the caller's IcaoCache arrays and DecoderStats object, so the
    Python network-input decode path and this resolver observe one state.
    """

    def __init__(self, lib=None):
        self._lib = lib or load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._state = self._lib.d1090_create()
        self._out = np.zeros(4096, dtype=RECORD_DTYPE)

    def __del__(self):
        try:
            if getattr(self, "_state", None):
                self._lib.d1090_destroy(self._state)
        except Exception:
            pass

    def resolve_block(self, cands, cache, cfg, stats, emit) -> None:
        """Exact twin of models.resolver.resolve_block (no debug path —
        callers requesting --debug dumps use the Python resolver)."""
        records = self.resolve_block_records(cands, cache, cfg, stats)
        for mm in records_to_messages(records):
            emit(mm)

    def resolve_block_records(self, cands, cache, cfg, stats) -> np.ndarray:
        """Like resolve_block, but returns the packed Record array directly
        (a copy) instead of wrapping rows in message objects — the bulk path
        for consumers that post-process records vectorially (e.g. the CLI's
        pure --raw mode)."""
        n = len(cands.pos)
        if n == 0:
            return np.empty(0, dtype=RECORD_DTYPE)
        if self._out.shape[0] < 2 * n:
            self._out = np.zeros(2 * n, dtype=RECORD_DTYPE)
        pos = np.ascontiguousarray(cands.pos, dtype=np.int32)
        msg1 = np.ascontiguousarray(cands.msg1, dtype=np.uint8)
        errors1 = np.ascontiguousarray(cands.errors1, dtype=np.int32)
        gate1 = np.ascontiguousarray(cands.gate1).view(np.uint8)
        msg2 = np.ascontiguousarray(cands.msg2, dtype=np.uint8)
        errors2 = np.ascontiguousarray(cands.errors2, dtype=np.int32)
        gate2 = np.ascontiguousarray(cands.gate2).view(np.uint8)
        deltas = np.zeros(len(STATS_FIELDS), dtype=np.int64)
        now = cache.clock()
        n_out = self._lib.d1090_resolve_block(
            ctypes.c_void_p(self._state), _ptr(pos), _ptr(msg1), _ptr(errors1),
            _ptr(gate1), _ptr(msg2), _ptr(errors2), _ptr(gate2),
            ctypes.c_int64(n), _ptr(cache.addr), _ptr(cache.ts),
            ctypes.c_int64(now), ctypes.c_int32(int(cfg.fix_errors)),
            ctypes.c_int32(int(cfg.aggressive)), _ptr(deltas),
            _ptr(self._out), ctypes.c_int64(self._out.shape[0]),
        )
        if n_out < 0:
            raise OverflowError("native resolver output overflow")
        for name, d in zip(STATS_FIELDS, deltas.tolist()):
            setattr(stats, name, getattr(stats, name) + d)
        return self._out[:n_out].copy()

    def resolve_blocks_records(self, cand_host, n_arr, cache, cfg, stats):
        """Resolve a whole batch in ONE native call.

        cand_host: the (NB, MC, ...) kernel output arrays as host numpy
        (pos, msg1, errors1, gate1, msg2, errors2, gate2 — the Candidates
        field order minus n); n_arr: exact per-row counts.  Returns
        (records, counts) with records concatenated in row order, or raises
        OverflowError(row) if a row's count exceeds MC."""
        pos, msg1, errors1, gate1, msg2, errors2, gate2 = cand_host
        nb, mc = pos.shape
        # PRECONDITION check BEFORE the native call: resolving rows mutates
        # the shared ICAO cache as it goes, so an overflow must be detected
        # while the state is still untouched (the caller's per-row fallback
        # re-resolves from this exact state)
        if int(n_arr.max(initial=0)) > mc:
            raise OverflowError(int(np.argmax(n_arr)))
        cap = 2 * nb * mc + 1
        if self._out.shape[0] < cap:
            self._out = np.zeros(cap, dtype=RECORD_DTYPE)
        pos = np.ascontiguousarray(pos, dtype=np.int32)
        msg1 = np.ascontiguousarray(msg1, dtype=np.uint8)
        errors1 = np.ascontiguousarray(errors1, dtype=np.int32)
        gate1 = np.ascontiguousarray(gate1).view(np.uint8)
        msg2 = np.ascontiguousarray(msg2, dtype=np.uint8)
        errors2 = np.ascontiguousarray(errors2, dtype=np.int32)
        gate2 = np.ascontiguousarray(gate2).view(np.uint8)
        n32 = np.ascontiguousarray(n_arr, dtype=np.int32)
        counts = np.zeros(nb, dtype=np.int64)
        deltas = np.zeros(len(STATS_FIELDS), dtype=np.int64)
        total = self._lib.d1090_resolve_blocks(
            ctypes.c_void_p(self._state), _ptr(pos), _ptr(msg1), _ptr(errors1),
            _ptr(gate1), _ptr(msg2), _ptr(errors2), _ptr(gate2), _ptr(n32),
            ctypes.c_int64(nb), ctypes.c_int64(mc),
            _ptr(cache.addr), _ptr(cache.ts), ctypes.c_int64(cache.clock()),
            ctypes.c_int32(int(cfg.fix_errors)),
            ctypes.c_int32(int(cfg.aggressive)), _ptr(deltas),
            _ptr(self._out), ctypes.c_int64(self._out.shape[0]), _ptr(counts),
        )
        if total < 0:  # unreachable given the precondition check above
            raise RuntimeError(f"native batch resolve failed ({total})")
        for name, d in zip(STATS_FIELDS, deltas.tolist()):
            setattr(stats, name, getattr(stats, name) + d)
        return self._out[:total].copy(), counts

    def decode_one(self, raw: bytes, cache, cfg, stats=None):
        """Native twin of models.decoder.decode_message."""
        buf = np.zeros(14, dtype=np.uint8)
        b = np.frombuffer(bytes(raw), dtype=np.uint8)[:14]
        buf[: len(b)] = b
        out = np.zeros(1, dtype=RECORD_DTYPE)
        deltas = np.zeros(len(STATS_FIELDS), dtype=np.int64)
        self._lib.d1090_decode_one(
            ctypes.c_void_p(self._state), _ptr(buf), _ptr(out),
            _ptr(cache.addr), _ptr(cache.ts), ctypes.c_int64(cache.clock()),
            ctypes.c_int32(int(cfg.fix_errors)),
            ctypes.c_int32(int(cfg.aggressive)), _ptr(deltas),
        )
        if stats is not None:
            for name, d in zip(STATS_FIELDS, deltas.tolist()):
                setattr(stats, name, getattr(stats, name) + d)
        return records_to_messages(out)[0]


class RecordMessage:
    """Lazily materialized ModesMessage: wraps one packed native Record and
    becomes a real ModesMessage (via __class__ swap) on the first access to
    any field other than `crcok`.

    Rationale: the message hub drops bad-CRC frames after reading only
    `crcok` (useModesMessage, dump1090.c:1802-1803), so in the default
    configuration the Python-object conversion cost is paid only for usable
    messages — the dominant host cost at dense-traffic throughput."""

    def __init__(self, row, crcok: bool):
        d = object.__getattribute__(self, "__dict__")
        d["crcok"] = crcok
        d["_row"] = row

    def __getattr__(self, name):
        if name.startswith("__"):
            # dunder probes (copy/pickle/inspect protocols) must not consume
            # the packed record — materialize only for real field access
            raise AttributeError(name)
        from ..models.decoder import ModesMessage

        dd = object.__getattribute__(self, "__dict__")
        row = dd.pop("_row", None)
        if row is None:
            raise AttributeError(name)
        d = dict(zip(row.dtype.names, row.tolist()))
        d["msg"] = bytes(d["msg"])
        d["flight"] = d["flight"].split(b"\0")[0].decode("ascii", "replace")
        d["crcok"] = bool(d["crcok"])
        d["phase_corrected"] = bool(d["phase_corrected"])
        d.pop("pos")
        dd.update(d)
        # from here on this IS a ModesMessage (addr/hexaddr properties,
        # dataclass __eq__/__repr__/asdict all behave identically)
        object.__setattr__(self, "__class__", ModesMessage)
        return getattr(self, name)


def records_to_messages(records: np.ndarray) -> list:
    """Wrap packed Record rows as lazily materialized ModesMessage objects.

    `records` must own its data (rows hold views into it); callers pass a
    fresh copy per block."""
    if "__dataclass_fields__" not in RecordMessage.__dict__:
        # dataclasses.asdict/fields() probe the *type*, bypassing __getattr__;
        # mirror the dataclass metadata so a RecordMessage quacks fully
        from ..models.decoder import ModesMessage

        RecordMessage.__dataclass_fields__ = ModesMessage.__dataclass_fields__
        RecordMessage.__dataclass_params__ = ModesMessage.__dataclass_params__
    crcok = records["crcok"].tolist()
    return [RecordMessage(row, ok != 0) for row, ok in zip(records, crcok)]


def records_to_raw_lines(records: np.ndarray, upper: bool = False) -> bytes:
    """Vectorized `*<hex>;\n` lines for the good-CRC records of a block —
    the bulk form of displayModesMessage's --raw branch + modesSendRawOutput
    (dump1090.c:1317-1324, 2381-2393).  Pure array ops end to end: lines are
    scattered into one output buffer at cumulative offsets (no per-message
    Python loop; this formatter sits on the sustained-throughput path)."""
    return raw_lines_from_fields(
        records["msg"], records["msgbits"], records["crcok"] != 0, upper=upper
    )


def raw_lines_from_fields(
    msg: np.ndarray, msgbits: np.ndarray, crcok: np.ndarray, upper: bool = False
) -> bytes:
    """`*<hex>;\n` stream for (N, 14) message bytes + per-message bit lengths,
    keeping only crcok rows.  Fully vectorized: every line is built in a
    fixed 31-byte row (hex arithmetic, no table gathers), short messages get
    their terminator rewritten in place, and the variable-length stream is a
    single boolean compaction of the row matrix."""
    ok = np.asarray(crcok)
    if ok.all():  # device-resolve path: rows are pre-filtered
        m = np.ascontiguousarray(msg)
        bits_ok = np.asarray(msgbits)
    else:
        m = np.ascontiguousarray(np.asarray(msg)[ok])
        bits_ok = np.asarray(msgbits)[ok]
    n = m.shape[0]
    if n == 0:
        return b""
    a_off = np.uint8((ord("A") if upper else ord("a")) - 10)

    def hexd(v: np.ndarray) -> np.ndarray:
        return v + np.where(v < 10, np.uint8(ord("0")), a_off)

    buf = np.empty((n, 31), dtype=np.uint8)
    buf[:, 0] = ord("*")
    buf[:, 1:29:2] = hexd(m >> 4)
    buf[:, 2:29:2] = hexd(m & 0xF)
    buf[:, 29] = ord(";")
    buf[:, 30] = ord("\n")
    short = bits_ok != 112
    if not short.any():
        return buf.tobytes()
    buf[short, 15] = ord(";")
    buf[short, 16] = ord("\n")
    keep = np.arange(31)[None, :] < np.where(short, 17, 31)[:, None]
    return buf[keep].tobytes()
