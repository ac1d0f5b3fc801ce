"""High-level API: decode_capture / decode_captures (channel batching)."""

from __future__ import annotations

import numpy as np

from dump1090_tpu import api

FIXTURE = "/root/reference/testfiles/modes1.bin"


def test_decode_capture_matches_golden(golden_dir):
    msgs = api.decode_capture(FIXTURE, crcok_only=True)
    got = ["*" + m.msg[: m.msgbits // 8].hex() + ";" for m in msgs]
    want = (golden_dir / "golden_raw.txt").read_text().split()
    assert got == want


def test_decode_capture_accepts_bytes_and_arrays():
    raw = open(FIXTURE, "rb").read()
    a = api.decode_capture(raw, crcok_only=True)
    b = api.decode_capture(np.frombuffer(raw, np.uint8), crcok_only=True)
    assert len(a) == len(b) == 217


def test_decode_captures_channel_batched_matches_solo():
    """Several independent captures decoded with shared dispatches must be
    per-stream identical to solo decode — incl. captures of different
    lengths (exhausted streams pad with silence)."""
    import dataclasses

    raw = open(FIXTURE, "rb").read()
    half = (len(raw) // 2) & ~1
    captures = [raw, raw[:half], raw[half:]]

    batched = api.decode_captures(captures)
    solo = [api.decode_capture(c, batch_buffers=1) for c in captures]
    assert [len(b) for b in batched] == [len(s) for s in solo]
    for bs, ss in zip(batched, solo):
        for x, y in zip(bs, ss):
            assert dataclasses.asdict(x) == dataclasses.asdict(y)


def test_decode_captures_device_resolve_matches_host(modes1_path):
    """decode_captures with per-stream device pipelines == the host-resolve
    strategy, field for field."""
    import dataclasses

    from dump1090_tpu.api import decode_captures

    data = modes1_path.read_bytes()
    caps = [data, data[: 300_000]]
    dev = decode_captures(caps, device_resolve=True)
    host = decode_captures(caps, device_resolve=False)
    assert [len(s) for s in dev] == [len(s) for s in host]
    for sd, sh in zip(dev, host):
        for a, b in zip(sd, sh):
            assert dataclasses.asdict(a) == dataclasses.asdict(b)


def test_decode_captures_device_shares_dispatches(modes1_path, monkeypatch):
    """The device strategy issues ceil(longest/batch) SHARED dispatches for
    ALL streams together (round-3 directive: the per-stream SMEM-cache
    kernel), not one pipeline per capture."""
    import dump1090_tpu.ops.resolve as R

    calls = {"n": 0}
    real = R.demod_resolve_streams

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(R, "demod_resolve_streams", counting)

    data = modes1_path.read_bytes()
    caps = [data, data[:300_000], data[:262_144 + 8]]
    dev = api.decode_captures(caps, device_resolve=True)
    # longest capture = 2 decoded buffers (EOF race drops the tail), at 4
    # buffers/dispatch -> exactly ONE shared dispatch for all 3 streams
    assert calls["n"] == 1
    assert sum(len(s) for s in dev) > 0


def test_decode_captures_device_tiles_under_smem_budget(modes1_path, monkeypatch):
    """When S x NB x mc positions no longer fit the kernel's SMEM prefetch
    budget (sticky mc growth, many captures), the device strategy splits
    into (streams, buffers) tiles instead of crashing — bit-identical
    because skip resets per buffer and cache rows chain between tiles."""
    import dataclasses

    import dump1090_tpu.ops.resolve as R

    calls = {"n": 0}
    real = R.demod_resolve_streams

    def counting(xs, *a, **k):
        calls["n"] += 1
        # every tile must respect the budget the shape helper promised
        s, nb = xs.shape[:2]
        assert s * nb * k["max_candidates"] * 4 <= R.SMEM_PREFETCH_BUDGET
        return real(xs, *a, **k)

    monkeypatch.setattr(R, "demod_resolve_streams", counting)
    # budget below one stream's nb*mc*4 = 4*256*4 = 16 KiB forces a split
    # down to (1 stream, 2 buffers) per dispatch
    monkeypatch.setattr(R, "SMEM_PREFETCH_BUDGET", 3 * 256 * 4)

    data = modes1_path.read_bytes()
    caps = [data, data[:300_000]]
    dev = api.decode_captures(caps, device_resolve=True)
    host = api.decode_captures(caps, device_resolve=False)
    assert calls["n"] > 1  # it really tiled
    assert [len(s) for s in dev] == [len(s) for s in host]
    for sd, sh in zip(dev, host):
        for a, b in zip(sd, sh):
            assert dataclasses.asdict(a) == dataclasses.asdict(b)
