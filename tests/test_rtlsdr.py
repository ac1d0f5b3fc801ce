"""RTL-SDR device-source tests against a stub librtlsdr (tests/stub_rtlsdr.c).

Contract: modesInitRTLSDR + rtlsdrCallback + readerThreadEntryPoint
(dump1090.c:385-458, 516-527) — init sequence/wording, gain selection, the
carry memcpy, and the callback -> buffer -> pipeline plumbing, end to end
through the CLI flags that were previously decorative.
"""

import io
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from dump1090_tpu.constants import DATA_LEN_BYTES

REPO = Path(__file__).resolve().parent.parent
STUB_SRC = REPO / "tests" / "stub_rtlsdr.c"


@pytest.fixture(scope="module")
def stub_lib(tmp_path_factory):
    out = tmp_path_factory.mktemp("rtlsdr") / "librtlsdr_stub.so"
    try:
        subprocess.run(
            ["gcc", "-shared", "-fPIC", str(STUB_SRC), "-o", str(out)],
            check=True, capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"cannot build stub librtlsdr: {e}")
    return out


def test_unavailable_without_library(monkeypatch):
    from dump1090_tpu.io.rtlsdr import RtlSdrSource, RtlSdrUnavailable

    monkeypatch.setenv("DUMP1090_TPU_LIBRTLSDR", "/nonexistent/librtlsdr.so")
    with pytest.raises(RtlSdrUnavailable):
        RtlSdrSource()


def test_init_sequence_and_gain_selection(stub_lib, monkeypatch):
    """Max-gain selection picks the last reported gain; stderr wording
    matches the reference (dump1090.c:396-433)."""
    from dump1090_tpu.io.rtlsdr import RtlSdrSource

    monkeypatch.setenv("DUMP1090_TPU_LIBRTLSDR", str(stub_lib))
    err = io.StringIO()
    src = RtlSdrSource(dev_index=0, err=err)
    src.close()
    text = err.getvalue()
    assert "Found 1 device(s):" in text
    assert "0: StubVendor, StubProduct, SN: 00000001 (currently selected)" in text
    assert "Max available gain is: 49.60" in text
    assert "Setting gain to: 49.60" in text
    assert "Gain reported by device: 49.60" in text
    assert src.gain == 496

    err = io.StringIO()
    src = RtlSdrSource(gain=-100, err=err)  # MODES_AUTO_GAIN
    src.close()
    assert "Using automatic gain control." in err.getvalue()


def test_callback_to_pipeline_plumbing(stub_lib, monkeypatch, modes1_path):
    """Buffers from the async callback decode to the same messages as the
    file source over the same bytes (two full 256 KiB transfers)."""
    from dump1090_tpu.api import decode_capture
    from dump1090_tpu.io.rtlsdr import RtlSdrSource
    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    nbytes = 2 * DATA_LEN_BYTES
    data = np.fromfile(modes1_path, dtype=np.uint8)[:nbytes]
    stub_data = Path(str(stub_lib.parent / "capture.bin"))
    data.tofile(stub_data)

    monkeypatch.setenv("DUMP1090_TPU_LIBRTLSDR", str(stub_lib))
    monkeypatch.setenv("RTLSDR_STUB_DATA", str(stub_data))
    # pace the stub like real hardware (256 KiB / 65 ms-ish); the depth-one
    # mailbox drops buffers under a decoder slower than the radio — exactly
    # like the reference — so compile before streaming and then keep up
    monkeypatch.setenv("RTLSDR_STUB_DELAY_US", "200000")
    warm = DemodPipeline(PipelineConfig(batch_buffers=1))
    warm.run(io.BytesIO(data.tobytes()[: 2 * DATA_LEN_BYTES]), lambda mm: None)

    src = RtlSdrSource(err=io.StringIO())
    p = DemodPipeline(PipelineConfig(batch_buffers=1))
    got = []
    p.run_source(src.buffers(), got.append)

    want = decode_capture(data.tobytes())
    assert len(got) == len(want) > 0
    assert [(m.msg, m.crcok) for m in got] == [(m.msg, m.crcok) for m in want]


def test_short_transfer_keeps_stale_tail(stub_lib, monkeypatch, tmp_path):
    """A short USB transfer overwrites only `len` bytes; the rest of the
    previous buffer stays in place (rtlsdrCallback memcpys exactly len,
    dump1090.c:445-451)."""
    from dump1090_tpu.io.rtlsdr import RtlSdrSource
    from dump1090_tpu.io.sources import BUF_BYTES, CARRY_BYTES

    rng = np.random.default_rng(0)
    full = rng.integers(0, 256, DATA_LEN_BYTES, dtype=np.uint8)
    short = rng.integers(0, 256, 1000, dtype=np.uint8)
    data = np.concatenate([full, short])
    stub_data = tmp_path / "short.bin"
    data.tofile(stub_data)

    monkeypatch.setenv("DUMP1090_TPU_LIBRTLSDR", str(stub_lib))
    monkeypatch.setenv("RTLSDR_STUB_DATA", str(stub_data))
    monkeypatch.setenv("RTLSDR_STUB_DELAY_US", "100000")  # hardware pacing

    src = RtlSdrSource(err=io.StringIO())
    bufs = list(src.buffers())
    assert len(bufs) == 2 and all(b.shape == (BUF_BYTES,) for b in bufs)
    # buffer 1: 127-carry + the full transfer
    assert (bufs[0][:CARRY_BYTES] == 127).all()
    assert np.array_equal(bufs[0][CARRY_BYTES:], full)
    # buffer 2: carry from buffer 1's tail, then the short transfer, then
    # buffer 1's stale bytes beyond it
    assert np.array_equal(
        bufs[1][:CARRY_BYTES], bufs[0][DATA_LEN_BYTES:]
    )
    assert np.array_equal(bufs[1][CARRY_BYTES : CARRY_BYTES + 1000], short)
    assert np.array_equal(
        bufs[1][CARRY_BYTES + 1000 :], bufs[0][CARRY_BYTES + 1000 :]
    )


def test_cli_device_flags_end_to_end(stub_lib, modes1_path, tmp_path):
    """`--device-index 0 --raw` with the stub library decodes live-capture
    buffers to the same raw stream as a file decode of the same bytes.
    One transfer only: a single callback cannot be overwritten, so the test
    is deterministic regardless of in-subprocess compile time."""
    from dump1090_tpu.api import decode_capture

    nbytes = 1 * DATA_LEN_BYTES
    data = np.fromfile(modes1_path, dtype=np.uint8)[:nbytes]
    stub_data = tmp_path / "capture.bin"
    data.tofile(stub_data)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["DUMP1090_TPU_LIBRTLSDR"] = str(stub_lib)
    env["RTLSDR_STUB_DATA"] = str(stub_data)
    r = subprocess.run(
        [sys.executable, "-m", "dump1090_tpu", "--device-index", "0",
         "--gain", "40", "--ppm", "1", "--enable-agc", "--raw"],
        capture_output=True, timeout=300, env=env, cwd=REPO, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "Setting gain to: 40.00" in r.stderr
    want = "".join(
        f"*{m.msg[:m.msgbits // 8].hex()};\n"
        for m in decode_capture(data.tobytes(), crcok_only=True)
    )
    assert r.stdout == want


def test_cli_device_interactive_tui(stub_lib, modes1_path, tmp_path):
    """Live capture + --interactive: the TUI renders aircraft decoded from
    the stub radio (reader thread -> pipeline -> tracker -> screen)."""
    nbytes = 1 * DATA_LEN_BYTES
    data = np.fromfile(modes1_path, dtype=np.uint8)[:nbytes]
    stub_data = tmp_path / "capture.bin"
    data.tofile(stub_data)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["DUMP1090_TPU_LIBRTLSDR"] = str(stub_lib)
    env["RTLSDR_STUB_DATA"] = str(stub_data)
    r = subprocess.run(
        [sys.executable, "-m", "dump1090_tpu", "--device-index", "0",
         "--interactive", "--interactive-rows", "10"],
        capture_output=True, timeout=300, env=env, cwd=REPO, text=True,
    )
    assert r.returncode == 0, r.stderr
    # modes1's dominant aircraft, present in the first buffer
    assert "4d2023" in r.stdout
    assert "Hex" in r.stdout and "Flight" in r.stdout  # table header


def test_run_source_device_matches_run_source(stub_lib, monkeypatch, modes1_path):
    """Live-capture buffers through the DEVICE resolver
    (run_source_device -> _device_batches, dispatch_groups=1) must decode to
    the same messages as the host-resolve live path over the same bytes —
    and must actually take the device path (round-3 directive: the chip
    advantage applies to live capture too)."""
    import dataclasses

    from dump1090_tpu.io.rtlsdr import RtlSdrSource
    from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig

    nbytes = 2 * DATA_LEN_BYTES
    data = np.fromfile(modes1_path, dtype=np.uint8)[:nbytes]
    stub_data = Path(str(stub_lib.parent / "capture_dev.bin"))
    data.tofile(stub_data)

    monkeypatch.setenv("DUMP1090_TPU_LIBRTLSDR", str(stub_lib))
    monkeypatch.setenv("RTLSDR_STUB_DATA", str(stub_data))
    # no pacing: the mailbox hands over both buffers deterministically only
    # when the consumer keeps up, so let the stub block between transfers
    monkeypatch.setenv("RTLSDR_STUB_DELAY_US", "200000")

    # warm the compile caches so the paced stream is kept up with
    warm = DemodPipeline(PipelineConfig(batch_buffers=1))
    warm.run_device(io.BytesIO(data.tobytes()), lambda mm: None)

    src = RtlSdrSource(err=io.StringIO())
    p_dev = DemodPipeline(PipelineConfig(batch_buffers=1))
    got = []
    p_dev.run_source_device(src.buffers(), got.append)
    # the device path initializes the packed/emission shapes; the host
    # path never touches them — proves which pipeline ran
    assert p_dev._mo is not None

    src2 = RtlSdrSource(err=io.StringIO())
    p_host = DemodPipeline(PipelineConfig(batch_buffers=1))
    want = []
    p_host.run_source(src2.buffers(), want.append)

    assert len(got) == len(want) > 0
    for a, b in zip(got, want):
        assert dataclasses.asdict(a) == dataclasses.asdict(b)
    assert p_dev.stats == p_host.stats
