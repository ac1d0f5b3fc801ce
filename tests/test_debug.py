"""Debug visualizer tests (contract: dump1090.c:529-661 + flag dispatch in
detectModeS)."""

import io

import numpy as np
import pytest

from dump1090_tpu.models.decoder import DecoderConfig
from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig
from dump1090_tpu.utils import debug as dbg
from dump1090_tpu.utils import synth


def test_dump_magnitude_bar_format():
    # magnitude//256 scales to the 0-255 display range, 4 units per 'O'
    assert dbg.dump_magnitude_bar(0, 1080) == "[000> |O%-65s 1080\n" % ""
    assert dbg.dump_magnitude_bar(3, 360) == "[003] |.%-65s 360\n" % ""
    assert dbg.dump_magnitude_bar(16, 0) == "[016) |%-66s 0\n" % " "
    assert dbg.dump_magnitude_bar(18, 0)[4] == "|"  # odd bit pair marker
    assert dbg.dump_magnitude_bar(-5, 360).startswith("[-5] |") or \
        dbg.dump_magnitude_bar(-5, 360).startswith("[-05] |")


def test_dump_raw_message_layout():
    m = np.zeros(1000, dtype=np.int32)
    msg = np.frombuffer(bytes.fromhex("8f4d2023587f345e35837e2218b2"), np.uint8)
    out = io.StringIO()
    dbg.dump_raw_message("Test descr", msg, m, 100, out=out)
    text = out.getvalue()
    assert text.startswith("\n--- Test descr\n    8f4d2023587f34 ... 5e35837e2218b2 (DF 17, Fixable: 0)\n")
    assert text.endswith("---\n\n")
    # 5 leading context samples + preamble (16) + short message (112) bars
    assert text.count("\n") == 3 + 5 + 16 + 112 + 2


def test_fixable_reporting():
    msg = np.frombuffer(bytes.fromhex("8f4d2023587f345e35837e2218b2"), np.uint8).copy()
    msg[6] ^= 0x08
    out = io.StringIO()
    dbg.dump_raw_message("x", msg, np.zeros(2000, np.int32), 100, out=out)
    assert "Fixable: 1" in out.getvalue()
    msg[9] ^= 0x01
    out = io.StringIO()
    dbg.dump_raw_message("x", msg, np.zeros(2000, np.int32), 100, out=out)
    assert "Fixable: 2" in out.getvalue()


def run_debug(iq: np.ndarray, flags: str) -> str:
    out = io.StringIO()
    p = DemodPipeline(
        PipelineConfig(),
        debug_flags=dbg.DebugFlags.parse(flags),
        debug_out=out,
    )
    p.run(io.BytesIO(iq.tobytes()), lambda mm: None)
    return out.getvalue()


def test_demod_flag_dumps_clean_frame():
    frame = synth.make_df17_frame(0x4D2023)
    iq = synth.frame_to_iq(frame, amplitude=80)
    text = run_debug(iq, "D")
    assert "--- Demodulated with 0 errors" in text
    assert frame[:7].hex() in text


def test_goodcrc_badcrc_flags():
    frame = synth.make_df17_frame(0x4D2023)
    iq = synth.frame_to_iq(frame, amplitude=80)
    assert "Decoded with good CRC" in run_debug(iq, "C")
    corrupted = bytearray(frame)
    corrupted[6] ^= 0x08  # fixed single-bit error counts as bad-CRC dump
    iq2 = synth.frame_to_iq(bytes(corrupted), amplitude=80)
    assert "Decoded with bad CRC" in run_debug(iq2, "c")


def test_frames_js_record(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    frame = synth.make_df17_frame(0x4D2023)
    iq = synth.frame_to_iq(frame, amplitude=80)
    run_debug(iq, "Dj")
    js = (tmp_path / "frames.js").read_text()
    assert js.startswith('frames.push({"descr": "Demodulated with 0 errors", "mag": [')
    assert '"bits": 112' in js
    assert '\\x8d' in js


def test_debug_c_golden(modes1_path, golden_dir):
    """Full-fixture --debug c output is byte-identical to the reference."""
    golden = (golden_dir / "golden_debug_c.txt").read_text()
    out = io.StringIO()
    p = DemodPipeline(
        PipelineConfig(), debug_flags=dbg.DebugFlags.parse("c"), debug_out=out
    )

    from dump1090_tpu.models.hub import HubConfig, MessageHub
    from dump1090_tpu.models.tracker import AircraftTracker

    hub = MessageHub(HubConfig(), AircraftTracker(), p.stats, out=out)
    with open(modes1_path, "rb") as f:
        p.run(f, hub.use_message)
    assert out.getvalue() == golden


def _run_debug_with_hub(inp_path, flags: str) -> str:
    """Pipeline + hub wired exactly like the CLI's verbose mode: debug dumps
    and decoded-field display interleave on one stream, matching the
    reference's detectModeS-dump + useModesMessage ordering."""
    from dump1090_tpu.models.hub import HubConfig, MessageHub
    from dump1090_tpu.models.tracker import AircraftTracker

    out = io.StringIO()
    p = DemodPipeline(
        PipelineConfig(), debug_flags=dbg.DebugFlags.parse(flags), debug_out=out
    )
    hub = MessageHub(HubConfig(), AircraftTracker(), p.stats, out=out)
    with open(inp_path, "rb") as f:
        p.run(f, hub.use_message)
    return out.getvalue()


def test_debug_d_golden(modes1_path, golden_dir):
    """Full-fixture --debug d (demod-attempt-with-correction dumps,
    dump1090.c:1779-1783 MODES_DEBUG_DEMODERR) byte-identical to the
    reference: 6 dump blocks interleaved with the verbose display."""
    golden = (golden_dir / "golden_debug_d.txt").read_text()
    assert _run_debug_with_hub(modes1_path, "d") == golden


def test_debug_D_golden(golden_dir):
    """--debug D (every zero-error demodulation, dump1090.c:1757-1758
    MODES_DEBUG_DEMOD) byte-identical to the reference on the synthetic
    clean-frame + noise capture (the full fixture's D dump is ~4 MB)."""
    golden = (golden_dir / "golden_debug_D_synth.txt").read_text()
    assert _run_debug_with_hub(golden_dir / "debug_p_input.bin", "D") == golden


def test_debug_C_golden(golden_dir):
    """--debug C (good-CRC dumps, dump1090.c:1763-1766 MODES_DEBUG_GOODCRC)
    byte-identical to the reference on the synthetic capture."""
    golden = (golden_dir / "golden_debug_C_synth.txt").read_text()
    assert _run_debug_with_hub(golden_dir / "debug_p_input.bin", "C") == golden


def test_frames_js_golden(modes1_path, golden_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    golden = (golden_dir / "golden_frames_Dj.js").read_text()
    p = DemodPipeline(PipelineConfig(), debug_flags=dbg.DebugFlags.parse("Dj"))
    with open(modes1_path, "rb") as f:
        p.run(f, lambda mm: None)
    assert (tmp_path / "frames.js").read_text() == golden


def test_debug_p_golden(golden_dir):
    """--debug p (rejected-preamble dumps with the scratch last-message
    quirk) is byte-identical to the reference on a synthetic capture with
    one clean frame and a noise blob (dump1090.c:1612-1650)."""
    import subprocess
    import sys

    import os

    repo = golden_dir.parent.parent
    inp = golden_dir / "debug_p_input.bin"
    want = golden_dir / "golden_debug_p.txt"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "dump1090_tpu", "--ifile", str(inp), "--debug", "p"],
        capture_output=True, env=env, cwd=repo,
    )
    assert r.returncode == 0
    assert r.stdout.decode() == want.read_text()
