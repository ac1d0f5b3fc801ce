"""End-to-end differential tests against the reference binary's recorded
behavior on testfiles/modes1.bin (see tools/make_goldens.sh).

This is the framework's permanent regression anchor: the decoded hex stream
must be *bit-identical* to `./dump1090 --ifile modes1.bin --raw` in every
decode mode, and the stats counters must match `--stats` exactly
(SURVEY.md §4, §6)."""

import re

import pytest

from dump1090_tpu.models.decoder import DecoderConfig
from dump1090_tpu.models.pipeline import DemodPipeline, PipelineConfig


def run_pipeline(path, **decoder_kwargs):
    cfg = PipelineConfig(decoder=DecoderConfig(**decoder_kwargs))
    p = DemodPipeline(cfg)
    msgs = []
    with open(path, "rb") as f:
        p.run(f, msgs.append)
    return p, msgs


def raw_lines(msgs, check_crc=True):
    return [
        "*" + mm.msg[: mm.msgbits // 8].hex() + ";"
        for mm in msgs
        if (not check_crc) or mm.crcok
    ]


@pytest.mark.parametrize(
    "golden_name, kwargs",
    [
        ("golden_raw.txt", {}),
        ("golden_raw_nofix.txt", {"fix_errors": False}),
        ("golden_raw_aggressive.txt", {"aggressive": True}),
        ("golden_raw_nocrccheck.txt", {"check_crc": False}),
    ],
)
def test_raw_stream_bit_exact(modes1_path, golden_dir, golden_name, kwargs):
    golden = (golden_dir / golden_name).read_text().splitlines()
    _, msgs = run_pipeline(modes1_path, **kwargs)
    lines = raw_lines(msgs, check_crc=kwargs.get("check_crc", True))
    assert lines == golden


def test_stats_counters_exact(modes1_path, golden_dir):
    golden = (golden_dir / "golden_stats.txt").read_text()
    nums = [int(x) for x in re.findall(r"^(\d+) ", golden, re.M)]
    (
        g_pre, g_oop, g_demod, g_good, g_bad, g_fixed, g_1bit, g_2bit, g_usable,
    ) = nums
    p, _ = run_pipeline(modes1_path)
    s = p.stats
    assert s.valid_preamble == g_pre
    assert s.out_of_phase == g_oop
    assert s.demodulated == g_demod
    assert s.goodcrc == g_good
    assert s.badcrc == g_bad
    assert s.fixed == g_fixed
    assert s.single_bit_fix == g_1bit
    assert s.two_bits_fix == g_2bit
    assert s.goodcrc + s.fixed == g_usable


def test_onlyaddr_stream(modes1_path, golden_dir):
    golden = (golden_dir / "golden_onlyaddr.txt").read_text().splitlines()
    _, msgs = run_pipeline(modes1_path)
    addrs = [f"{mm.aa1:02x}{mm.aa2:02x}{mm.aa3:02x}" for mm in msgs if mm.crcok]
    assert addrs == golden


def test_df_histogram(modes1_path):
    _, msgs = run_pipeline(modes1_path)
    hist: dict[int, int] = {}
    for mm in msgs:
        if mm.crcok:
            hist[mm.msgtype] = hist.get(mm.msgtype, 0) + 1
    assert hist == {0: 10, 4: 3, 5: 8, 11: 63, 17: 120, 20: 8, 21: 5}
