"""Live-socket golden parity: the raw (30002) and SBS (30003) TCP streams of
a full ``--net --ifile -`` CLI run must match the reference binary's streams.

These goldens cover what the stdout goldens can't: the tracker + CPR pair
logic feeding MSG,3 positions, SBS field formatting for every message class
(dump1090.c:2397-2448), the SBS-connection tracking gate in the hub
(dump1090.c:1806-1808), and the socket framing itself.  Capture protocol and
the MSG,3 position canonicalization (the reference's CPR newer-latch pick is
wall-clock racy) are documented in tools/net_capture.py.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import net_capture  # noqa: E402

GOLDEN = REPO / "tests" / "golden"
MODES1 = Path("/root/reference/testfiles/modes1.bin")


def test_net_raw_and_sbs_streams_match_reference():
    iq = MODES1.read_bytes()
    raw_p, sbs_p, ri_p, http_p = net_capture.free_ports(4)
    cmd = net_capture.build_cmd(
        [sys.executable, "-m", "dump1090_tpu", "--tpu-backend", "cpu"],
        raw_p, sbs_p, ri_p, http_p)
    streams = net_capture.capture_streams(cmd, iq, raw_p, sbs_p,
                                          cwd=str(REPO))

    golden_raw = (GOLDEN / "golden_net_raw.txt").read_bytes()
    assert streams["raw"] == golden_raw

    golden_sbs = (GOLDEN / "golden_sbs.txt").read_bytes()
    assert (net_capture.canonicalize_sbs(streams["sbs"])
            == net_capture.canonicalize_sbs(golden_sbs))
