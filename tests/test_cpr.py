"""CPR decoding tests (contract: dump1090.c:1861-2066)."""

import math

from dump1090_tpu.models import cpr
from dump1090_tpu.models.decoder import DecoderConfig, IcaoCache, decode_message
from dump1090_tpu.models.tracker import AircraftTracker

# The classic public ADS-B decoding example (also used in the "ADS-B decoding
# guide"): an even/odd airborne position pair for ICAO 40621d near Schiphol.
EVEN_HEX = "8d40621d58c382d690c8ac2863a7"
ODD_HEX = "8d40621d58c386435cc412692ad6"


def _decode_pair():
    cache, cfg = IcaoCache(), DecoderConfig()
    even = decode_message(bytes.fromhex(EVEN_HEX), cache, cfg)
    odd = decode_message(bytes.fromhex(ODD_HEX), cache, cfg)
    assert even.crcok and odd.crcok
    assert even.fflag == 0 and odd.fflag != 0
    return even, odd


def test_airborne_global_decode_known_example():
    even, odd = _decode_pair()
    lat, lon = cpr.decode_cpr_airborne(
        even.raw_latitude, even.raw_longitude,
        odd.raw_latitude, odd.raw_longitude, use_even=True,
    )
    assert lat == 52.2572021484375
    assert lon == 3.91937255859375
    lat, lon = cpr.decode_cpr_airborne(
        even.raw_latitude, even.raw_longitude,
        odd.raw_latitude, odd.raw_longitude, use_even=False,
    )
    assert abs(lat - 52.26578017412606) < 1e-12
    assert abs(lon - 3.938912527901786) < 1e-12


def test_altitude_of_known_example():
    even, _ = _decode_pair()
    assert even.altitude == 38000


def test_nl_function_table_edges():
    assert cpr.nl_function(0.0) == 59
    assert cpr.nl_function(-10.0) == 59       # symmetric about the equator
    assert cpr.nl_function(10.47047130) == 58  # threshold is exclusive
    assert cpr.nl_function(86.9) == 2
    assert cpr.nl_function(87.0) == 1
    assert cpr.nl_function(90.0) == 1


def test_nl_zone_mismatch_returns_none():
    # latitudes straddling an NL boundary must abort (dump1090.c:1968-1969);
    # mismatching even/odd pairs found by search
    assert cpr.decode_cpr_airborne(48734, 77696, 31690, 87214, use_even=True) is None
    assert cpr.decode_cpr_airborne(46454, 47391, 24012, 66923, use_even=False) is None


def test_tracker_decodes_position_from_pair():
    cache, cfg = IcaoCache(), DecoderConfig()
    # epoch-scale ms clock: the zero-initialized even/odd latches must not
    # look "recent" (the reference relies on mstime() being epoch-sized)
    t = [1_700_000_000_000]

    def msclock():
        t[0] += 100
        return t[0]

    tracker = AircraftTracker(clock=lambda: 10, msclock=msclock)
    for h in (EVEN_HEX, ODD_HEX):
        mm = decode_message(bytes.fromhex(h), cache, cfg)
        tracker.receive(mm)
    a = tracker.find(0x40621D)
    assert a is not None
    # odd arrived last -> odd-based solution (dump1090.c:1979-1986)
    assert abs(a.lat - 52.26578017412606) < 1e-9
    assert abs(a.lon - 3.938912527901786) < 1e-9
    # the receiver auto-reference seeds from the first decode
    assert tracker.ref_count == 1
    assert tracker.ref_lat == a.lat


def _encode_surface(lat: float, lon: float, fflag: int) -> tuple[int, int]:
    """CPR surface encoder (inverse of decode_cpr_surface) for roundtrip
    tests: 2^17 * mod(x, zone)/zone, rounded."""
    dlat = (90.0 / 59) if fflag else (90.0 / 60)
    yz = int(math.floor(131072 * (lat % dlat) / dlat + 0.5)) % 131072
    nl = cpr.n_function(lat, fflag)
    dlon = 90.0 / max(nl, 1)
    xz = int(math.floor(131072 * (lon % dlon) / dlon + 0.5)) % 131072
    return yz, xz


def test_surface_decode_roundtrip():
    # Reference quirk (reproduced faithfully): decodeCPRSurface computes the
    # zone index with cprModFunction((int)ref, (int)zone_width) — an INTEGER
    # mod whose base truncates to 1 — so the receiver's fractional zone
    # offset is lost and positions in the upper half of a CPR zone decode one
    # whole zone off (dump1090.c:2016-2039).  The roundtrip is exact only
    # when the true position sits in the lower half of its lat and lon zones;
    # (52.55, 5.2) does for both parities.
    true_lat, true_lon = 52.55, 5.2
    ref_lat, ref_lon = 52.60, 5.25  # receiver nearby
    for fflag in (0, 1):
        raw_lat, raw_lon = _encode_surface(true_lat, true_lon, fflag)
        lat, lon = cpr.decode_cpr_surface(ref_lat, ref_lon, fflag, raw_lat, raw_lon)
        assert abs(lat - true_lat) < 1e-3, (fflag, lat)
        assert abs(lon - true_lon) < 1e-3, (fflag, lon)


def test_surface_decode_solution_near_reference():
    # whatever the raw values, the chosen solution must be the one nearest
    # the reference (+-45 degrees, dump1090.c:2025-2028, 2043-2044)
    lat, lon = cpr.decode_cpr_surface(52.258, 3.918, 0, 93000, 51372)
    assert abs(lat - 52.258) <= 45
    assert 3.918 - 45 <= lon <= 3.918 + 45


def test_surface_decode_without_reference_refused_by_tracker():
    cache, cfg = IcaoCache(), DecoderConfig()
    tracker = AircraftTracker(clock=lambda: 10)
    # a surface position message (metype 5-8) with no reference: no position
    mm = decode_message(bytes.fromhex(EVEN_HEX), cache, cfg)
    mm.metype = 6  # force surface branch
    tracker.receive(mm)
    a = tracker.find(mm.addr)
    assert a.lat == 0 and a.lon == 0


def test_movement_field():
    from dump1090_tpu.models.decoder import decode_movement_field

    assert decode_movement_field(0) == -1
    assert decode_movement_field(1) == 0
    assert decode_movement_field(2) == 0       # 0.125 kt truncated to int
    assert decode_movement_field(13) == 2
    assert decode_movement_field(38) == 14     # (38-13)*0.5+2 = 14.5 -> 14
    assert decode_movement_field(39) == 15
    assert decode_movement_field(93) == 69
    assert decode_movement_field(94) == 70
    assert decode_movement_field(108) == 98
    assert decode_movement_field(109) == 100
    assert decode_movement_field(123) == 170
    assert decode_movement_field(124) == 175


def test_c_int_mod():
    assert cpr.c_int_mod(7, 3) == 1
    assert cpr.c_int_mod(-7, 3) == 2   # C: -7 % 3 == -1, then +3
    assert cpr.c_int_mod(0, 60) == 0


def test_cpr_golden_differential():
    """Bit-exact replay of tests/golden/golden_cpr.txt: 4210 fuzz vectors
    evaluated by the REFERENCE's decodeCPR/decodeCPRSurface via a C harness
    (tools/make_cpr_golden.sh).  Our doubles must equal the C doubles to the
    last bit — IEEE-754 patterns are compared, not a tolerance."""
    import struct
    from pathlib import Path

    golden = (Path(__file__).parent / "golden" / "golden_cpr.txt").read_text()

    def bits(x: float) -> str:
        return struct.pack(">d", x).hex()

    n_air = n_surf = 0
    for ln in golden.splitlines():
        inp, _, want = ln.partition(" -> ")
        f = inp.split()
        if f[0] == "A":
            got = cpr.decode_cpr_airborne(
                int(f[1]), int(f[2]), int(f[3]), int(f[4]), bool(int(f[5])))
            n_air += 1
        else:
            got = cpr.decode_cpr_surface(
                float.fromhex(f[1]), float.fromhex(f[2]),
                int(f[3]), int(f[4]), int(f[5]))
            n_surf += 1
        rendered = ("NONE" if got is None
                    else f"{bits(got[0])} {bits(got[1])}")
        assert rendered == want, f"CPR divergence on {inp!r}: " \
                                 f"ours={rendered} ref={want}"
    assert n_air >= 2000 and n_surf >= 1500
