"""CRC-24 / syndrome-table unit tests (contract: dump1090.c:663-894)."""

import numpy as np
import pytest

from dump1090_tpu.ops import crc


def test_checksum_table_derivation_matches_reference_values():
    t = crc.checksum_table()
    # spot values from the reference's hardcoded table (dump1090.c:683-698)
    assert list(t[:8]) == [0x3935EA, 0x1C9AF5, 0xF1B77E, 0x78DBBF,
                           0xC397DB, 0x9E31E9, 0xB0E2F0, 0x587178]
    assert t[55] == 0x030ACE  # start of the short-message suffix
    assert t[87] == 0xFFF409  # the generator polynomial itself
    assert (t[88:] == 0).all()


def test_known_good_frames_have_zero_syndrome():
    long_msg = np.frombuffer(bytes.fromhex("8f4d2023587f345e35837e2218b2"), np.uint8)
    short_msg = np.frombuffer(bytes.fromhex("5d4d20237a55a6"), np.uint8)
    assert crc.checksum(long_msg.copy(), 112) == 0
    assert crc.checksum(short_msg.copy(), 56) == 0


def test_batch_syndromes_match_scalar():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (128, 14), dtype=np.uint8)
    for bits in (112, 56):
        bs = crc.batch_syndromes(batch, bits)
        for i in range(len(batch)):
            assert bs[i] == crc.checksum(batch[i], bits)


def test_bit_error_table_shape_and_uniqueness():
    syn, nbits, pos0, pos1 = crc.bit_error_table()
    assert len(syn) == 5778
    assert (nbits == 1).sum() == 107
    assert (nbits == 2).sum() == 5671
    # all syndromes are distinct, so correction is unambiguous
    assert len(np.unique(syn)) == 5778
    assert (np.diff(syn.astype(np.int64)) > 0).all()  # sorted
    assert pos0.min() >= 5  # DF field excluded (dump1090.c:795-800)


@pytest.mark.parametrize(
    "bits, base_hex",
    [(112, "8f4d2023587f345e35837e2218b2"), (56, "5d4d20237a55a6")],
)
def test_single_bit_fix_roundtrip(bits, base_hex):
    base = bytes.fromhex(base_hex)  # clean frames: syndrome 0
    # long frames: bits 0-4 (DF) are excluded from the syndrome table;
    # short frames: every bit maps to long positions 56-111, all correctable
    for p in range(5 if bits == 112 else 0, bits):
        m = np.frombuffer(base, np.uint8).copy()
        m[p >> 3] ^= 1 << (7 - (p & 7))
        fixed = crc.fix_bit_errors(m, bits, 1)
        assert fixed == [p]
        assert bytes(m) == base


def test_two_bit_fix_requires_maxfix_2():
    base = np.frombuffer(bytes.fromhex("8f4d2023587f345e35837e2218b2"), np.uint8)
    m = base.copy()
    m[3] ^= 0x10
    m[7] ^= 0x01
    assert crc.fix_bit_errors(m.copy(), 112, 1) == []
    m2 = m.copy()
    assert sorted(crc.fix_bit_errors(m2, 112, 2)) == [27, 63]
    assert bytes(m2) == bytes(base)


def test_short_frame_rejects_fix_outside_message():
    # a syndrome whose table entry points at bits < 56 of the long frame must
    # not be applied to a short frame (dump1090.c:874-881)
    syn, nbits, pos0, pos1 = crc.bit_error_table()
    # find a single-bit entry with position < 56
    k = np.where((nbits == 1) & (pos0 < 56))[0][0]
    target = int(syn[k])
    short = np.zeros(7, dtype=np.uint8)
    # craft a short message with exactly this syndrome: start from all-zero
    # (syndrome 0) and flip CRC bits to equal the target syndrome
    short[4] = (target >> 16) & 0xFF
    short[5] = (target >> 8) & 0xFF
    short[6] = target & 0xFF
    assert crc.checksum(short, 56) == target
    assert crc.fix_bit_errors(short.copy(), 56, 2) == []
