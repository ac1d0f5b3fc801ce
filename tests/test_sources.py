"""IQ source block-geometry tests (contract: dump1090.c:436-527)."""

import io

import numpy as np

from dump1090_tpu.constants import CARRY_SAMPLES, DATA_LEN_BYTES
from dump1090_tpu.io.sources import BUF_BYTES, CARRY_BYTES, iq_buffers


def test_single_short_file_is_processed_and_padded():
    data = bytes(range(100)) * 10  # 1000 bytes
    bufs = list(iq_buffers(io.BytesIO(data)))
    assert len(bufs) == 1
    b = bufs[0]
    assert len(b) == BUF_BYTES
    assert (b[:CARRY_BYTES] == 127).all()            # initial carry is silence
    assert bytes(b[CARRY_BYTES : CARRY_BYTES + 1000]) == data
    assert (b[CARRY_BYTES + 1000 :] == 127).all()    # EOF padding


def test_partial_tail_block_is_dropped_like_reference():
    # EOF occurs while filling buffer 1, so (as in the reference, see
    # io/sources.py module doc) the tail past the first full block is never
    # decoded — the goldens confirm the reference emits nothing from the
    # final partial buffer of modes1.bin.
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, DATA_LEN_BYTES + 1000, dtype=np.uint8)
    bufs = list(iq_buffers(io.BytesIO(data.tobytes())))
    assert len(bufs) == 1


def test_carry_region_is_previous_tail():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 2 * DATA_LEN_BYTES + 1000, dtype=np.uint8)
    bufs = list(iq_buffers(io.BytesIO(data.tobytes())))
    assert len(bufs) == 2
    # buffer 1 carry == last CARRY_BYTES of buffer 0's payload region
    assert (bufs[1][:CARRY_BYTES] == bufs[0][DATA_LEN_BYTES:]).all()
    assert (bufs[1][CARRY_BYTES:] == data[DATA_LEN_BYTES : 2 * DATA_LEN_BYTES]).all()


def test_eof_buffer_dropped_unless_first():
    # exactly two full blocks: the third (all-pad) EOF buffer must not appear
    data = np.zeros(2 * DATA_LEN_BYTES, dtype=np.uint8)
    bufs = list(iq_buffers(io.BytesIO(data.tobytes())))
    assert len(bufs) == 2
    # but with decode_eof_buffer=True the racy third buffer is decoded
    bufs = list(iq_buffers(io.BytesIO(data.tobytes()), decode_eof_buffer=True))
    assert len(bufs) == 3
    assert (bufs[2][CARRY_BYTES:] == 127).all()


def test_loop_mode_rewinds():
    data = np.full(1000, 200, dtype=np.uint8)
    stream = io.BytesIO(data.tobytes())
    gen = iq_buffers(stream, loop=True)
    b = next(gen)
    # looped reads fill the whole payload with file content, no padding
    assert (b[CARRY_BYTES:] != 127).all()


def test_open_iq_source_directory_reads_as_empty(tmp_path):
    """C fopen() on a directory succeeds and fread() then reads as EOF, so
    the reference decodes a directory exactly like an empty file (exit 0,
    one padded first buffer) — never an error (dump1090.c:2952 only fires
    when fopen fails)."""
    from dump1090_tpu.io.sources import open_iq_source

    f = open_iq_source(str(tmp_path))
    assert f.read() == b""
