"""Pure-Python ZSTD frame decoder (io/zstdframe.py, RFC 8878).

The oracle is the reference C encoder: pyarrow bundles libzstd, so
every case here is a true cross-implementation check — reference
encoder bytes in, this repo's decoder out, exact payload equality.
Level sweep drives the mode space (raw/RLE/compressed blocks,
1-stream and 4-stream Huffman, direct and FSE-compressed weight
descriptions, predefined/FSE/RLE/repeat sequence modes, multi-block
frames, repeat-offset history).
"""

from __future__ import annotations

import random

import pytest

from dask_awkward_sandbox_spark.io.zstdframe import ZstdError, decompress

pa = pytest.importorskip("pyarrow")


def _codec(level):
    return pa.Codec("zstd", compression_level=level)


def _payloads():
    rng = random.Random(20260815)
    text = (
        "From the land of the midnight parquet, a scan pruned is a "
        "shuffle saved; the quick brown fox jumps over the lazy dog. "
    ).encode()
    import numpy as np

    return [
        b"",
        b"x",
        b"abc",
        b"hello world " * 200,                          # one long match
        bytes(rng.randrange(256) for _ in range(4096)),  # incompressible
        bytes([9]) * 65536,                              # RLE block
        text * 300,                                      # huffman + seqs
        bytes(rng.choice(b"abcd") for _ in range(20000)),  # tiny alphabet
        np.arange(30000, dtype=">f8").tobytes(),         # structured
        b"".join(
            b'{"id": %d, "label": "u%d"}\n' % (i, i % 89) for i in range(4000)
        ),
        bytes(rng.randrange(16) for _ in range(150000)),  # multi-block
    ]


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_reference_encoder_roundtrip(level):
    codec = _codec(level)
    for payload in _payloads():
        frame = codec.compress(payload, asbytes=True)
        assert decompress(frame) == payload
        # content-size contract: the frame header promises the size
        assert decompress(frame, expected_size=len(payload)) == payload


def test_random_structured_sweep():
    """Randomized mix of runs, copies and noise — shapes that drive
    the sequence machinery through repeat offsets and overlapping
    matches."""
    rng = random.Random(7)
    codec = _codec(6)
    for _ in range(25):
        parts = []
        for _ in range(rng.randrange(1, 12)):
            kind = rng.randrange(4)
            if kind == 0:
                parts.append(bytes([rng.randrange(256)]) * rng.randrange(1, 500))
            elif kind == 1:
                parts.append(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 300))))
            elif kind == 2 and parts:
                prev = b"".join(parts)
                take = rng.randrange(1, min(len(prev), 400) + 1)
                start = rng.randrange(0, len(prev) - take + 1)
                parts.append(prev[start : start + take])
            else:
                parts.append(b"spark" * rng.randrange(1, 60))
        payload = b"".join(parts)
        frame = codec.compress(payload, asbytes=True)
        assert decompress(frame) == payload


def test_checksum_verified():
    """Hand-built frame with a Content_Checksum (XXH64 low 32 bits):
    correct passes, corrupted raises the directed error."""
    from dask_awkward_sandbox_spark.io.lz4block import xxh64

    payload = b"checksummed payload bytes"
    # single-segment frame, checksum flag set, 1-byte FCS, raw block
    desc = 0x20 | 0x04
    header = (0xFD2FB528).to_bytes(4, "little") + bytes([desc, len(payload)])
    block_header = (1 | (0 << 1) | (len(payload) << 3)).to_bytes(3, "little")
    check = (xxh64(payload) & 0xFFFFFFFF).to_bytes(4, "little")
    frame = header + block_header + payload + check
    assert decompress(frame) == payload
    bad = bytearray(frame)
    bad[-1] ^= 0xFF
    with pytest.raises(ZstdError, match="checksum"):
        decompress(bytes(bad))


def test_rle_block_and_frame_header_variants():
    """Hand-built RLE block; 2-byte FCS field carries size-256."""
    payload = bytes([0x41]) * 300
    desc = 0x20 | 0x40  # single segment + 2-byte FCS
    header = (0xFD2FB528).to_bytes(4, "little") + bytes([desc]) + (300 - 256).to_bytes(2, "little")
    block_header = (1 | (1 << 1) | (300 << 3)).to_bytes(3, "little")
    frame = header + block_header + b"\x41"
    assert decompress(frame) == payload


def test_directed_errors():
    with pytest.raises(ZstdError, match="magic"):
        decompress(b"\x00\x01\x02\x03\x04\x05")
    codec = _codec(3)
    frame = codec.compress(b"hello hello hello hello", asbytes=True)
    with pytest.raises(ZstdError):
        decompress(frame[: len(frame) - 3])  # truncated
    with pytest.raises(ZstdError, match="expected"):
        decompress(frame, expected_size=999)
    # reserved block type
    desc = 0x20
    hdr = (0xFD2FB528).to_bytes(4, "little") + bytes([desc, 1])
    bad_block = (1 | (3 << 1) | (1 << 3)).to_bytes(3, "little") + b"x"
    with pytest.raises(ZstdError, match="reserved"):
        decompress(hdr + bad_block)


def test_window_descriptor_frame():
    """Non-single-segment frames carry a window descriptor byte; the
    reference encoder emits them for large inputs — decode one."""
    payload = bytes(random.Random(3).randrange(256) for _ in range(300000))
    frame = _codec(1).compress(payload, asbytes=True)
    assert decompress(frame) == payload
