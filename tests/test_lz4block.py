"""Unit tests for the pure-Python LZ4 block codec + XXH64
(io/lz4block.py — the r10 `L4` ROOT-basket path).

XXH64 is pinned against the published reference vectors; the LZ4
round-trip sweeps adversarial shapes (incompressible randomness, RLE
with overlap-copy matches, periodic patterns, short blocks around the
12-byte min-match limit) across many seeds — the codec is byte-format
code, so the oracle is identity, and the seed sweep is the defense
against a matcher bug that only fires on one alignment."""

from __future__ import annotations

import random

import pytest

from dask_awkward_sandbox_spark.io.lz4block import (
    lz4_block_compress,
    lz4_block_decompress,
    xxh64,
)


def test_xxh64_reference_vectors():
    # published xxHash reference values, seed 0
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # seed changes the hash; 32-byte+ input exercises the lane loop
    assert xxh64(b"abc", seed=1) != xxh64(b"abc")
    assert xxh64(bytes(range(200))) != xxh64(bytes(range(199)) + b"\x00")


def test_roundtrip_shapes_and_seeds():
    for seed in range(40):
        rnd = random.Random(seed)
        cases = [
            rnd.randbytes(rnd.randrange(0, 2000)),            # incompressible
            bytes([rnd.randrange(4)] * rnd.randrange(0, 3000)),  # RLE / overlap
            (b"hello world " * 300)[: rnd.randrange(0, 3000)],   # periodic
            rnd.randbytes(8) * rnd.randrange(1, 200),          # long-offset repeats
            rnd.randbytes(rnd.randrange(0, 20)),               # sub-minmatch blocks
        ]
        for data in cases:
            c = lz4_block_compress(data)
            assert lz4_block_decompress(c, len(data)) == data


def test_compresses_repetitive_data():
    data = b"0123456789abcdef" * 4096
    c = lz4_block_compress(data)
    assert len(c) < len(data) // 20


def test_empty_block():
    assert lz4_block_decompress(lz4_block_compress(b""), 0) == b""


def test_decodes_foreign_encoder_shapes():
    # hand-built block a conformant (non-greedy-ended) encoder could
    # emit: 1 literal 'a', then an offset-1 overlap match of length 7
    src = bytes([0x13]) + b"a" + b"\x01\x00"
    assert lz4_block_decompress(src, 8) == b"a" * 8
    # 255-saturated literal extension: 15 + 255 + 0 = 270 literals
    lits = bytes(270)
    src = bytes([0xF0, 255, 0]) + lits
    assert lz4_block_decompress(src, 270) == lits


def test_decode_error_surface():
    with pytest.raises(ValueError, match="zero match offset"):
        lz4_block_decompress(bytes([0x04]) + b"\x00\x00", 8)
    with pytest.raises(ValueError, match="literal run overruns"):
        lz4_block_decompress(bytes([0x50]) + b"ab", 5)
    with pytest.raises(ValueError, match="before block start"):
        lz4_block_decompress(bytes([0x14]) + b"a" + b"\x09\x00", 9)
    good = lz4_block_compress(b"xyz" * 50)
    with pytest.raises(ValueError, match="expected"):
        lz4_block_decompress(good, 151)
