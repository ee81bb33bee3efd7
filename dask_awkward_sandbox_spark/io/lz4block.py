"""Pure-Python LZ4 *block* codec + XXH64, for ROOT ``L4`` baskets.

LZ4 has been ROOT's default basket compression since 6.14, so a
reader that gates on ``L4`` rejects most files written this decade
(the r9 verdict's top IO gap). The container has no lz4/xxhash
wheels, but both formats are short public specs — same move as the
zlib/PNG/BMP codecs: implement the byte format here, round-trip real
bytes in tests.

Implemented from the public specifications only:

- LZ4 block format (token byte = literal-length nibble + match-length
  nibble, 255-saturated extension bytes, 2-byte little-endian match
  offsets, min-match 4, last-5-bytes-literal / match-starts-12-bytes-
  before-end end-of-block rules), per lz4.github.io/lz4/lz4_Block_format.
- XXH64 (the checksum ROOT stores ahead of each LZ4 block, canonical
  big-endian form), per the xxHash spec.

The compressor is a greedy single-probe hash-table matcher — format-
true output, not ratio-optimal; any conformant decoder (lz4 CLI,
uproot's lz4.block) reads it, and this decoder reads any conformant
compressor's output. Reference rides uproot + the lz4 wheel for this
(reference tests/test-uproot fixtures); here the format itself is the
implementation.

Perf note: this codec runs inside mapInArrow tasks per basket. The
decode loop is per-SEQUENCE Python (bulk slice copies for literal
runs and non-overlapping matches, doubling for overlap), which is
fine for test-scale baskets; production 100 TB reads should ship a
native lz4 wheel and only fall back here.
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — the checksum ROOT pairs with LZ4 baskets."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            (a, b, c, d) = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = (
                _round(v1, a),
                _round(v2, b),
                _round(v3, c),
                _round(v4, d),
            )
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ _round(0, k), 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ (k * _P1 & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5 & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _ext_bytes(v: int) -> bytes:
    """255-saturated length extension: emit 255 while >= 255, then the
    remainder (a 0 byte is REQUIRED when the remainder is exactly 0)."""
    out = bytearray()
    while v >= 255:
        out.append(255)
        v -= 255
    out.append(v)
    return bytes(out)


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy LZ4 block compression (format-true; single-probe hash
    table, 64 KiB window). Honors the end-of-block rules: the last 5
    bytes are literals and no match starts within the last 12 bytes."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return b"\x00"  # one token: zero literals, no match — decodes to b""
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    match_limit = n - 12  # no match may START at/after here
    end_limit = n - 5  # no match may EXTEND to/after here

    def _emit(lit: bytes, mlen_code: int | None, offset: int | None) -> None:
        lit_n = len(lit)
        token_lit = 15 if lit_n >= 15 else lit_n
        token_m = (
            0 if mlen_code is None else (15 if mlen_code >= 15 else mlen_code)
        )
        out.append((token_lit << 4) | token_m)
        if lit_n >= 15:
            out.extend(_ext_bytes(lit_n - 15))
        out.extend(lit)
        if mlen_code is None:
            return
        out.extend(struct.pack("<H", offset))
        if mlen_code >= 15:
            out.extend(_ext_bytes(mlen_code - 15))

    while i < match_limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF:
            i += 1
            continue
        m, c = i + 4, cand + 4
        while m < end_limit and data[m] == data[c]:
            m += 1
            c += 1
        _emit(data[anchor:i], (m - i) - 4, i - cand)
        i = m
        anchor = m
    _emit(data[anchor:], None, None)
    return bytes(out)


def lz4_block_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 block to exactly ``dst_size`` bytes (any
    conformant compressor's output, not just :func:`lz4_block_compress`)."""
    dst = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("LZ4 block: truncated length extension")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("LZ4 block: literal run overruns input")
        dst += src[i : i + lit]
        i += lit
        if i >= n:
            break  # final sequence carries literals only
        if i + 2 > n:
            raise ValueError("LZ4 block: truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("LZ4 block: zero match offset")
        mlen = token & 0xF
        if mlen == 15:
            while True:
                if i >= n:
                    raise ValueError("LZ4 block: truncated length extension")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(dst) - offset
        if start < 0:
            raise ValueError("LZ4 block: match offset before block start")
        if offset >= mlen:
            dst += dst[start : start + mlen]
        else:
            # overlapping match (RLE shape): doubling copy keeps this
            # O(mlen) in bulk ops instead of a per-byte loop
            chunk = bytes(dst[start:])
            while len(chunk) < mlen:
                chunk += chunk
            dst += chunk[:mlen]
    if len(dst) != dst_size:
        raise ValueError(
            f"LZ4 block: decoded {len(dst)} bytes, expected {dst_size}"
        )
    return bytes(dst)
