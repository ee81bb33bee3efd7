"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns beside a typed
metadata struct. The Spark-side machinery here — schemas, Arrow-batch
UDF signatures, partition sizing — is real and tested; the actual
codec calls are stubbed (decode libraries are not in this container)
behind ``DecodeUnavailable`` or a deterministic fake.

Scale notes: binary payloads dominate row size, so ops that don't
need bytes must prune them (nested-schema pruning handles struct
metadata; keep payloads in a separate column, never inside the
metadata struct). ``mapInArrow`` batches bound memory by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low for
multi-MB payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),  # image|audio|video
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


class DecodeUnavailable(NotImplementedError):
    """Raised where a real codec (PIL/ffmpeg/torchaudio) would be
    called; this container has none, so the decode step is stubbed."""


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([(i * 7 + j * 13) % 256 for j in range(128 + (i % 5) * 32)])
        rows.append(
            (
                i,
                payload,
                (kind, 64 + i % 4, 48, 16000 if kind == "audio" else None,
                 30 if kind == "video" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "object":
    raise DecodeUnavailable("image decode requires PIL/opencv; not in container")


# -- BMP: the one REAL codec (pure-python header parse, no external libs) --

BMP_HEADER_LEN = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def _le4(col):
    """Serialize an int column as 4 little-endian bytes, JVM-side:
    per-byte hex + unhex — no UDF. ``pmod`` (not ``%``) keeps each
    byte in [0,255] for NEGATIVE values too (Spark ``%`` keeps the
    dividend sign; hex of a negative long is 16 chars and lpad would
    keep the wrong end) — so two's-complement ints like a top-down
    BMP's negative height serialize correctly."""
    parts = [
        F.lpad(F.hex(F.pmod(F.shiftright(col.cast("long"), 8 * i), F.lit(256))), 2, "0")
        for i in range(4)
    ]
    return F.unhex(F.concat(*parts))


def bmp_column(width, height, payload):
    """Assemble a BMP file image as a binary Column: 'BM' magic,
    little-endian size/offset/width/height fields (24bpp, zero
    compression), then ``payload`` as the pixel data. Pure JVM
    expression — binary construction never leaves the executor."""
    psize = F.length(payload)
    return F.concat(
        F.lit(b"BM"),
        _le4(psize + F.lit(BMP_HEADER_LEN)),          # file size
        F.lit(b"\x00\x00\x00\x00"),                    # reserved
        _le4(F.lit(BMP_HEADER_LEN)),                   # pixel data offset
        _le4(F.lit(40)),                               # DIB header size
        _le4(width),
        _le4(height),
        F.lit(b"\x01\x00"),                            # planes = 1
        F.lit(b"\x18\x00"),                            # 24 bpp
        _le4(F.lit(0)),                                # BI_RGB
        _le4(psize),                                   # image size
        _le4(F.lit(2835)), _le4(F.lit(2835)),          # 72 DPI
        _le4(F.lit(0)), _le4(F.lit(0)),                # palette
        payload,
    )


def parse_bmp_header(buf: bytes) -> tuple[int, int, int]:
    """Parse (width, height, n_payload_bytes) from real BMP bytes.
    Raises ValueError on a bad magic — a genuine decoder contract."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", buf, 10)
    width, height = struct.unpack_from("<ii", buf, 18)
    return width, height, len(buf) - offset


def decode_bmp(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInArrow BMP header decode: Arrow batches of binary payloads
    in, (media_id, width, height, n_bytes) out — the real multimodal
    decode shape, with a real byte-level parser."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            parsed = [parse_bmp_header(p) for p in b.column(payload_col).to_pylist()]
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array([p[0] for p in parsed], pa.int64()),
                    pa.array([p[1] for p in parsed], pa.int64()),
                    pa.array([p[2] for p in parsed], pa.int64()),
                ],
                names=["media_id", "width", "height", "n_bytes"],
            )

    return df.mapInArrow(fn, "media_id long, width long, height long, n_bytes long")


def fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real feature extractor: byte
    histogram folded to ``dim`` floats. Same shape/contract as a real
    embedding UDF, so the pipeline around it is fully exercised."""
    acc = [0] * dim
    for j, byte in enumerate(payload):
        acc[j % dim] = (acc[j % dim] + byte) % 997
    return [a / 997.0 for a in acc]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInArrow feature extraction over binary payloads — the real
    multimodal hot path shape: Arrow batches in, Arrow batches out,
    payload column pruned from the output."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            kinds = [m["kind"] for m in b.column("meta").to_pylist()]
            payloads = b.column("payload").to_pylist()
            feats = [fake_feature(p or b"", dim) for p in payloads]
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(kinds, pa.string()),
                    pa.array([len(p or b"") for p in payloads], pa.int64()),
                    pa.array(feats, pa.list_(pa.float32())),
                ],
                names=["media_id", "kind", "n_bytes", "feature"],
            )

    return df.mapInArrow(fn, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video rows: emits (media_id, frame_idx)
    pairs scan-side; the decode of each sampled frame is the stubbed
    step. Demonstrates generator-based fan-out without Python."""
    n = F.col("meta")["n_frames"]
    idxs = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
    return (
        df.filter(F.col("meta")["kind"] == "video")
        .select("media_id", F.explode(idxs).alias("frame_idx"))
    )


def _encode_bmp_py(width: int, height: int, pixels) -> bytes:
    """BMP bytes from an (H, W, 3) uint8 array — the Python mirror of
    :func:`bmp_column`'s JVM construction (24bpp, BI_RGB, bottom-up
    rows padded to 4 bytes)."""
    import struct

    import numpy as np

    stride = ((3 * width + 3) // 4) * 4
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : 3 * width] = pixels.reshape(height, 3 * width)
    payload = rows.tobytes()
    header = (
        b"BM"
        + struct.pack("<I", len(payload) + BMP_HEADER_LEN)
        + b"\x00\x00\x00\x00"
        + struct.pack("<I", BMP_HEADER_LEN)
        + struct.pack("<I", 40)
        + struct.pack("<ii", width, height)
        + b"\x01\x00"
        + b"\x18\x00"
        + struct.pack("<I", 0)
        + struct.pack("<I", len(payload))
        + struct.pack("<II", 2835, 2835)
        + struct.pack("<II", 0, 0)
    )
    return header + payload


def _decode_bmp_pixels(buf: bytes):
    """(width, height, (H, W, 3) uint8) from 24bpp BMP bytes —
    honors the 4-byte row padding the format requires."""
    import struct

    import numpy as np

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", buf, 10)
    width, height = struct.unpack_from("<ii", buf, 18)
    stride = ((3 * width + 3) // 4) * 4
    rows = np.frombuffer(buf, dtype=np.uint8, count=height * stride, offset=offset)
    px = rows.reshape(height, stride)[:, : 3 * width].reshape(height, width, 3)
    return width, height, px


def _nn_resize(px, out_w: int, out_h: int):
    """Nearest-neighbor resize of an (H, W, C) array via numpy index
    maps — the shared kernel behind resize_bmp and resize_png."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    xs = (np.arange(out_w) * w) // out_w
    ys = (np.arange(out_h) * h) // out_h
    return px[ys][:, xs]


def resize_bmp(
    df: DataFrame, out_w: int, out_h: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL image resize with no imaging library: nearest-neighbor
    over decoded 24bpp BMP pixels (numpy index maps), re-encoded as
    BMP — the canonical multimodal transform (decode -> resize ->
    re-encode) with every byte real, upgrading what the module
    docstring stubs for PIL-format codecs.

    Arrow-batched mapInArrow: payload bytes never hit the driver, the
    per-image work is vectorized numpy, and the output schema carries
    the new dimensions alongside the rebuilt payload."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            outs = []
            for buf in b.column(payload_col).to_pylist():
                _w, _h, px = _decode_bmp_pixels(buf)
                outs.append(_encode_bmp_py(out_w, out_h, _nn_resize(px, out_w, out_h)))
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array([out_w] * len(ids), pa.int64()),
                    pa.array([out_h] * len(ids), pa.int64()),
                    pa.array(outs, pa.binary()),
                ],
                names=["media_id", "width", "height", "payload"],
            )

    return df.mapInArrow(
        fn, "media_id long, width long, height long, payload binary"
    )


# ---------------------------------------------------------------------------
# PNG: a second REAL image codec (r9) — the format training corpora
# actually contain. PNG is zlib (already a dependency of the ROOT byte
# layer) + per-row filters + CRC-framed chunks: fully implementable
# under the same no-PIL constraint as BMP/WAV. The DECODER handles all
# five standard filter types (None/Sub/Up/Average/Paeth), so it reads
# 8-bit RGB files real encoders wrote, not just this writer's output;
# the ENCODER emits filter-0 rows (always valid PNG). r10: every
# 8-BIT COLOR TYPE decodes (gray / RGB / palette+PLTE / gray-alpha /
# RGBA — alpha dropped, output is always (H, W, 3) RGB), 16-bit depth
# decodes via the standard high-byte fold, and Adam7 interlacing
# decodes via the pass-grid reassembly; r11 adds sub-byte depths
# (1/2/4 gray + palette, MSB-first packed scanlines, incl. Adam7) —
# every spec-legal PNG decodes. JPEG decodes too (r11, late):
# functions/jpegcodec.py implements baseline sequential AND
# progressive T.81 (Huffman + DCT + Annex G successive
# approximation) pure-Python; only arithmetic/lossless/12-bit scans
# stay gated there with directed errors.
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _encode_png_py(pixels) -> bytes:
    """PNG bytes from an (H, W, 3) uint8 RGB array: IHDR + one IDAT
    (zlib over filter-0-prefixed scanlines) + IEND."""
    import struct
    import zlib

    import numpy as np

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int):
    """Reverse the per-scanline filters (PNG spec §6): each row leads
    with a filter byte; Sub/Up/Average/Paeth reconstruct from the
    left/up/up-left neighbors of the DECODED image.

    Cost note (r10 advice): None/Up are whole-row numpy ops and Sub is
    a per-byte-lane cumsum (mod-256 prefix sum — the left dependency is
    LINEAR for Sub, so it vectorizes); Average/Paeth carry a floor/
    branchy left dependency that is genuinely sequential, so they run
    a per-byte Python loop — O(W*bpp) interpreted steps per such
    scanline. This repo's writer emits filter 0 only; external-encoder
    PNGs that lean on Average/Paeth decode correctly but slowly — at
    scale route those through a native decoder wheel."""
    import numpy as np

    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG scanline data is {len(raw)} bytes, expected {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    for y in range(h):
        ft, line = int(rows[y, 0]), rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        cur = np.zeros(stride, dtype=np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub: per-lane mod-256 prefix sum, vectorized
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(line[lane::bpp], dtype=np.int64) & 0xFF
        elif ft in (3, 4):  # Average / Paeth need a sequential left scan
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0  # left
                bup = prev[x]  # up
                c = prev[x - bpp] if x >= bpp else 0  # up-left
                if ft == 3:
                    pred = (a + bup) // 2
                else:  # Paeth
                    p = a + bup - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - bup), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (bup if pb_ <= pc_ else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG row {y}: unknown filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, bpp)


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per the spec
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_deinterlace(raw: bytes, w: int, h: int, bpp: int):
    """Reassemble an Adam7-interlaced image (r10): the stream is the
    concatenation of 7 passes, each an independently-filtered
    sub-image over its pass grid; unfilter each with the SAME
    per-scanline machinery and scatter into place."""
    import numpy as np

    out = np.zeros((h, w, bpp), dtype=np.uint8)
    off = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        nbytes = ph * (1 + pw * bpp)
        sub = _png_unfilter(raw[off : off + nbytes], pw, ph, bpp)
        out[y0::ys, x0::xs, :] = sub
        off += nbytes
    if off != len(raw):
        raise ValueError(
            f"PNG interlaced stream is {len(raw)} bytes, passes consumed {off}"
        )
    return out


def _png_subbyte_samples(raw: bytes, w: int, h: int, depth: int, interlace: int):
    """Per-pixel sample plane for sub-byte depths (1/2/4, r11): the
    spec packs samples MSB-first into scanlines padded to a byte
    boundary, and FILTERING operates on the packed BYTES with a
    left-distance of one byte — so unfiltering reuses the byte-level
    machinery with w=row_bytes, bpp=1, then np.unpackbits recovers the
    samples. Adam7 passes are independently packed/padded."""
    import numpy as np

    def unpack(chunk: bytes, pw: int, ph: int):
        rb = (pw * depth + 7) // 8
        rows = _png_unfilter(chunk, rb, ph, 1).reshape(ph, rb)
        bits = np.unpackbits(rows, axis=1)
        if depth == 1:
            return bits[:, :pw]
        if depth == 2:
            b = bits.reshape(ph, -1, 2)
            return ((b[:, :, 0] << 1) | b[:, :, 1])[:, :pw]
        b = bits.reshape(ph, -1, 4)
        return (
            (b[:, :, 0] << 3) | (b[:, :, 1] << 2) | (b[:, :, 2] << 1) | b[:, :, 3]
        )[:, :pw]

    if interlace == 0:
        rb = (w * depth + 7) // 8
        if len(raw) != h * (rb + 1):
            raise ValueError(
                f"PNG sub-byte scanline data is {len(raw)} bytes, "
                f"expected {h * (rb + 1)}"
            )
        return unpack(raw, w, h)
    out = np.zeros((h, w), dtype=np.uint8)
    off = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        rb = (pw * depth + 7) // 8
        nbytes = ph * (1 + rb)
        out[y0::ys, x0::xs] = unpack(raw[off : off + nbytes], pw, ph)
        off += nbytes
    if off != len(raw):
        raise ValueError(
            f"PNG interlaced sub-byte stream is {len(raw)} bytes, "
            f"passes consumed {off}"
        )
    return out


def _decode_png_pixels(buf: bytes):
    """(width, height, (H, W, 3) uint8) from 8- or 16-bit PNG bytes of
    ANY color type (r10: gray/RGB/palette/gray-alpha/RGBA — palette
    indices resolve through PLTE, gray replicates, alpha drops; 16-bit
    samples fold to their high byte; Adam7 interlace reassembles via
    the pass grid) — chunk walk with CRC verification, multi-IDAT
    concatenation, full filter reconstruction. r11: sub-byte depths
    (1/2/4 gray + palette, incl. Adam7) decode too — every spec-legal
    PNG decodes here."""
    import struct
    import zlib

    if buf[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    import numpy as np

    pos, ihdr, idat, plte = len(PNG_MAGIC), None, [], None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r}: CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    # r10: every 8-bit color type decodes (the r9 gate covered only
    # truecolor), plus 16-bit gray/RGB/gray-alpha/RGBA (samples fold to
    # their high byte — the standard 16->8 scale) and Adam7 interlace.
    # Channel counts per the spec; palette indices look up PLTE; alpha
    # channels are DROPPED after unfiltering (the output contract is an
    # (H, W, 3) uint8 RGB array — compositing and 16-bit-precision
    # policy belong to the caller). r11: sub-byte depths decode below.
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    subbyte_ok = depth in (1, 2, 4) and color in (0, 3)
    if channels is None or not (
        subbyte_ok or (depth == 8) or (depth == 16 and color != 3)
    ):
        raise ValueError(
            f"PNG color type {color}/depth {depth} unsupported — every "
            "spec-legal depth/type combination decodes here except 16-bit "
            "palette (not spec-legal anyway)"
        )
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("PNG nonstandard compression/filter/interlace method")
    raw = zlib.decompress(b"".join(idat))
    if depth in (1, 2, 4):
        # r11: sub-byte gray/palette — the last PNG gate removed
        s = _png_subbyte_samples(raw, w, h, depth, interlace)
        if color == 0:
            scale = {1: 255, 2: 85, 4: 17}[depth]  # spec sample scaling
            g = (s.astype(np.uint16) * scale).astype(np.uint8)
            return w, h, np.repeat(g[:, :, None], 3, axis=2)
        if plte is None or len(plte) % 3:
            raise ValueError("PNG palette image missing a well-formed PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(s.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return w, h, pal[s]
    bpp = channels * (depth // 8)
    px = (
        _png_deinterlace(raw, w, h, bpp)
        if interlace == 1
        else _png_unfilter(raw, w, h, bpp)
    )
    if depth == 16:
        px = px[:, :, 0::2]  # big-endian sample pairs -> high byte
    if color == 2:
        return w, h, px
    if color == 0:  # grayscale -> replicate
        return w, h, np.repeat(px, 3, axis=2)
    if color == 3:  # palette lookup
        if plte is None or len(plte) % 3:
            raise ValueError("PNG palette image missing a well-formed PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return w, h, pal[idx]
    if color == 4:  # gray + alpha -> replicate gray, drop alpha
        return w, h, np.repeat(px[:, :, :1], 3, axis=2)
    return w, h, px[:, :, :3]  # RGBA -> drop alpha


def decode_jpeg(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInArrow baseline-JPEG decode to per-image stats — the same
    shape as :func:`decode_png`: (media_id, width, height,
    mean_pixel). r11: REAL decode via the pure-Python ITU T.81 codec
    (functions/jpegcodec.py — marker walk, canonical Huffman entropy
    decode, batched numpy IDCT, 4:2:0 upsampling; late r11 adds full
    progressive/SOF2 decode incl. successive approximation);
    arithmetic/lossless/12-bit scans stay gated inside the codec
    with directed DecodeUnavailable errors."""
    import numpy as np
    import pyarrow as pa

    from dask_awkward_sandbox_spark.functions.jpegcodec import jpeg_decode

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            ws, hs, means = [], [], []
            for buf in b.column(payload_col).to_pylist():
                w, h, px = jpeg_decode(bytes(buf))
                ws.append(w)
                hs.append(h)
                means.append(float(np.mean(px)))
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(ws, pa.int64()),
                    pa.array(hs, pa.int64()),
                    pa.array(means, pa.float64()),
                ],
                names=["media_id", "width", "height", "mean_pixel"],
            )

    return df.mapInArrow(
        fn, "media_id long, width long, height long, mean_pixel double"
    )


def synthetic_jpeg_media(
    spark, n: int = 32, blocks_x: int = 2, blocks_y: int = 2
) -> DataFrame:
    """Deterministic REAL-JPEG media table: row i is a grayscale image
    of constant 8x8 blocks (block b's value = 128 + 2*(((i+b)*13) %
    50 - 25)), which round-trips EXACTLY at quality 50 (DC-only
    blocks, even level-shifted values — see jpegcodec's exactness
    contract), so tests and oracles can predict decoded pixels in
    closed form despite JPEG being lossy in general."""
    import numpy as np

    from dask_awkward_sandbox_spark.functions.jpegcodec import jpeg_encode

    w, h = blocks_x * 8, blocks_y * 8
    rows = []
    for i in range(n):
        px = np.zeros((h, w), dtype=np.uint8)
        for by in range(blocks_y):
            for bx in range(blocks_x):
                b = by * blocks_x + bx
                px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    128 + 2 * (((i + b) * 13) % 50 - 25)
                )
        rows.append(
            (i, bytearray(jpeg_encode(px, quality=50)),
             ("image", w, h, None, None))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_jpeg(
    df: DataFrame, out_w: int, out_h: int, payload_col: str = "payload",
    quality: int = 90,
) -> DataFrame:
    """decode -> nearest-neighbor resize (the shared :func:`_nn_resize`
    kernel) -> re-encode, JPEG edition."""
    import pyarrow as pa

    from dask_awkward_sandbox_spark.functions.jpegcodec import (
        jpeg_decode,
        jpeg_encode,
    )

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            outs = []
            for buf in b.column(payload_col).to_pylist():
                _w, _h, px = jpeg_decode(bytes(buf))
                outs.append(
                    jpeg_encode(_nn_resize(px, out_w, out_h), quality=quality)
                )
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array([out_w] * len(ids), pa.int64()),
                    pa.array([out_h] * len(ids), pa.int64()),
                    pa.array(outs, pa.binary()),
                ],
                names=["media_id", "width", "height", "payload"],
            )

    return df.mapInArrow(
        fn, "media_id long, width long, height long, payload binary"
    )


def synthetic_png_media(spark, n: int = 32, width: int = 20, height: int = 14) -> DataFrame:
    """Deterministic REAL-PNG media table: row i's pixels are a pure
    function of (i, y, x) — every byte a valid PNG file."""
    import numpy as np

    rows = []
    for i in range(n):
        y, x = np.mgrid[0:height, 0:width]
        px = np.stack(
            [(x * 7 + i) % 256, (y * 11 + 2 * i) % 256, (x + y + 3 * i) % 256],
            axis=-1,
        ).astype(np.uint8)
        rows.append(
            (i, bytearray(_encode_png_py(px)), ("image", width, height, None, None))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_png(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInArrow PNG decode to per-image stats: (media_id, width,
    height, mean_pixel) — full chunk walk + unfilter per image,
    Arrow-batched, payload bytes never on the driver."""
    import numpy as np
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            ws, hs, means = [], [], []
            for buf in b.column(payload_col).to_pylist():
                w, h, px = _decode_png_pixels(bytes(buf))
                ws.append(w)
                hs.append(h)
                means.append(float(np.mean(px)))
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(ws, pa.int64()),
                    pa.array(hs, pa.int64()),
                    pa.array(means, pa.float64()),
                ],
                names=["media_id", "width", "height", "mean_pixel"],
            )

    return df.mapInArrow(
        fn, "media_id long, width long, height long, mean_pixel double"
    )


def resize_png(
    df: DataFrame, out_w: int, out_h: int, payload_col: str = "payload"
) -> DataFrame:
    """decode -> nearest-neighbor resize (the shared :func:`_nn_resize`
    kernel) -> re-encode, PNG edition."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            outs = []
            for buf in b.column(payload_col).to_pylist():
                _w, _h, px = _decode_png_pixels(bytes(buf))
                outs.append(_encode_png_py(_nn_resize(px, out_w, out_h)))
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array([out_w] * len(ids), pa.int64()),
                    pa.array([out_h] * len(ids), pa.int64()),
                    pa.array(outs, pa.binary()),
                ],
                names=["media_id", "width", "height", "payload"],
            )

    return df.mapInArrow(
        fn, "media_id long, width long, height long, payload binary"
    )


# ---------------------------------------------------------------------------
# audio: real WAV/PCM codec (no audio library needed — RIFF headers and
# PCM16 samples are plain structs + numpy, same spirit as the BMP path)
# ---------------------------------------------------------------------------

WAV_HEADER_LEN = 44


def _encode_wav_py(sample_rate: int, samples) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + PCM16 mono samples from an
    int16 numpy array."""
    import struct

    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _decode_wav_samples(buf: bytes):
    """(sample_rate, int16 numpy samples) from PCM16 mono WAV bytes.
    Walks the RIFF chunk list (fmt / data may be preceded by LIST or
    fact chunks in real files) instead of assuming the 44-byte
    layout."""
    import struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", buf, body)
            bits = struct.unpack_from("<H", buf, body + 14)[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(buf, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data


def synthetic_wav_media(spark, n: int = 48, sample_rate: int = 8000) -> DataFrame:
    """Deterministic REAL-WAV media table: row i carries a PCM16 tone
    at (100 + 50*i) Hz, 0.05s long — every byte a valid WAV file."""
    import numpy as np

    rows = []
    for i in range(n):
        t = np.arange(int(sample_rate * 0.05)) / sample_rate
        tone = (np.sin(2 * np.pi * (100 + 50 * i) * t) * 20000).astype(np.int16)
        rows.append(
            (i, bytearray(_encode_wav_py(sample_rate, tone)),
             ("audio", None, None, sample_rate, None))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_wav(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode with no audio library: RIFF chunk walk +
    PCM16 samples, emitting per-clip stats (rate, n_samples, duration,
    rms, peak). Arrow-batched; payload bytes never hit the driver."""
    import numpy as np
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            rates, ns, durs, rms, peak = [], [], [], [], []
            for buf in b.column(payload_col).to_pylist():
                rate, s = _decode_wav_samples(bytes(buf))
                x = s.astype(np.float64)
                rates.append(rate)
                ns.append(len(s))
                durs.append(len(s) / rate)
                rms.append(float(np.sqrt(np.mean(x * x))) if len(s) else 0.0)
                peak.append(int(np.max(np.abs(s))) if len(s) else 0)
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(rates, pa.int64()),
                    pa.array(ns, pa.int64()),
                    pa.array(durs, pa.float64()),
                    pa.array(rms, pa.float64()),
                    pa.array(peak, pa.int64()),
                ],
                names=["media_id", "sample_rate", "n_samples", "duration_s",
                       "rms", "peak"],
            )

    return df.mapInArrow(
        fn,
        "media_id long, sample_rate long, n_samples long, duration_s double, "
        "rms double, peak long",
    )


def resample_wav(
    df: DataFrame, target_rate: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL audio resample (nearest-sample index map, the audio twin
    of resize_bmp's nearest-neighbor), re-encoded as PCM16 WAV."""
    import numpy as np
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            outs, ns = [], []
            for buf in b.column(payload_col).to_pylist():
                rate, s = _decode_wav_samples(bytes(buf))
                n_out = max(1, int(round(len(s) * target_rate / rate)))
                idx = np.minimum(
                    (np.arange(n_out) * rate) // target_rate, max(len(s) - 1, 0)
                )
                res = s[idx] if len(s) else np.zeros(1, dtype=np.int16)
                outs.append(_encode_wav_py(target_rate, res))
                ns.append(len(res))
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array([target_rate] * len(ids), pa.int64()),
                    pa.array(ns, pa.int64()),
                    pa.array(outs, pa.binary()),
                ],
                names=["media_id", "sample_rate", "n_samples", "payload"],
            )

    return df.mapInArrow(
        fn, "media_id long, sample_rate long, n_samples long, payload binary"
    )


def audio_band_features(
    df: DataFrame, n_bands: int = 8, payload_col: str = "payload"
) -> DataFrame:
    """REAL spectral features with numpy only: log power in ``n_bands``
    equal slices of the rfft magnitude spectrum — a deterministic
    mel-filterbank stand-in with the same Spark shape (binary in,
    array<float> out) a learned audio embedder would have."""
    import numpy as np
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            feats = []
            for buf in b.column(payload_col).to_pylist():
                _, s = _decode_wav_samples(bytes(buf))
                spec = np.abs(np.fft.rfft(s.astype(np.float64)))
                bands = np.array_split(spec, n_bands)
                feats.append(
                    [float(np.log1p(np.mean(p * p))) for p in bands]
                )
            yield pa.record_batch(
                [pa.array(ids, pa.int64()),
                 pa.array(feats, pa.list_(pa.float32()))],
                names=["media_id", "feature"],
            )

    return df.mapInArrow(fn, "media_id long, feature array<float>")


# ---------------------------------------------------------------------------
# video: real frame container (fixed-size BMP frames behind an index
# header — an uncompressed MJPEG-style stack, so frame extraction is
# true byte-offset slicing, not a stub)
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"BMPV"


def _encode_video_py(frames) -> bytes:
    """Container bytes from a list of equal-size BMP frame payloads:
    magic + u32 frame count + u32 frame size, then the frames."""
    import struct

    sizes = {len(f) for f in frames}
    if len(sizes) != 1:
        raise ValueError("all frames must be the same encoded size")
    return (
        VIDEO_MAGIC
        + struct.pack("<II", len(frames), sizes.pop())
        + b"".join(frames)
    )


def synthetic_video_media(
    spark, n: int = 8, frames: int = 24, width: int = 16, height: int = 12
) -> DataFrame:
    """Deterministic real-container video table: clip i's frame f is a
    true BMP whose red channel encodes f (a counter the tests can read
    back) — every byte decodable."""
    import numpy as np

    rows = []
    for i in range(n):
        fr = []
        for f in range(frames):
            px = np.zeros((height, width, 3), dtype=np.uint8)
            px[:, :, 2] = (i * 10 + f) % 256  # BMP stores BGR: red plane
            fr.append(_encode_bmp_py(width, height, px))
        rows.append(
            (i, bytearray(_encode_video_py(fr)),
             ("video", width, height, None, frames))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_frames(
    df: DataFrame, every_n: int = 10, payload_col: str = "payload"
) -> DataFrame:
    """REAL frame sampling: byte-offset slice of every n-th frame out
    of the container (the executed form of :func:`frame_sample_plan`,
    which only emits the index list), decoded to per-frame stats plus
    the standalone BMP payload. Arrow-batched; a clip's bytes are
    touched once and only the sampled frames are materialized — the
    contract a 100 TB video corpus needs (seek, don't transcode)."""
    import struct

    import numpy as np
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            ids = b.column("media_id").to_pylist()
            out_id, out_idx, out_mean, out_frame = [], [], [], []
            for mid, buf in zip(ids, b.column(payload_col).to_pylist()):
                buf = bytes(buf)
                if buf[:4] != VIDEO_MAGIC:
                    raise ValueError("not a BMPV payload")
                n_frames, fsize = struct.unpack_from("<II", buf, 4)
                for f in range(0, n_frames, every_n):
                    frame = buf[12 + f * fsize : 12 + (f + 1) * fsize]
                    _, _, px = _decode_bmp_pixels(frame)
                    out_id.append(mid)
                    out_idx.append(f)
                    out_mean.append(float(np.mean(px)))
                    out_frame.append(frame)
            yield pa.record_batch(
                [
                    pa.array(out_id, pa.int64()),
                    pa.array(out_idx, pa.int64()),
                    pa.array(out_mean, pa.float64()),
                    pa.array(out_frame, pa.binary()),
                ],
                names=["media_id", "frame_idx", "mean_pixel", "frame"],
            )

    return df.mapInArrow(
        fn, "media_id long, frame_idx long, mean_pixel double, frame binary"
    )
