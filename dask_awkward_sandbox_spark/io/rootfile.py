"""Minimal ROOT (TFile) byte-level reader/writer for FLAT branches.

The real-bytes half of the ROOT story (io/root.py holds the
partitioned-source machinery; reference parity notes there). This
module decodes the PHYSICAL layer of the public ROOT file format —
the same layout uproot's docs and ROOT's own io documentation
describe:

- the 100-byte TFile header (``root`` magic, fVersion, fBEGIN, fEND,
  big-endian throughout),
- the contiguous TKey record chain (fNbytes/fVersion/fObjlen/fDatime/
  fKeylen/fCycle/fSeekKey/fSeekPdir + three TStrings), including
  freed-slot gap records (negative fNbytes),
- TBasket payloads for flat (one value per entry) branches: raw
  big-endian arrays, either uncompressed (fObjlen == fNbytes-fKeylen)
  or zlib-compressed blocks with the 9-byte ``ZL`` block header,
- the public TTree leaflist type letters (``B b S s I i L l F D O``)
  for element decode.

Jagged branches decode via the public LEAF-COUNTER convention
(``TTree::Branch("Muon_pt", addr, "Muon_pt[nMuon]/D")``): the branch
stores only the concatenated values and per-entry lengths come from
the named counter branch, so list boundaries derive from data this
module already reads — no basket-internal offset tables needed.

What stays GATED (DecodeUnavailable, like multimodal's PIL/ffmpeg):
variable-length branches WITHOUT a counter leaf (their per-entry
offsets live in TBasket/TTree streamer metadata this module does not
parse), LZ4/ZSTD/LZMA baskets, and full TTree/TBranch streamer
decode. One documented simplification: real
ROOT embeds branch objects inside the TTree streamer; here each
branch's leaflist rides as a standalone ``TBranch`` key whose title
is the leaflist — the title-carries-leaflist convention is the real
``TTree::Branch(name, addr, "pt/D")`` contract, only its placement
is simplified. The writer exists so tests can round-trip real bytes
without uproot in the container (the BMP/WAV codec precedent).
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass

import numpy as np

from dask_awkward_sandbox_spark.functions.multimodal import DecodeUnavailable

MAGIC = b"root"
_HEADER_FMT = ">4siiiiiiiBiii"  # magic..fCompress (through byte 42)

# public TTree leaflist letters -> numpy big-endian dtypes
LEAF_DTYPES = {
    "B": ">i1",
    "b": ">u1",
    "S": ">i2",
    "s": ">u2",
    "I": ">i4",
    "i": ">u4",
    "L": ">i8",
    "l": ">u8",
    "F": ">f4",
    "D": ">f8",
    "O": ">u1",  # bool stored as one byte
}


@dataclass
class Key:
    """One parsed TKey record (header only; payload read on demand)."""

    nbytes: int
    objlen: int
    keylen: int
    cycle: int
    seek: int
    classname: str
    name: str
    title: str

    @property
    def compressed(self) -> bool:
        return self.objlen != self.nbytes - self.keylen


def _tstring(b: bytes, off: int) -> tuple[str, int]:
    n = b[off]
    off += 1
    if n == 255:  # long-string escape: 4-byte length follows
        (n,) = struct.unpack_from(">i", b, off)
        off += 4
    return b[off : off + n].decode("utf-8", "replace"), off + n


def _wstring(s: str) -> bytes:
    e = s.encode()
    if len(e) < 255:
        return bytes([len(e)]) + e
    return b"\xff" + struct.pack(">i", len(e)) + e


def parse_key(b: bytes, seek: int) -> Key:
    """Parse one TKey header starting at ``seek`` within ``b``."""
    nbytes, version, objlen, _datime, keylen, cycle = struct.unpack_from(
        ">ihiIhh", b, seek
    )
    off = seek + 18
    if version > 1000:  # big-file keys carry 64-bit seeks
        seekkey, _seekpdir = struct.unpack_from(">qq", b, off)
        off += 16
    else:
        seekkey, _seekpdir = struct.unpack_from(">ii", b, off)
        off += 8
    classname, off = _tstring(b, off)
    name, off = _tstring(b, off)
    title, off = _tstring(b, off)
    if off - seek > keylen:
        raise ValueError(
            f"TKey at {seek}: strings overrun fKeylen ({off - seek} > {keylen})"
        )
    # the WALK position is authoritative for payload location: in a
    # well-formed file fSeekKey equals it, and after external edits
    # (slot reuse, splices) the chain position is the ground truth
    del seekkey
    return Key(nbytes, objlen, keylen, cycle, seek, classname, name, title)


def _decompress(payload: bytes, objlen: int) -> bytes:
    """Decode ROOT compressed-block framing: each block is a 9-byte
    header (2-byte algo tag, 1 method byte, 3-byte LE compressed size,
    3-byte LE uncompressed size) + the stream. Only zlib (``ZL``) is
    decodable here; LZ4/ZSTD/LZMA ("L4"/"ZS"/"XZ") are gated."""
    out = bytearray()
    off = 0
    while len(out) < objlen:
        if off + 9 > len(payload):
            raise ValueError("compressed basket: truncated block header")
        tag = payload[off : off + 2]
        c_size = int.from_bytes(payload[off + 3 : off + 6], "little")
        off += 9
        if tag == b"ZL":
            out += zlib.decompress(payload[off : off + c_size])
        elif tag in (b"L4", b"ZS", b"XZ"):
            raise DecodeUnavailable(
                f"ROOT basket compressed with {tag.decode()} — only zlib (ZL) "
                "blocks are decodable in this container; recompress with "
                "ROOT's kZLIB or use the uproot backend"
            )
        else:
            raise ValueError(f"unknown ROOT compression tag {tag!r}")
        off += c_size
    return bytes(out)


class RootFlatFile:
    """Parsed view of a minimal flat-branch ROOT file.

    ``branches``: {name: leaflist letter}; ``baskets``: {name: [Key]}
    in file order; values decode lazily per basket.
    """

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._buf = f.read()
        b = self._buf
        if b[:4] != MAGIC:
            raise ValueError(f"{path}: not a ROOT file (magic {b[:4]!r})")
        (
            _magic,
            self.version,
            self.begin,
            end,
            _seekfree,
            _nbytesfree,
            _nfree,
            _nbytesname,
            _units,
            self.compress,
            _seekinfo,
            _nbytesinfo,
        ) = struct.unpack_from(_HEADER_FMT, b, 0)
        self.end = end
        self._decoded: dict[str, np.ndarray] = {}
        self.branches: dict[str, str] = {}
        # jagged (leaf-counter) branches: {name: counter_branch_name}
        self.counters: dict[str, str] = {}
        self.baskets: dict[str, list[Key]] = {}
        self.trees: set[str] = set()
        import re as _re

        leaf_re = _re.compile(r"^(\w+)(?:\[(\w+)\])?/(\w)$")
        seek = self.begin
        while seek < self.end:
            (nbytes,) = struct.unpack_from(">i", b, seek)
            if nbytes == 0:
                break
            if nbytes < 0:  # freed slot: gap record of -nbytes bytes
                seek += -nbytes
                continue
            k = parse_key(b, seek)
            if k.classname == "TBranch":
                # documented simplification: leaflist rides as the
                # standalone branch key's title ("pt/D" flat,
                # "pt[n]/D" leaf-counter jagged — TTree::Branch text)
                m = leaf_re.match(k.title)
                if m is None or m.group(3) not in LEAF_DTYPES:
                    raise DecodeUnavailable(
                        f"branch {k.name!r}: leaflist {k.title!r} is not a "
                        "single-leaf flat or counter-jagged type — compound "
                        "branches need TTree streamer metadata (gated; use "
                        "uproot)"
                    )
                nm, counter, leaf = m.groups()
                if nm != k.name:
                    raise ValueError(
                        f"branch key {k.name!r}: leaflist {k.title!r} names "
                        f"a different leaf {nm!r}"
                    )
                self.branches[k.name] = leaf
                if counter is not None:
                    self.counters[k.name] = counter
            elif k.classname == "TBasket":
                # real-ROOT convention: basket key title = tree name
                self.baskets.setdefault(k.name, []).append(k)
                self.trees.add(k.title)
            seek += nbytes

    def _payload(self, k: Key) -> bytes:
        raw = self._buf[k.seek + k.keylen : k.seek + k.nbytes]
        return _decompress(raw, k.objlen) if k.compressed else raw

    def branch_array(self, name: str) -> np.ndarray:
        # memoized per instance (r8 review): jagged reads touch the
        # value stream AND the counter twice (decode + length check) —
        # without the cache every basket decompressed twice per task
        got = self._decoded.get(name)
        if got is not None:
            return got
        if name not in self.branches:
            raise KeyError(f"no branch {name!r}; have {sorted(self.branches)}")
        dt = np.dtype(LEAF_DTYPES[self.branches[name]])
        parts = [
            np.frombuffer(self._payload(k), dtype=dt)
            for k in self.baskets.get(name, [])
        ]
        arr = np.concatenate(parts) if parts else np.empty(0, dtype=dt)
        # normalize to NATIVE byte order unconditionally (r9 advice):
        # pyarrow rejects byte-swapped arrays, and the zero-basket
        # fallback above otherwise keeps the big-endian dtype — an
        # all-empty jagged branch on a valid file would crash read()
        arr = arr.astype(arr.dtype.newbyteorder("="), copy=False)
        if self.branches[name] == "O":
            arr = arr.astype(bool)
        self._decoded[name] = arr
        return arr

    def branch_lengths(self, name: str) -> np.ndarray:
        """Per-entry list lengths of a leaf-counter jagged branch —
        the counter branch's values (the public ``x[n]/T`` contract:
        the branch stores concatenated values, the counter the
        lengths)."""
        if name not in self.counters:
            raise KeyError(f"{name!r} is not a counter-jagged branch")
        counter = self.counters[name]
        if counter not in self.branches:
            raise ValueError(
                f"jagged branch {name!r} names counter {counter!r}, which "
                f"is not a branch in this file ({sorted(self.branches)})"
            )
        if counter in self.counters:
            raise ValueError(f"counter {counter!r} must itself be flat")
        n = self.branch_array(counter).astype(np.int64)
        if (n < 0).any():
            raise ValueError(f"counter {counter!r} holds negative lengths")
        total = len(self.branch_array(name))
        if int(n.sum()) != total:
            raise ValueError(
                f"jagged branch {name!r}: counter sums to {int(n.sum())} "
                f"values but the value stream holds {total}"
            )
        return n

    def num_entries(self) -> int:
        # jagged branches' basket bytes count VALUES, not entries —
        # only flat branches witness the entry count
        counts = {
            name: sum(
                k.objlen // np.dtype(LEAF_DTYPES[self.branches[name]]).itemsize
                for k in ks
            )
            for name, ks in self.baskets.items()
            if name in self.branches and name not in self.counters
        }
        if not counts:
            return 0
        vals = set(counts.values())
        if len(vals) > 1:
            raise ValueError(f"branches disagree on entry count: {counts}")
        return vals.pop()


def _check_small_file_offset(off: int) -> None:
    """The small-file form packs fSeekKey/fEND as 32-bit; the big-file
    form (fVersion+1000000, 64-bit seeks — which :func:`parse_key`
    already READS) is not written here. Directed error instead of a
    struct.error mid-write (r9 advice)."""
    if off > 2**31 - 1:
        raise ValueError(
            "write_root_flat: file would exceed the 2 GiB small-file "
            "limit (32-bit seeks/fEND); split the data across files or "
            "lower basket_entries per file"
        )


def write_root_flat(
    path: str,
    tree: str,
    data: dict[str, tuple[str, np.ndarray]],
    basket_entries: int = 1000,
    compress: bool = False,
) -> None:
    """Write a minimal flat/counter-jagged ROOT file: TFile header +
    one TBranch key per branch (title = leaflist) + TBasket keys
    holding big-endian value arrays, ``basket_entries`` per basket,
    optionally zlib-compressed with the real ``ZL`` block framing.

    ``data``: {branch: (spec, values)} where spec is a leaf letter
    (``"D"``) for a flat branch with ``values`` a 1-D array, or
    ``"[counter]D"`` for a leaf-counter jagged branch with ``values``
    a list of per-entry lists — written as the concatenated value
    stream under the leaflist title ``name[counter]/D``, lengths
    carried by the (flat, required) counter branch.
    """
    parsed: dict[str, tuple[str, str | None, object]] = {}
    for name, (spec, values) in data.items():
        counter = None
        if spec.startswith("["):
            counter, _, leaf = spec[1:].partition("]")
        else:
            leaf = spec
        parsed[name] = (leaf, counter, values)
    lens = {
        name: len(v)
        for name, (_, counter, v) in parsed.items()
        if counter is None
    }
    if len(set(lens.values())) > 1:
        raise ValueError(f"flat branches must align: {lens}")
    for name, (_, counter, v) in parsed.items():
        if counter is None:
            continue
        if counter not in parsed or parsed[counter][1] is not None:
            raise ValueError(
                f"jagged branch {name!r} needs flat counter branch "
                f"{counter!r} in the same write"
            )
        want = [len(x) for x in v]
        got = list(np.asarray(parsed[counter][2]).astype(np.int64))
        if want != got:
            raise ValueError(
                f"jagged branch {name!r}: per-entry lengths disagree with "
                f"counter {counter!r}"
            )

    records: list[bytes] = []

    def key_record(classname: str, name: str, title: str, payload: bytes,
                   objlen: int, seek: int) -> bytes:
        _check_small_file_offset(seek)
        strings = _wstring(classname) + _wstring(name) + _wstring(title)
        keylen = 18 + 8 + len(strings)  # short (version<1000) 32-bit seeks
        head = struct.pack(
            ">ihiIhhii",
            keylen + len(payload),
            4,
            objlen,
            0,
            keylen,
            1,
            seek,
            0,
        )
        return head + strings + payload

    seek = 100
    for name, (leaf, counter, values) in parsed.items():
        if leaf not in LEAF_DTYPES:
            raise ValueError(f"unsupported leaf type {leaf!r} for {name!r}")
        title = f"{name}[{counter}]/{leaf}" if counter else f"{name}/{leaf}"
        rec = key_record("TBranch", name, title, b"", 0, seek)
        records.append(rec)
        seek += len(rec)
        if counter is not None:
            values = [x for sub in values for x in sub]  # value stream
        arr = np.asarray(values).astype(np.dtype(LEAF_DTYPES[leaf]))
        for start in range(0, max(len(arr), 1), basket_entries):
            chunk = arr[start : start + basket_entries]
            if len(chunk) == 0:
                continue
            raw = chunk.tobytes()
            payload = raw
            if compress:
                c = zlib.compress(raw, 6)
                # real ROOT's rule: store RAW when compression does not
                # shrink. This also keeps the reader's size test sound —
                # a framed payload that coincidentally matched the raw
                # length (9 + len(c) == len(raw) happens on mildly
                # compressible data; r8 review found a 64-double
                # witness) would otherwise be misread as uncompressed
                # and decoded as garbage.
                if 9 + len(c) < len(raw):
                    hdr = (
                        b"ZL"
                        + bytes([8])
                        + len(c).to_bytes(3, "little")
                        + len(raw).to_bytes(3, "little")
                    )
                    payload = hdr + c
            rec = key_record("TBasket", name, tree, payload, len(raw), seek)
            records.append(rec)
            seek += len(rec)

    end = seek
    _check_small_file_offset(end)  # last record may push fEND past 32-bit
    header = struct.pack(
        _HEADER_FMT,
        MAGIC,
        63200,
        100,
        end,
        0,
        0,
        0,
        0,
        4,
        101 if compress else 0,
        0,
        0,
    )
    with open(path, "wb") as f:
        f.write(header.ljust(100, b"\x00"))
        for rec in records:
            f.write(rec)
    assert os.path.getsize(path) == end
