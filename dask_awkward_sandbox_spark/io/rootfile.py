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
  or compressed blocks with the 9-byte header — zlib (``ZL``), r10
  LZ4 (``L4``: canonical XXH64 + LZ4 block, ROOT's default
  compression since 6.14; io/lz4block.py implements both public
  formats pure-Python), and r11 ZSTD (``ZS``: a standard RFC 8878
  frame, decoded by io/zstdframe.py's pure-Python decoder; the
  writer encodes via pyarrow's bundled reference libzstd, so every
  round-trip is a cross-implementation check), and r11 LZMA
  (``XZ``: ROOT's kLZMA envelope wraps a standard ``.xz`` container
  stream — decoded/encoded by the stdlib ``lzma`` module, which is
  liblzma itself, so this too is a reference-implementation
  round-trip),
- the public TTree leaflist type letters (``B b S s I i L l F D O``)
  for element decode.

Jagged branches decode via the public LEAF-COUNTER convention
(``TTree::Branch("Muon_pt", addr, "Muon_pt[nMuon]/D")``): the branch
stores only the concatenated values and per-entry lengths come from
the named counter branch, so list boundaries derive from data this
module already reads — no basket-internal offset tables needed.
FIXED-SIZE array branches (``"pos[3]/D"`` — a numeric repeat count,
uproot's regular-array shape; r11) decode as constant-length lists:
the value stream is sliced every k elements, with a directed error
when the stream is not a multiple of the declared size. TLeafC
string branches (``"tag/C"``; r12) decode as one string per entry —
TString bytes behind the basket entry-offset table.

Branch metadata decodes from BOTH layouts (r9): the embedded-streamer
layout real ROOT uses — a ``TTree`` key whose payload streams the
TTree object with its fBranches TObjArray of TBranch/TLeaf, walked
here via the public version-header/TNamed/TObjArray serialization
with byte-count skipping of unmodeled members — and the simplified
standalone-``TBranch``-key layout (title = leaflist, the real
``TTree::Branch(name, addr, "pt/D")`` leaflist contract with
simplified placement; r8).

USER-CLASS branches decode via streamer info (r12): the
"StreamerInfo" TList key's TStreamerInfo records (public
TStreamerInfo/TStreamerElement layout, basic fType codes) provide the
member recipe for (a) unsplit object branches — one version-header +
members record per entry — and (b) TClonesArray branches streamed
MEMBER-WISE. NOTE: the member-wise entry layout implemented here
round-trips THIS module's writer and is validated against it only;
real ROOT places the element class as a "ClassName;version" TString
after fLowerBound with the member-wise bit on the element-class
Version_t, so genuine clones branches misalign (failing loudly on the
span checks) — production clones reads ride uproot.

What stays GATED (DecodeUnavailable, like multimodal's PIL/ffmpeg):
variable-length branches WITHOUT a counter leaf (their per-entry
offsets live in TBasket/TTree streamer metadata this module does not
parse), classes whose streamer declares object/array/base members
(only basic-type members decode), OBJECT-wise TClonesArray streams,
and class/object back-reference tags inside object arrays. All four
ROOT compression algorithms (ZL/L4/ZS/XZ) decode. The writer exists
so tests can round-trip real bytes without uproot in the container
(the BMP/WAV codec precedent); ``embed_tree=True`` writes the
embedded layout.
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

# simple STL containers a TBranchElement can hold that decode here
# (r10, layout corrected to real ROOT placement in r11): per-entry
# payload = 10-byte version header (fByteCount | kByteCountMask,
# fVersion, int32 size) + size big-endian elements; entry boundaries
# come from the basket's entry-offset table at fLast - fKeylen behind
# an int32 count word (keylen-absolute offsets), and the basket key
# ends with the 19-byte TBasket trailer (fields + fHeaderOnly flag
# byte) — the layout uproot reads. Anything else (objects, nested
# beyond one level, non-basic elements) stays gated.
VECTOR_CLASSES = {
    "vector<float>": "F",
    "vector<double>": "D",
    "vector<int>": "I",
    "vector<long>": "L",
    "vector<short>": "S",
}

# one-level nested containers (r11): per-entry payload = 10-byte outer
# version header (fByteCount | kByteCountMask, fVersion, int32 outer
# size) + outer-size HEADERLESS inner runs — uproot's AsVector(True,
# AsVector(False, dtype)) model: each inner vector is int32 size +
# big-endian elements, and each string is a TString (u8 length with
# the 255 -> int32 escape + bytes). Entry boundaries still come from
# the basket entry-offset tables. Deeper nesting / object elements
# stay gated (full streamer-info territory).
NESTED_VECTOR_CLASSES = {
    "vector<vector<float>>": "F",
    "vector<vector<double>>": "D",
    "vector<vector<int>>": "I",
    "vector<vector<long>>": "L",
    "vector<vector<short>>": "S",
}
STRING_VECTOR_CLASS = "vector<string>"

# ---------------------------------------------------------------------------
# Streamer info (r12): user-class TBranchElement decode
#
# Real ROOT describes every streamed class in TStreamerInfo records —
# a TList under the "StreamerInfo" TKey (fSeekInfo) holding, per
# class, a TNamed(classname) + fCheckSum + fClassVersion + a TObjArray
# of TStreamerElements (member name, fType code, fSize, fTypeName).
# This module writes and reads that public layout for SIMPLE classes
# — every member a basic type (the TVirtualStreamerInfo type codes
# below) — and uses the recipe to decode two branch shapes:
#
# - an UNSPLIT user-class branch (TBranchElement, fClassName = the
#   class): per-entry payload = version header + members in
#   declaration order, big-endian; entry boundaries from the basket
#   entry-offset table (the same table the container branches use),
# - a TClonesArray branch (fClassName = "TClonesArray", element class
#   in fClonesName): per-entry payload = version header with the
#   kStreamedMemberWise bit (0x4000) + TObject + fName + int32
#   nobjects + int32 fLowerBound + uint16 element version +
#   MEMBER-WISE runs (all nobjects values of member 0, then member 1,
#   ...). This layout round-trips THIS module's writer; real ROOT
#   streams a "ClassName;version" TString after fLowerBound with the
#   member-wise bit on the element-class Version_t, so genuine clones
#   streams misalign and fail loudly on the span checks (use uproot).
#   Object-wise streams (bit unset), classes with object/array/base
#   members, and back-reference tags stay gated with directed errors
#   naming the uproot backend.
#
# fCheckSum is written 0 (it guards schema evolution on ROOT's side;
# this reader keys on the element list itself and uproot ignores it).
# ---------------------------------------------------------------------------

# public TVirtualStreamerInfo basic-type codes <-> leaflist letters
STREAMER_TYPE_OF_LETTER = {
    "B": 1,   # kChar
    "S": 2,   # kShort
    "I": 3,   # kInt
    "F": 5,   # kFloat
    "D": 8,   # kDouble
    "b": 11,  # kUChar
    "s": 12,  # kUShort
    "i": 13,  # kUInt
    "L": 16,  # kLong64
    "l": 17,  # kULong64
    "O": 18,  # kBool
}
LETTER_OF_STREAMER_TYPE = {v: k for k, v in STREAMER_TYPE_OF_LETTER.items()}
# the C++ type names fTypeName carries for each code
_STREAMER_TYPENAMES = {
    "B": "char", "S": "short", "I": "int", "F": "float", "D": "double",
    "b": "unsigned char", "s": "unsigned short", "i": "unsigned int",
    "L": "Long64_t", "l": "ULong64_t", "O": "bool",
}
_K_MEMBERWISE = 0x4000  # TBuffer::kStreamedMemberWise flag in fVersion
_CLONES_RE_TITLE = "TClonesArray({})"  # standalone-key title encoding


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


# ---------------------------------------------------------------------------
# Embedded TTree streamer layout (r9)
#
# Real ROOT does NOT write branches as standalone keys: the TTree key's
# payload is a streamed TTree object whose fBranches TObjArray embeds
# TBranch objects (each embedding its fLeaves TObjArray of TLeaf*).
# The public serialization building blocks, all implemented here:
#
# - version header: uint32 fByteCount | kByteCountMask (0x40000000),
#   then uint16 fVersion; the byte count delimits the object, which is
#   exactly how real readers SKIP members they do not model,
# - TObject: uint16 version, uint32 fUniqueID, uint32 fBits (+uint16
#   pid if kIsReferenced — handled on read, never written),
# - TNamed: version header + TObject + fName/fTitle TStrings,
# - TObjArray: version header + TObject + fName + int32 nObjects +
#   int32 fLowerBound, elements each preceded by the kNewClassTag
#   (0xFFFFFFFF) + NUL-terminated class name.
#
# Documented simplifications (the remaining distance to files real
# ROOT wrote): fEntries rides as an int64 right after the TTree's
# TNamed (real TTree streams TAttLine/Fill/Marker and a double
# fEntries there), and TBranch/TLeaf members beyond TNamed are not
# written — readers skip unmodeled members via byte counts, which is
# also how THIS reader survives richer payloads: it reads each
# branch's name + leaflist title and byte-count-skips the rest.
# ---------------------------------------------------------------------------

_BYTECOUNT_MASK = 0x40000000
_NEW_CLASS_TAG = 0xFFFFFFFF
_IS_REFERENCED = 1 << 4  # TObject::kIsReferenced


def _w_version(body: bytes, version: int) -> bytes:
    return struct.pack(">IH", (len(body) + 2) | _BYTECOUNT_MASK, version) + body


def _r_version(b: bytes, off: int) -> tuple[int, int, int]:
    """-> (end_offset_of_object, version, offset_after_header)."""
    (bc,) = struct.unpack_from(">I", b, off)
    if not bc & _BYTECOUNT_MASK:
        raise ValueError(f"streamer object at {off}: missing kByteCountMask")
    (version,) = struct.unpack_from(">H", b, off + 4)
    return off + 4 + (bc & ~_BYTECOUNT_MASK), version, off + 6


def _w_tobject() -> bytes:
    return struct.pack(">HII", 1, 0, 0x03000000)


def _r_tobject(b: bytes, off: int) -> int:
    _v, _uid, bits = struct.unpack_from(">HII", b, off)
    off += 10
    if bits & _IS_REFERENCED:
        off += 2  # pid tag
    return off


def _w_tnamed(name: str, title: str) -> bytes:
    return _w_version(_w_tobject() + _wstring(name) + _wstring(title), 1)


def _r_tnamed(b: bytes, off: int) -> tuple[str, str, int]:
    end, _v, off = _r_version(b, off)
    off = _r_tobject(b, off)
    name, off = _tstring(b, off)
    title, off = _tstring(b, off)
    return name, title, end  # byte count is authoritative for the end


def _w_objarray(elements: list[tuple[str, bytes]]) -> bytes:
    body = _w_tobject() + _wstring("") + struct.pack(">ii", len(elements), 0)
    for classname, obj in elements:
        body += struct.pack(">I", _NEW_CLASS_TAG)
        body += classname.encode() + b"\x00"
        body += obj
    return _w_version(body, 3)


def _r_objarray(b: bytes, off: int):
    """Yield (classname, obj_start, obj_end) per element; assumes every
    element carries the new-class tag (what the writer emits; richer
    tag forms — class refs/object refs — are gated)."""
    end, _v, off = _r_version(b, off)
    off = _r_tobject(b, off)
    _name, off = _tstring(b, off)
    n, _lower = struct.unpack_from(">ii", b, off)
    off += 8
    out = []
    for _ in range(n):
        (tag,) = struct.unpack_from(">I", b, off)
        off += 4
        if tag != _NEW_CLASS_TAG:
            raise DecodeUnavailable(
                "TObjArray element uses a class/object back-reference tag "
                f"(0x{tag:08x}) — only new-class-tag streams decode here; "
                "use the uproot backend"
            )
        nul = b.index(b"\x00", off)
        classname = b[off:nul].decode()
        off = nul + 1
        obj_end, _ver, _body = _r_version(b, off)
        out.append((classname, off, obj_end))
        off = obj_end
    if off > end:
        raise ValueError("TObjArray elements overran the array byte count")
    return out, end


def _w_streamer_element(name: str, letter: str) -> bytes:
    """TStreamerBasicType: version(2){ TStreamerElement version(4){
    TNamed(member, "") + fType + fSize + fArrayLength + fArrayDim +
    fMaxIndex[5] + fTypeName } } — the public element layout."""
    size = int(np.dtype(LEAF_DTYPES[letter]).itemsize)
    base = _w_version(
        _w_tnamed(name, "")
        + struct.pack(">iiii", STREAMER_TYPE_OF_LETTER[letter], size, 0, 0)
        + struct.pack(">5i", 0, 0, 0, 0, 0)
        + _wstring(_STREAMER_TYPENAMES[letter]),
        4,
    )
    return _w_version(base, 2)


def _w_streamerinfo_list(classes: dict[str, list[tuple[str, str]]]) -> bytes:
    """The StreamerInfo key payload: a streamed TList(v5) of
    TStreamerInfo(v9) records — TNamed(classname) + uint32 fCheckSum
    (written 0, documented above) + int32 fClassVersion + fElements
    TObjArray. TList elements each carry the new-class tag + a
    trailing (empty) per-element option TString."""
    body = _w_tobject() + _wstring("") + struct.pack(">i", len(classes))
    for cname, members in classes.items():
        info = _w_version(
            _w_tnamed(cname, "")
            + struct.pack(">Ii", 0, 1)
            + _w_objarray(
                [("TStreamerBasicType", _w_streamer_element(n, l)) for n, l in members]
            ),
            9,
        )
        body += struct.pack(">I", _NEW_CLASS_TAG) + b"TStreamerInfo\x00"
        body += info
        body += b"\x00"  # empty option TString
    return _w_version(body, 5)


def _r_streamerinfo_list(b: bytes) -> dict[str, list[tuple[str, str]]]:
    """-> {classname: [(member, leaf letter)]} of the FULLY-BASIC
    classes only. Real ROOT StreamerInfo lists carry records this
    module does not model — infos for ROOT's own classes (TTree,
    TBranch, ... with TStreamerBase/object members), class/object
    back-reference tags after the first occurrence, schema-evolution
    rule lists — so the walk is TOLERANT: any entry or member element
    it cannot model is SKIPPED (not raised on), and a back-reference
    tag (whose byte span is not navigable without the reference
    table) STOPS the walk, keeping the classes collected so far. The
    directed use-uproot error is raised lazily by
    _resolve_pending_classes / branch access, only when a branch
    actually needs a class that is not in the returned registry."""
    _end, _v, off = _r_version(b, 0)
    off = _r_tobject(b, off)
    _name, off = _tstring(b, off)
    (n,) = struct.unpack_from(">i", b, off)
    off += 4
    out: dict[str, list[tuple[str, str]]] = {}
    for _ in range(n):
        (tag,) = struct.unpack_from(">I", b, off)
        off += 4
        if tag != _NEW_CLASS_TAG:
            # back-reference tag: no byte count to skip by — stop here
            break
        nul = b.index(b"\x00", off)
        cls = b[off:nul].decode()
        off = nul + 1
        obj_end, _ver, p = _r_version(b, off)
        if cls == "TStreamerInfo":
            members = _r_one_streamerinfo(b, p)
            if members is not None:
                cname, mems = members
                out[cname] = mems
        # anything else in the list (and any unmodeled TStreamerInfo):
        # skip via byte count — unmodeled entries must not break the
        # walk
        off = obj_end
        _opt, off = _tstring(b, off)  # per-element option string
    return out


def _r_one_streamerinfo(
    b: bytes, p: int
) -> tuple[str, list[tuple[str, str]]] | None:
    """Parse one TStreamerInfo record body at ``p``; return
    (classname, [(member, letter)]) when EVERY element is a modeled
    basic-type member, else None (the class is simply not registered
    — branches that need it get the directed error lazily)."""
    try:
        cname, _t, p = _r_tnamed(b, p)
        _chk, _cver = struct.unpack_from(">Ii", b, p)
        els, _aend = _r_objarray(b, p + 8)
        members: list[tuple[str, str]] = []
        for ecls, eoff, _eend in els:
            if ecls != "TStreamerBasicType":
                return None  # object/array/base/string member
            _e_end, _ev, ep = _r_version(b, eoff)  # TStreamerBasicType
            _be_end, _bv, bp = _r_version(b, ep)   # TStreamerElement base
            mname, _mt, named_end = _r_tnamed(b, bp)
            ftype, fsize = struct.unpack_from(">ii", b, named_end)
            letter = LETTER_OF_STREAMER_TYPE.get(ftype)
            if letter is None:
                return None  # counter/array-dim/object type code
            want = int(np.dtype(LEAF_DTYPES[letter]).itemsize)
            if fsize != want:
                return None  # array-shaped basic member (fSize = k*want)
            members.append((mname, letter))
        return cname, members
    except (DecodeUnavailable, ValueError, struct.error, IndexError):
        # elements TObjArray with back-reference element tags, or any
        # layout this module does not model — skip the class
        return None


def _w_tree_payload(tree: str, branches: dict[str, str], entries: int) -> bytes:
    """Streamed TTree payload: TNamed + int64 entries + fBranches
    TObjArray of TBranch (TNamed name/leaflist + fLeaves TObjArray of
    one TLeaf, class by leaf letter). A title that names a simple STL
    class (``vector<float>``) streams as a TBranchElement instead:
    TNamed(name, "") + fClassName TString — the member real readers
    key the container decode on (r10)."""
    els = []
    for name, title in branches.items():
        if title.startswith("TClonesArray("):
            # clones branch (r12): fClassName "TClonesArray" followed
            # by fClonesName — the element-class member real readers
            # key the per-element decode on
            be_body = (
                _w_tnamed(name, "")
                + _wstring("TClonesArray")
                + _wstring(title[len("TClonesArray("):-1])
            )
            els.append(("TBranchElement", _w_version(be_body, 10)))
            continue
        if (
            title in VECTOR_CLASSES
            or title in NESTED_VECTOR_CLASSES
            or title == STRING_VECTOR_CLASS
            or "/" not in title  # user-class branch: title is the class
        ):
            be_body = _w_tnamed(name, "") + _wstring(title)
            els.append(("TBranchElement", _w_version(be_body, 10)))
            continue
        leaf_letter = title.rsplit("/", 1)[-1]
        leaf_cls = f"TLeaf{leaf_letter.upper()}" if leaf_letter.isalpha() else "TLeaf"
        leaf = _w_version(_w_tnamed(name, title), 1)
        branch_body = _w_tnamed(name, title) + _w_objarray([(leaf_cls, leaf)])
        els.append(("TBranch", _w_version(branch_body, 13)))
    body = (
        _w_tnamed(tree, "")
        + struct.pack(">q", entries)
        + _w_objarray(els)
    )
    return _w_version(body, 20)


def _r_tree_payload(b: bytes) -> tuple[str, int, dict[str, str]]:
    """-> (tree_name, entries, {branch: leaflist title}). Walks only
    name/title/byte-count structure; unmodeled members inside each
    TBranch are skipped via the byte counts (the real-reader move)."""
    _end, _v, off = _r_version(b, 0)
    tree, _title, off = _r_tnamed(b, off)
    (entries,) = struct.unpack_from(">q", b, off)
    off += 8
    els, _aend = _r_objarray(b, off)
    out: dict[str, str] = {}
    for classname, obj_off, _obj_end in els:
        if classname == "TBranchElement":
            # simple-container / user-class branch (r10/r12): TNamed +
            # fClassName (+ fClonesName when fClassName is
            # TClonesArray); the class rides in the title slot of the
            # result so _register_branch dispatches on it
            _bend, _bver, boff = _r_version(b, obj_off)
            name, _title, named_end = _r_tnamed(b, boff)
            clsname, after = _tstring(b, named_end)
            if clsname == "TClonesArray":
                clones_cls, _ = _tstring(b, after)
                clsname = _CLONES_RE_TITLE.format(clones_cls)
            out[name] = clsname
            continue
        if classname != "TBranch":
            raise DecodeUnavailable(
                f"fBranches holds a {classname} — only plain TBranch "
                "and simple-container TBranchElement decode here (use "
                "the uproot backend)"
            )
        _bend, _bver, boff = _r_version(b, obj_off)
        name, title, _ = _r_tnamed(b, boff)
        out[name] = title
    return tree, int(entries), out


def _decompress(payload: bytes, objlen: int) -> bytes:
    """Decode ROOT compressed-block framing: each block is a 9-byte
    header (2-byte algo tag, 1 method byte, 3-byte LE compressed size,
    3-byte LE uncompressed size) + the stream. zlib (``ZL``) and LZ4
    (``L4`` — ROOT's default since 6.14; 8-byte canonical XXH64 of the
    compressed block, verified, then the LZ4 block; r10), ZSTD
    (``ZS`` — RFC 8878 frame via io/zstdframe.py; r11) and LZMA
    (``XZ`` — a standard ``.xz`` container stream via the stdlib
    ``lzma`` module; r11) all decode."""
    from dask_awkward_sandbox_spark.io.lz4block import (
        lz4_block_decompress,
        xxh64,
    )

    out = bytearray()
    off = 0
    while len(out) < objlen:
        if off + 9 > len(payload):
            raise ValueError("compressed basket: truncated block header")
        tag = payload[off : off + 2]
        c_size = int.from_bytes(payload[off + 3 : off + 6], "little")
        u_size = int.from_bytes(payload[off + 6 : off + 9], "little")
        off += 9
        if tag == b"ZL":
            out += zlib.decompress(payload[off : off + c_size])
        elif tag == b"L4":
            # ROOT's kLZ4 frame: 8-byte canonical (big-endian) XXH64 of
            # the compressed block precedes it; c_size counts both
            if c_size < 8:
                raise ValueError("L4 block: size smaller than its checksum")
            want = int.from_bytes(payload[off : off + 8], "big")
            block = payload[off + 8 : off + c_size]
            if xxh64(block) != want:
                raise ValueError(
                    "L4 block: XXH64 checksum mismatch (corrupt basket)"
                )
            out += lz4_block_decompress(block, u_size)
        elif tag == b"ZS":
            # ROOT's kZSTD envelope wraps a standard zstd frame
            # (RFC 8878); decoded by the pure-Python frame decoder
            # (r11), content checksum verified when the frame has one
            from dask_awkward_sandbox_spark.io.zstdframe import decompress

            out += decompress(payload[off : off + c_size], u_size)
        elif tag == b"XZ":
            # ROOT's kLZMA envelope wraps a standard .xz container
            # stream; the stdlib lzma module IS liblzma, so this is a
            # reference decode. Non-xz bytes fail the 6-byte stream
            # magic / CRC checks loudly — never decode garbage.
            import lzma

            try:
                piece = lzma.decompress(payload[off : off + c_size])
            except lzma.LZMAError as exc:
                raise ValueError(f"XZ block: invalid xz stream ({exc})")
            if len(piece) != u_size:
                raise ValueError(
                    "XZ block: decompressed size mismatch "
                    f"({len(piece)} != header {u_size})"
                )
            out += piece
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
        _magic, self.version, self.begin = struct.unpack_from(">4sii", b, 0)
        if self.version > 1_000_000:
            # big-file form (files >= 2 GiB — the common case for real
            # HEP datasets): fEND/fSeekFree/fSeekInfo widen to 64-bit,
            # announced by fVersion + 1000000 (public TFile layout)
            end, _seekfree = struct.unpack_from(">qq", b, 12)
            (_nbytesfree, _nfree, _nbytesname) = struct.unpack_from(">iii", b, 28)
            (self.compress,) = struct.unpack_from(">i", b, 41)
        else:
            (
                end,
                _seekfree,
                _nbytesfree,
                _nfree,
                _nbytesname,
                _units,
                self.compress,
                _seekinfo,
                _nbytesinfo,
            ) = struct.unpack_from(">iiiiiBiii", b, 12)
        self.end = end
        self._decoded: dict[str, np.ndarray] = {}
        self._veclens: dict[str, np.ndarray] = {}
        self.branches: dict[str, str] = {}
        # jagged (leaf-counter) branches: {name: counter_branch_name}
        self.counters: dict[str, str] = {}
        # fixed-size array branches ("pos[3]/D" — the public leaflist
        # contract with a NUMERIC repeat count; r11): {name: k}.
        # uproot surfaces these as regular arrays; here they read as
        # lists of constant length k
        self.fixed_lens: dict[str, int] = {}
        # TLeafC string branches ("tag/C", r12): one C-string per
        # entry — TString bytes per entry, boundaries from the basket
        # entry-offset table (variable-size leaves always carry one)
        self.cstrings: set[str] = set()
        # simple-container TBranchElement branches (r10): lengths come
        # from each basket's entry-offset table, not a counter branch
        self.vectors: set[str] = set()
        # r11: one-level nested containers — vector<vector<basic>>
        # (inner lengths from the headerless inner runs) and
        # vector<string> (TString elements)
        self.nested_vectors: set[str] = set()
        self.string_vectors: set[str] = set()
        self._inner_lens: dict[str, np.ndarray] = {}
        # r12: user-class branches decoded via streamer-info records —
        # {branch: classname}; streamers = {classname: [(member,
        # letter)]} parsed from the "StreamerInfo" TList key
        self.objects: dict[str, str] = {}
        self.clones: dict[str, str] = {}
        # r13: class branches whose streamer is absent/not fully basic
        # — {branch: directed error}; raised lazily on access, never
        # at open (real files always carry unmodeled streamer records)
        self.unresolved: dict[str, str] = {}
        self.streamers: dict[str, list[tuple[str, str]]] = {}
        self._obj_members: dict[str, dict[str, np.ndarray]] = {}
        self._obj_count: dict[str, int] = {}
        # class-titled branches seen before the StreamerInfo key (real
        # ROOT writes it at the END of the file) — resolved post-walk
        self._pending_classes: list[tuple[str, str]] = []
        self.baskets: dict[str, list[Key]] = {}
        self.trees: set[str] = set()
        self._embedded_entries: int | None = None
        seek = self.begin
        while seek < self.end:
            (nbytes,) = struct.unpack_from(">i", b, seek)
            if nbytes == 0:
                break
            if nbytes < 0:  # freed slot: gap record of -nbytes bytes
                seek += -nbytes
                continue
            k = parse_key(b, seek)
            if k.classname == "TBranchElement":
                # standalone-key layout twin of the embedded form: the
                # container class rides in the title
                self._register_branch(k.name, k.title)
            elif k.classname == "TBranch":
                # simplified layout: leaflist rides as the standalone
                # branch key's title ("pt/D" flat, "pt[n]/D"
                # leaf-counter jagged — TTree::Branch text)
                self._register_branch(k.name, k.title)
            elif k.classname == "TTree":
                # real-ROOT layout (r9): branches embedded in the
                # streamed TTree payload — walk name/title/byte-count
                # structure, skip unmodeled members via byte counts
                tname, entries, brs = _r_tree_payload(self._payload(k))
                self.trees.add(tname)
                self._embedded_entries = entries
                for name, title in brs.items():
                    self._register_branch(name, title)
            elif k.classname == "TBasket":
                # real-ROOT convention: basket key title = tree name
                self.baskets.setdefault(k.name, []).append(k)
                self.trees.add(k.title)
            elif k.classname == "TList" and k.name == "StreamerInfo":
                # r12: the class-description records (fSeekInfo in real
                # files; recognized by name here since the walk visits
                # every key anyway)
                self.streamers = _r_streamerinfo_list(self._payload(k))
            seek += nbytes
        self._resolve_pending_classes()

    _LEAF_RE = None  # compiled lazily below

    def _register_branch(self, name: str, title: str) -> None:
        import re as _re

        if title in VECTOR_CLASSES:
            self.branches[name] = VECTOR_CLASSES[title]
            self.vectors.add(name)
            return
        if title in NESTED_VECTOR_CLASSES:
            self.branches[name] = NESTED_VECTOR_CLASSES[title]
            self.nested_vectors.add(name)
            return
        if title == STRING_VECTOR_CLASS:
            self.branches[name] = "C"  # ROOT's character-string letter
            self.string_vectors.add(name)
            return
        if title.startswith("vector<") or title.startswith("std::"):
            raise DecodeUnavailable(
                f"branch {name!r}: container class {title!r} — "
                f"{sorted(VECTOR_CLASSES)}, {sorted(NESTED_VECTOR_CLASSES)} "
                f"and {STRING_VECTOR_CLASS!r} decode here (deeper nesting "
                "and object elements need full streamer-info; use uproot)"
            )
        cls = type(self)
        if cls._LEAF_RE is None:
            cls._LEAF_RE = _re.compile(r"^(\w+)(?:\[(\w+)\])?/(\w)$")
        m = cls._LEAF_RE.match(title)
        if m is None or (m.group(3) not in LEAF_DTYPES and m.group(3) != "C"):
            # a class-shaped title (bare identifier, or the clones
            # form) resolves against the streamer registry AFTER the
            # key walk — real ROOT writes StreamerInfo at file end
            if title.startswith("TClonesArray(") and title.endswith(")"):
                self._pending_classes.append((name, title))
                return
            if title.isidentifier():
                self._pending_classes.append((name, title))
                return
            raise DecodeUnavailable(
                f"branch {name!r}: leaflist {title!r} is not a "
                "single-leaf flat or counter-jagged type — compound "
                "branches need full streamer-info decode (gated; use "
                "uproot)"
            )
        nm, counter, leaf = m.groups()
        if nm != name:
            raise ValueError(
                f"branch {name!r}: leaflist {title!r} names "
                f"a different leaf {nm!r}"
            )
        if leaf == "C":
            # TLeafC (r12): one C-string per entry; a repeat count on
            # a string leaf has no public single-leaf meaning
            if counter is not None:
                raise DecodeUnavailable(
                    f"branch {name!r}: counter/sized string leaflist "
                    f"{title!r} — only plain 'name/C' decodes here "
                    "(use uproot)"
                )
            self.branches[name] = "C"
            self.cstrings.add(name)
            return
        self.branches[name] = leaf
        if counter is not None:
            if counter.isdigit():
                k = int(counter)
                if k < 1:
                    raise ValueError(
                        f"branch {name!r}: fixed array size must be >= 1, "
                        f"got {title!r}"
                    )
                self.fixed_lens[name] = k
            else:
                self.counters[name] = counter

    def _resolve_pending_classes(self) -> None:
        """Bind class-titled branches to their streamer recipes (r12).
        Runs after the key walk so it does not matter whether the
        StreamerInfo key precedes or follows the branch metadata.

        r13: a branch whose class has NO fully-basic streamer record
        (the tolerant walk skips unmodeled records) does not fail the
        open — real files always carry unmodeled infos for ROOT's own
        classes, and a reader touching only the flat/jagged branches
        must not care. The branch lands in ``self.unresolved`` and the
        directed use-uproot error is raised only when it is actually
        requested (branch_array / schema / member access)."""
        for name, title in self._pending_classes:
            if title.startswith("TClonesArray("):
                cls = title[len("TClonesArray("):-1]
                if cls not in self.streamers:
                    self.unresolved[name] = (
                        f"branch {name!r}: TClonesArray of {cls!r}, but this "
                        "file carries no fully-basic StreamerInfo record for "
                        "it — only classes whose streamer has exclusively "
                        "basic-type members decode here (use uproot)"
                    )
                    continue
                self.clones[name] = cls
            else:
                if title not in self.streamers:
                    self.unresolved[name] = (
                        f"branch {name!r}: class {title!r} has no fully-basic "
                        "StreamerInfo record in this file — object branches "
                        "decode only when a streamer record describes their "
                        "members as all basic types (use uproot)"
                    )
                    continue
                self.objects[name] = title
            # marker entry so the branch lists/validations see it; all
            # decode dispatch is via self.objects/self.clones
            self.branches[name] = title
        self._pending_classes.clear()

    def object_members(self, name: str) -> dict[str, np.ndarray]:
        """Member arrays of an unsplit user-class branch (r12): one
        value per entry per member, in streamer declaration order."""
        if name in self.unresolved:
            raise DecodeUnavailable(self.unresolved[name])
        if name not in self.objects:
            raise KeyError(f"{name!r} is not a user-class object branch")
        if name not in self._obj_members:
            self._decode_object_baskets(name)
        return self._obj_members[name]

    def clones_members(self, name: str) -> dict[str, np.ndarray]:
        """Concatenated member value streams of a TClonesArray branch
        (r12); per-entry element counts come from
        :meth:`branch_lengths`."""
        if name in self.unresolved:
            raise DecodeUnavailable(self.unresolved[name])
        if name not in self.clones:
            raise KeyError(f"{name!r} is not a TClonesArray branch")
        if name not in self._obj_members:
            self._decode_clones_baskets(name)
        return self._obj_members[name]

    def _decode_object_baskets(self, name: str) -> None:
        """Decode an unsplit user-class branch: per-entry payload is a
        version header (byte count + fClassVersion) followed by the
        class's basic members in streamer declaration order, big-
        endian. Every entry has the same fixed size, so headers
        validate and members gather with vectorized fancy indexing —
        no per-entry Python loop (the _decode_vector_baskets
        pattern)."""
        members = self.streamers[self.objects[name]]
        sizes = [int(np.dtype(LEAF_DTYPES[l]).itemsize) for _, l in members]
        total = sum(sizes)
        parts: dict[str, list[np.ndarray]] = {m: [] for m, _ in members}
        count = 0
        for payload, offs, ends in self._entry_spans(name, min_span=6):
            nev = len(offs)
            if nev == 0:
                continue
            if ((ends - offs) != 6 + total).any():
                raise ValueError(
                    f"object basket {name!r}: entry spans disagree with the "
                    f"class size ({total} member bytes + 6-byte header)"
                )
            pay = np.frombuffer(payload, dtype=np.uint8, count=int(ends[-1]))
            hidx = (offs[:, None] + np.arange(4)[None, :]).ravel()
            hdr = pay[hidx].reshape(nev, 4).astype(np.int64)
            bc = (hdr[:, 0] << 24) | (hdr[:, 1] << 16) | (hdr[:, 2] << 8) | hdr[:, 3]
            if ((bc & _BYTECOUNT_MASK) == 0).any():
                raise ValueError(
                    f"object basket {name!r}: entry header missing "
                    "kByteCountMask"
                )
            if ((bc & ~_BYTECOUNT_MASK) != 2 + total).any():
                raise ValueError(
                    f"object basket {name!r}: entry byte count disagrees "
                    "with the streamer member sizes"
                )
            moff = 6
            for (mname, letter), isz in zip(members, sizes):
                dt = np.dtype(LEAF_DTYPES[letter])
                idx = (offs[:, None] + (moff + np.arange(isz))[None, :]).ravel()
                parts[mname].append(np.frombuffer(pay[idx].tobytes(), dtype=dt))
                moff += isz
            count += nev
        self._obj_members[name] = {
            m: self._native(np.concatenate(v) if v else
                            np.empty(0, dtype=np.dtype(LEAF_DTYPES[l])), l)
            for (m, l), v in zip(members, (parts[m] for m, _ in members))
        }
        self._obj_count[name] = count

    def _decode_clones_baskets(self, name: str) -> None:
        """Decode a TClonesArray branch streamed MEMBER-WISE (the
        kStreamedMemberWise bit in the entry's fVersion): version
        header + TObject + fName + int32 nobjects + int32 fLowerBound
        + uint16 element version, then all nobjects values of each
        member consecutively. This is THIS module's writer layout —
        real ROOT's member-wise clones framing differs (element class
        as a trailing TString, bit on the element Version_t) and
        misaligns here, failing loudly on the span/header checks; the
        variable-length fName forces a per-entry walk anyway, so
        production clones reads ride uproot. Object-wise streams are
        gated with a directed error."""
        members = self.streamers[self.clones[name]]
        parts: dict[str, list[np.ndarray]] = {m: [] for m, _ in members}
        lens: list[int] = []
        for payload, offs, ends in self._entry_spans(name, min_span=6):
            for o, e in zip(offs.tolist(), ends.tolist()):
                bc, ver = struct.unpack_from(">IH", payload, o)
                if not bc & _BYTECOUNT_MASK:
                    raise ValueError(
                        f"clones basket {name!r}: entry header missing "
                        "kByteCountMask"
                    )
                if not ver & _K_MEMBERWISE:
                    raise DecodeUnavailable(
                        f"clones basket {name!r}: OBJECT-wise TClonesArray "
                        "stream (kStreamedMemberWise unset) — only the "
                        "member-wise default decodes here (use uproot)"
                    )
                p = _r_tobject(payload, o + 6)
                _nm, p = _tstring(payload, p)
                nobj, _lower = struct.unpack_from(">ii", payload, p)
                p += 8
                if nobj < 0:
                    raise ValueError(
                        f"clones basket {name!r}: negative element count"
                    )
                p += 2  # element-class fClassVersion
                lens.append(nobj)
                for mname, letter in members:
                    dt = np.dtype(LEAF_DTYPES[letter])
                    if p + nobj * dt.itemsize > e:
                        raise ValueError(
                            f"clones basket {name!r}: member run overruns "
                            "its entry span"
                        )
                    parts[mname].append(
                        np.frombuffer(payload, dtype=dt, count=nobj, offset=p)
                    )
                    p += nobj * dt.itemsize
                if p != e:
                    raise ValueError(
                        f"clones basket {name!r}: entry has trailing bytes "
                        "after its member runs"
                    )
        self._obj_members[name] = {
            m: self._native(np.concatenate(v) if v else
                            np.empty(0, dtype=np.dtype(LEAF_DTYPES[l])), l)
            for (m, l), v in zip(members, (parts[m] for m, _ in members))
        }
        self._veclens[name] = np.asarray(lens, dtype=np.int64)

    @staticmethod
    def _native(arr: np.ndarray, letter: str) -> np.ndarray:
        arr = arr.astype(arr.dtype.newbyteorder("="), copy=False)
        return arr.astype(bool) if letter == "O" else arr

    def _payload(self, k: Key) -> bytes:
        raw = self._buf[k.seek + k.keylen : k.seek + k.nbytes]
        return _decompress(raw, k.objlen) if k.compressed else raw

    # real ROOT TBasket key trailer: the 18 bytes of fVersion
    # fBufferSize fNevBufSize fNevBuf fLast, then ONE flag byte
    # (fHeaderOnly encoding) — 19 bytes total inside fKeylen.
    _BASKET_TRAILER = ">HIIII"  # fVersion fBufferSize fNevBufSize fNevBuf fLast
    _BASKET_TRAILER_LEN = 19

    def _entry_spans(self, name: str, min_span: int = 10):
        """Yield (payload, offs, ends) per basket of a container
        branch: the entry-offset table parse shared by the flat
        (r10) and nested/string (r11) container decoders and the
        object/clones decoders (r12). ``offs``/``ends`` are
        keylen-relative byte spans of each entry's serialized payload,
        validated monotone with at least ``min_span`` bytes per entry
        (10 for containers: version header + int32 size; 6 for
        user-class objects: version header only)."""
        for k in self.baskets.get(name, []):
            tl = self._BASKET_TRAILER_LEN
            tr = self._buf[k.seek + k.keylen - tl : k.seek + k.keylen]
            if len(tr) != tl:
                raise ValueError(
                    f"vector basket {name!r}: key too short for the "
                    "entry-offset trailer"
                )
            _ver, _bufsz, _nevsz, nev, flast = struct.unpack(
                self._BASKET_TRAILER, tr[:18]
            )
            payload = self._payload(k)
            data_len = flast - k.keylen  # border: end of entry data
            if not 0 <= data_len <= len(payload) or data_len + 4 + 4 * nev > len(
                payload
            ):
                raise ValueError(
                    f"vector basket {name!r}: entry-offset table overruns "
                    "the basket"
                )
            (count_word,) = struct.unpack_from(">i", payload, data_len)
            if count_word != nev:
                raise ValueError(
                    f"vector basket {name!r}: offset-table count word "
                    f"{count_word} disagrees with fNevBuf {nev}"
                )
            offs = (
                np.frombuffer(
                    payload, dtype=">i4", count=nev, offset=data_len + 4
                )
                .astype(np.int64)
                - k.keylen
            )
            ends = np.append(offs[1:], data_len)
            if nev and (
                offs[0] != 0
                or (np.diff(offs) < min_span).any()
                or data_len < offs[-1] + min_span
            ):
                raise ValueError(
                    f"vector basket {name!r}: non-monotone or truncated "
                    "entry-offset table"
                )
            yield payload, offs, ends

    def _decode_nested_vector_baskets(self, name: str) -> None:
        """Decode a one-level nested container branch
        (vector<vector<basic>>): per entry, the 10-byte outer version
        header gives the outer size; each inner vector is a HEADERLESS
        int32 size + big-endian elements run (uproot's
        AsVector(True, AsVector(False, dtype)) model). The inner walk
        is a data-dependent sequential scan, so this is a per-entry
        loop — container branches are a per-file read path, and a
        production 100 TB read of deeply nested HEP data should ride
        a native uproot wheel anyway (same honesty note as
        io/lz4block.py)."""
        dt = np.dtype(LEAF_DTYPES[self.branches[name]])
        isz = dt.itemsize
        vals: list[np.ndarray] = []
        outer: list[int] = []
        inner: list[int] = []
        for payload, offs, ends in self._entry_spans(name):
            pay = payload
            for o, e in zip(offs.tolist(), ends.tolist()):
                bc, _ver, n_out = struct.unpack_from(">IHI", pay, o)
                if not bc & _BYTECOUNT_MASK:
                    raise ValueError(
                        f"nested basket {name!r}: entry header missing "
                        "kByteCountMask"
                    )
                if (bc & ~_BYTECOUNT_MASK) != e - o - 4:
                    raise ValueError(
                        f"nested basket {name!r}: entry byte count "
                        "disagrees with the offset-table span"
                    )
                outer.append(n_out)
                p = o + 10
                for _ in range(n_out):
                    (n_in,) = struct.unpack_from(">i", pay, p)
                    p += 4
                    if n_in < 0 or p + n_in * isz > e:
                        raise ValueError(
                            f"nested basket {name!r}: inner run overruns "
                            "its entry span"
                        )
                    inner.append(n_in)
                    vals.append(
                        np.frombuffer(pay, dtype=dt, count=n_in, offset=p)
                    )
                    p += n_in * isz
                if p != e:
                    raise ValueError(
                        f"nested basket {name!r}: entry has trailing bytes "
                        "after its inner runs"
                    )
        arr = (
            np.concatenate(vals) if vals else np.empty(0, dtype=dt)
        ).astype(dt.newbyteorder("="), copy=False)
        self._decoded[name] = arr
        self._veclens[name] = np.asarray(outer, dtype=np.int64)
        self._inner_lens[name] = np.asarray(inner, dtype=np.int64)

    def _decode_string_vector_baskets(self, name: str) -> None:
        """Decode a vector<string> branch: 10-byte outer header + n
        TStrings (u8 length, 255 -> int32 escape, then bytes)."""
        strings: list[str] = []
        outer: list[int] = []
        for payload, offs, ends in self._entry_spans(name):
            for o, e in zip(offs.tolist(), ends.tolist()):
                bc, _ver, n_out = struct.unpack_from(">IHI", payload, o)
                if not bc & _BYTECOUNT_MASK:
                    raise ValueError(
                        f"string basket {name!r}: entry header missing "
                        "kByteCountMask"
                    )
                outer.append(n_out)
                p = o + 10
                for _ in range(n_out):
                    if p >= e:
                        raise ValueError(
                            f"string basket {name!r}: string run overruns "
                            "its entry span"
                        )
                    s, p = _tstring(payload, p)
                    strings.append(s)
                if p != e:
                    raise ValueError(
                        f"string basket {name!r}: entry has trailing bytes "
                        "after its strings"
                    )
        self._decoded[name] = np.asarray(strings, dtype=object)
        self._veclens[name] = np.asarray(outer, dtype=np.int64)

    def _decode_cstring_baskets(self, name: str) -> None:
        """Decode a TLeafC branch (r12): each entry is ONE TString
        (u8 length with the 255 -> int32 escape + bytes), boundaries
        from the basket entry-offset table; an entry whose string does
        not exactly fill its span fails loudly."""
        strings: list[str] = []
        for payload, offs, ends in self._entry_spans(name, min_span=1):
            for o, e in zip(offs.tolist(), ends.tolist()):
                s, p = _tstring(payload, o)
                if p != e:
                    raise ValueError(
                        f"string basket {name!r}: entry bytes disagree with "
                        "the offset-table span"
                    )
                strings.append(s)
        self._decoded[name] = np.asarray(strings, dtype=object)

    def _decode_vector_baskets(self, name: str) -> None:
        """Decode a simple-container (TBranchElement) branch laid out
        the way real ROOT places it (uproot-compatible): the basket
        key ends with the 19-byte TBasket trailer (18 bytes of fields
        + the fHeaderOnly flag byte), the payload holds per-entry
        [10-byte version header + int32 size + big-endian elements]
        runs, and the entry-offset table sits at ``fLast - fKeylen``
        behind a leading int32 count word (TBuffer::WriteArray's
        length prefix) with keylen-absolute offsets. Fully vectorized:
        headers are gathered and validated with one fancy-index pass,
        values with one boolean mask — no per-entry Python loop."""
        dt = np.dtype(LEAF_DTYPES[self.branches[name]])
        isz = dt.itemsize
        vals: list[np.ndarray] = []
        lens: list[np.ndarray] = []
        for payload, offs, ends in self._entry_spans(name):
            nev = len(offs)
            data_len = int(ends[-1]) if nev else 0
            if nev == 0:
                lens.append(np.empty(0, dtype=np.int64))
                continue
            n = (ends - offs - 10) // isz
            if ((ends - offs - 10) % isz).any():
                raise ValueError(
                    f"vector basket {name!r}: entry byte spans are not a "
                    f"multiple of the {isz}-byte element"
                )
            pay = np.frombuffer(payload, dtype=np.uint8, count=data_len)
            hidx = (offs[:, None] + np.arange(10)[None, :]).ravel()
            hdr = pay[hidx].reshape(nev, 10).astype(np.int64)
            bc = (hdr[:, 0] << 24) | (hdr[:, 1] << 16) | (hdr[:, 2] << 8) | hdr[:, 3]
            size = (hdr[:, 6] << 24) | (hdr[:, 7] << 16) | (hdr[:, 8] << 8) | hdr[:, 9]
            if ((bc & _BYTECOUNT_MASK) == 0).any():
                raise ValueError(
                    f"vector basket {name!r}: entry header missing "
                    "kByteCountMask"
                )
            if ((bc & ~_BYTECOUNT_MASK) != 6 + n * isz).any() or (size != n).any():
                raise ValueError(
                    f"vector basket {name!r}: entry header size disagrees "
                    "with the offset-table span"
                )
            keep = np.ones(data_len, dtype=bool)
            keep[hidx] = False
            vals.append(np.frombuffer(pay[keep].tobytes(), dtype=dt))
            lens.append(n)
        arr = (
            np.concatenate(vals) if vals else np.empty(0, dtype=dt)
        ).astype(dt.newbyteorder("="), copy=False)
        self._decoded[name] = arr
        self._veclens[name] = (
            np.concatenate(lens) if lens else np.empty(0, dtype=np.int64)
        )

    def _vector_entry_count(self, name: str) -> int:
        """Entry count of a vector branch from the basket trailers
        alone — no decompression."""
        total = 0
        tl = self._BASKET_TRAILER_LEN
        for k in self.baskets.get(name, []):
            tr = self._buf[k.seek + k.keylen - tl : k.seek + k.keylen]
            if len(tr) == tl:
                total += struct.unpack(self._BASKET_TRAILER, tr[:18])[3]
        return total

    def branch_array(self, name: str) -> np.ndarray:
        # memoized per instance (r8 review): jagged reads touch the
        # value stream AND the counter twice (decode + length check) —
        # without the cache every basket decompressed twice per task
        got = self._decoded.get(name)
        if got is not None:
            return got
        if name in self.unresolved:
            raise DecodeUnavailable(self.unresolved[name])
        if name not in self.branches:
            raise KeyError(f"no branch {name!r}; have {sorted(self.branches)}")
        if name in self.vectors:
            self._decode_vector_baskets(name)
            return self._decoded[name]
        if name in self.nested_vectors:
            self._decode_nested_vector_baskets(name)
            return self._decoded[name]
        if name in self.string_vectors:
            self._decode_string_vector_baskets(name)
            return self._decoded[name]
        if name in self.objects or name in self.clones:
            raise TypeError(
                f"branch {name!r} holds user-class objects — read its "
                "member arrays via object_members()/clones_members()"
            )
        if name in self.cstrings:
            self._decode_cstring_baskets(name)
            return self._decoded[name]
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
        """Per-entry list lengths of a jagged branch: the counter
        branch's values for a leaf-counter branch (the public
        ``x[n]/T`` contract), or the basket entry-offset table's spans
        for a simple-container TBranchElement (r10)."""
        if name in self.vectors:
            if name not in self._veclens:
                self._decode_vector_baskets(name)
            return self._veclens[name]
        if name in self.nested_vectors or name in self.string_vectors:
            if name not in self._veclens:
                self.branch_array(name)
            return self._veclens[name]
        if name in self.clones:
            if name not in self._veclens:
                self._decode_clones_baskets(name)
            return self._veclens[name]
        if name in self.fixed_lens:
            k = self.fixed_lens[name]
            total = len(self.branch_array(name))
            if total % k:
                raise ValueError(
                    f"fixed-size branch {name!r}: value stream holds "
                    f"{total} elements, not a multiple of the declared "
                    f"size {k}"
                )
            return np.full(total // k, k, dtype=np.int64)
        if name in self.unresolved:
            raise DecodeUnavailable(self.unresolved[name])
        if name not in self.counters:
            raise KeyError(f"{name!r} is not a counter-jagged branch")
        return self._counter_lengths(name)

    def branch_inner_lengths(self, name: str) -> np.ndarray:
        """Per-INNER-vector lengths of a vector<vector<basic>> branch
        (r11): one entry per inner vector, in entry order; pairs with
        :meth:`branch_lengths` (outer sizes) to rebuild the
        list<list<T>> structure over the flat value stream."""
        if name not in self.nested_vectors:
            raise KeyError(f"{name!r} is not a nested-container branch")
        if name not in self._inner_lens:
            self.branch_array(name)
        return self._inner_lens[name]

    def _counter_lengths(self, name: str) -> np.ndarray:
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
        # flat branches witness the entry count directly; vector
        # branches witness it through their basket trailers' fNevBuf
        counts = {
            name: sum(
                k.objlen // np.dtype(LEAF_DTYPES[self.branches[name]]).itemsize
                for k in ks
            )
            # fixed-size array branches hold k values per entry — their
            # basket bytes witness the entry count after dividing by k
            // self.fixed_lens.get(name, 1)
            for name, ks in self.baskets.items()
            if name in self.branches
            and name not in self.counters
            and name not in self.vectors
            and name not in self.nested_vectors
            and name not in self.string_vectors
            and name not in self.objects
            and name not in self.clones
            and name not in self.cstrings
        }
        counts.update(
            {
                name: self._vector_entry_count(name)
                for name in (
                    self.vectors | self.nested_vectors | self.string_vectors
                    | self.cstrings | set(self.objects) | set(self.clones)
                )
                if self.baskets.get(name)
            }
        )
        if not counts:
            # zero-basket file: the embedded TTree (if any) still
            # declares fEntries
            return self._embedded_entries or 0
        vals = set(counts.values())
        if len(vals) > 1:
            raise ValueError(f"branches disagree on entry count: {counts}")
        n = vals.pop()
        if self._embedded_entries is not None and self._embedded_entries != n:
            raise ValueError(
                f"TTree declares {self._embedded_entries} entries but "
                f"flat-branch baskets hold {n}"
            )
        return n


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
    compress: bool | str = False,
    embed_tree: bool = False,
    big_file: bool = False,
    classes: dict[str, list[tuple[str, str]]] | None = None,
) -> None:
    """Write a minimal flat/counter-jagged ROOT file: TFile header +
    branch metadata + TBasket keys holding big-endian value arrays,
    ``basket_entries`` per basket, optionally compressed with the real
    block framing: ``compress=True``/``"zlib"`` writes ``ZL`` blocks,
    ``"lz4"`` (r10) writes ``L4`` blocks — 9-byte header + canonical
    XXH64 of the compressed block + the LZ4 block, the frame real ROOT
    has written by default since 6.14.

    ``embed_tree`` (r9) selects the branch-metadata layout:
    False — one standalone ``TBranch`` key per branch (title =
    leaflist; the r8 simplification); True — ONE ``TTree`` key whose
    payload is a streamed TTree object embedding TBranch/TLeaf via
    version headers, TNamed, and TObjArray with new-class tags — the
    layout real ROOT uses (member simplifications documented at
    :func:`_w_tree_payload`). Both layouts read back through the SAME
    :class:`RootFlatFile` walk.

    ``data``: {branch: (spec, values)} where spec is a leaf letter
    (``"D"``) for a flat branch with ``values`` a 1-D array, or
    ``"[counter]D"`` for a leaf-counter jagged branch with ``values``
    a list of per-entry lists — written as the concatenated value
    stream under the leaflist title ``name[counter]/D``, lengths
    carried by the (flat, required) counter branch.

    ``big_file`` (r9) writes the >= 2 GiB form real HEP files use:
    fVersion + 1000000 with 64-bit fEND/fSeekFree/fSeekInfo and
    version-1004 keys carrying 64-bit fSeekKey/fSeekPdir (which
    :func:`parse_key` reads). The small form keeps its directed
    2 GiB guard; at 100 TB every production file should be big-form.

    ``classes`` (r12) registers simple user classes —
    {classname: [(member, leaf letter)]} — written as TStreamerInfo
    records in a trailing "StreamerInfo" TList key (where real ROOT
    puts them). Two new specs use them: ``"obj:Cls"`` (values = one
    member tuple per entry; unsplit user-class TBranchElement) and
    ``"clones:Cls"`` (values = one list of member tuples per entry;
    TClonesArray streamed member-wise with the kStreamedMemberWise
    version bit — this module's framing, not byte-exact real ROOT;
    see _decode_clones_baskets).
    """
    if compress not in (False, True, "zlib", "lz4", "zstd", "lzma"):
        raise ValueError(
            "compress must be False/True/'zlib'/'lz4'/'zstd'/'lzma', "
            f"got {compress!r}"
        )
    classes = classes or {}
    for cname, members in classes.items():
        bad = [(m, l) for m, l in members if l not in STREAMER_TYPE_OF_LETTER]
        if bad or not members:
            raise ValueError(
                f"class {cname!r}: members must be (name, basic leaf "
                f"letter) pairs from {sorted(STREAMER_TYPE_OF_LETTER)}, "
                f"got {bad or 'none'}"
            )
    parsed: dict[str, tuple[str, str | None, object]] = {}
    vectors: set[str] = set()
    nested: set[str] = set()
    strvecs: set[str] = set()
    cstrs: set[str] = set()
    objbr: dict[str, str] = {}
    clonesbr: dict[str, str] = {}
    titles: dict[str, str] = {}
    for name, (spec, values) in data.items():
        counter = None
        if spec.startswith("obj:") or spec.startswith("clones:"):
            kind, _, cname = spec.partition(":")
            if cname not in classes:
                raise ValueError(
                    f"branch {name!r}: spec {spec!r} needs class {cname!r} "
                    "in the classes= registry"
                )
            nm = len(classes[cname])
            ents = values if kind == "clones" else [[v] for v in values]
            for i, ent in enumerate(ents):
                wrong = [t for t in ent if len(t) != nm]
                if wrong:
                    raise ValueError(
                        f"branch {name!r}: entry {i} holds a "
                        f"{len(wrong[0])}-tuple, class {cname!r} has "
                        f"{nm} members"
                    )
            if kind == "obj":
                objbr[name] = cname
                titles[name] = cname
            else:
                clonesbr[name] = cname
                titles[name] = _CLONES_RE_TITLE.format(cname)
            parsed[name] = (None, None, values)
            continue
        if spec in VECTOR_CLASSES:
            # simple-container TBranchElement (r10): values are a list
            # of per-entry lists; lengths ride in the basket
            # entry-offset tables, no counter branch
            vectors.add(name)
            leaf = VECTOR_CLASSES[spec]
            titles[name] = spec
        elif spec in NESTED_VECTOR_CLASSES:
            # r11: values are a list (entries) of lists (inner
            # vectors) of element lists; inner runs are headerless
            nested.add(name)
            leaf = NESTED_VECTOR_CLASSES[spec]
            titles[name] = spec
        elif spec == STRING_VECTOR_CLASS:
            strvecs.add(name)
            leaf = "C"
            titles[name] = spec
        elif spec == "C":
            # TLeafC (r12): one C-string per entry, written like the
            # container branches — TString entry payloads behind the
            # basket entry-offset table + 19-byte trailer
            cstrs.add(name)
            leaf = "C"
        elif spec.startswith("["):
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
        if counter.isdigit():
            # fixed-size array branch ("pos[3]/D"): every entry must
            # hold exactly k values; entry count joins the alignment
            # check with the flat branches
            k = int(counter)
            if k < 1:
                raise ValueError(
                    f"fixed-size branch {name!r}: size must be >= 1"
                )
            bad = [i for i, x in enumerate(v) if len(x) != k]
            if bad:
                raise ValueError(
                    f"fixed-size branch {name!r}: entry {bad[0]} holds "
                    f"{len(v[bad[0]])} values, declared size is {k}"
                )
            lens[name] = len(v)
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
    # re-check alignment: fixed-size branches joined lens above
    if len(set(lens.values())) > 1:
        raise ValueError(f"flat branches must align: {lens}")

    records: list[bytes] = []

    def key_len(classname: str, name: str, title: str, trailer_len: int = 0) -> int:
        strings = _wstring(classname) + _wstring(name) + _wstring(title)
        return 18 + (16 if big_file else 8) + len(strings) + trailer_len

    def key_record(classname: str, name: str, title: str, payload: bytes,
                   objlen: int, seek: int, trailer: bytes = b"") -> bytes:
        strings = _wstring(classname) + _wstring(name) + _wstring(title) + trailer
        if big_file:
            keylen = 18 + 16 + len(strings)  # version>1000: 64-bit seeks
            head = struct.pack(
                ">ihiIhhqq",
                keylen + len(payload), 1004, objlen, 0, keylen, 1, seek, 0,
            )
        else:
            _check_small_file_offset(seek)
            keylen = 18 + 8 + len(strings)  # short form: 32-bit seeks
            head = struct.pack(
                ">ihiIhhii",
                keylen + len(payload), 4, objlen, 0, keylen, 1, seek, 0,
            )
        return head + strings + payload

    seek = 100
    for name, (leaf, counter, _values) in parsed.items():
        if name in objbr or name in clonesbr:
            continue  # class branches: titles set, leaf is the streamer's
        if leaf not in LEAF_DTYPES and name not in strvecs and name not in cstrs:
            raise ValueError(f"unsupported leaf type {leaf!r} for {name!r}")
        if name not in vectors and name not in nested and name not in strvecs:
            titles[name] = (
                f"{name}[{counter}]/{leaf}" if counter else f"{name}/{leaf}"
            )

    def compress_payload(raw: bytes) -> bytes:
        if compress == "zstd":
            # kZSTD: the envelope wraps a standard RFC 8878 frame.
            # Encoding rides pyarrow's bundled reference libzstd (the
            # container has no zstd wheel), which also makes every
            # round-trip test a REAL cross-implementation check:
            # reference C encoder -> this repo's pure-Python frame
            # decoder (io/zstdframe.py).
            import pyarrow as pa

            frame = pa.Codec("zstd").compress(raw, asbytes=True)
            if 9 + len(frame) < len(raw):
                return (
                    b"ZS"
                    + bytes([1])
                    + len(frame).to_bytes(3, "little")
                    + len(raw).to_bytes(3, "little")
                    + frame
                )
            return raw
        if compress == "lzma":
            # kLZMA: the envelope wraps a standard .xz container
            # stream (stdlib lzma == liblzma, the reference encoder).
            import lzma

            stream = lzma.compress(raw, format=lzma.FORMAT_XZ, preset=6)
            if 9 + len(stream) < len(raw):
                return (
                    b"XZ"
                    + bytes([1])
                    + len(stream).to_bytes(3, "little")
                    + len(raw).to_bytes(3, "little")
                    + stream
                )
            return raw
        if compress == "lz4":
            from dask_awkward_sandbox_spark.io.lz4block import (
                lz4_block_compress,
                xxh64,
            )

            block = lz4_block_compress(raw)
            framed = xxh64(block).to_bytes(8, "big") + block
            # real ROOT's rule (both algos): store RAW when compression
            # does not shrink — see the ZL note below
            if 9 + len(framed) < len(raw):
                return (
                    b"L4"
                    + bytes([1])
                    + len(framed).to_bytes(3, "little")
                    + len(raw).to_bytes(3, "little")
                    + framed
                )
        elif compress:
            c = zlib.compress(raw, 6)
            # real ROOT's rule: store RAW when compression does not
            # shrink. This also keeps the reader's size test sound —
            # a framed payload that coincidentally matched the raw
            # length (9 + len(c) == len(raw) happens on mildly
            # compressible data; r8 review found a 64-double
            # witness) would otherwise be misread as uncompressed
            # and decoded as garbage.
            if 9 + len(c) < len(raw):
                return (
                    b"ZL"
                    + bytes([8])
                    + len(c).to_bytes(3, "little")
                    + len(raw).to_bytes(3, "little")
                    + c
                )
        return raw
    if embed_tree:
        n_entries = next(iter(lens.values()), 0)
        payload = _w_tree_payload(tree, titles, n_entries)
        rec = key_record("TTree", tree, "", payload, len(payload), seek)
        records.append(rec)
        seek += len(rec)
    for name, (leaf, counter, values) in parsed.items():
        is_class = name in objbr or name in clonesbr
        if not embed_tree:
            cls = (
                "TBranchElement"
                if name in vectors or name in nested or name in strvecs
                or is_class
                else "TBranch"
            )
            rec = key_record(cls, name, titles[name], b"", 0, seek)
            records.append(rec)
            seek += len(rec)
        if is_class:
            members = classes[objbr.get(name) or clonesbr[name]]
            dts = [np.dtype(LEAF_DTYPES[l]) for _, l in members]

            def _pack_members(tup) -> bytes:
                return b"".join(
                    np.asarray(v).astype(dt).tobytes()
                    for v, dt in zip(tup, dts)
                )

            def _entry_payload(ent) -> bytes:
                if name in objbr:
                    body = _pack_members(ent)
                    return (
                        struct.pack(">IH", (2 + len(body)) | _BYTECOUNT_MASK, 1)
                        + body
                    )
                # TClonesArray, member-wise: TObject + fName + counts +
                # element-class version, then per member all values
                body = (
                    _w_tobject()
                    + _wstring("")
                    + struct.pack(">ii", len(ent), 0)
                    + struct.pack(">H", 1)
                )
                for j, dt in enumerate(dts):
                    body += np.asarray(
                        [t[j] for t in ent]
                    ).astype(dt).tobytes()
                return (
                    struct.pack(
                        ">IH",
                        (2 + len(body)) | _BYTECOUNT_MASK,
                        3 | _K_MEMBERWISE,
                    )
                    + body
                )

            kl = key_len("TBasket", name, tree, trailer_len=19)
            for start in range(0, max(len(values), 1), basket_entries):
                ents = values[start : start + basket_entries]
                if not ents:
                    continue
                data_buf = bytearray()
                offs: list[int] = []
                for ent in ents:
                    offs.append(kl + len(data_buf))
                    data_buf += _entry_payload(ent)
                flast = kl + len(data_buf)
                raw = (
                    bytes(data_buf)
                    + struct.pack(">i", len(ents))
                    + b"".join(struct.pack(">i", o) for o in offs)
                )
                trailer = struct.pack(
                    ">HIIII", 3, len(raw), 4, len(ents), flast
                ) + bytes([0])
                rec = key_record(
                    "TBasket", name, tree, compress_payload(raw), len(raw),
                    seek, trailer=trailer,
                )
                records.append(rec)
                seek += len(rec)
            continue
        if name in vectors or name in nested or name in strvecs or name in cstrs:
            dt = (
                np.dtype(LEAF_DTYPES[leaf])
                if name not in strvecs and name not in cstrs
                else None
            )

            def _entry_payload(ent) -> bytes:
                if name in cstrs:
                    # TLeafC: a bare TString per entry, no version
                    # header (the leaflist contract, not an object)
                    return _wstring(ent)
                if name in vectors:
                    a = np.asarray(ent).astype(dt)
                    return (
                        struct.pack(
                            ">IHI",
                            (6 + dt.itemsize * len(a)) | _BYTECOUNT_MASK,
                            9,
                            len(a),
                        )
                        + a.tobytes()
                    )
                if name in nested:
                    # outer header + HEADERLESS inner runs (int32 size
                    # + elements) — uproot's AsVector(True,
                    # AsVector(False, dtype)) layout
                    body = bytearray()
                    for inner in ent:
                        a = np.asarray(inner).astype(dt)
                        body += struct.pack(">i", len(a)) + a.tobytes()
                    return (
                        struct.pack(
                            ">IHI",
                            (6 + len(body)) | _BYTECOUNT_MASK,
                            9,
                            len(ent),
                        )
                        + bytes(body)
                    )
                # vector<string>: outer header + TStrings
                body = bytearray()
                for s in ent:
                    body += _wstring(s)
                return (
                    struct.pack(
                        ">IHI",
                        (6 + len(body)) | _BYTECOUNT_MASK,
                        9,
                        len(ent),
                    )
                    + bytes(body)
                )

            kl = key_len("TBasket", name, tree, trailer_len=19)
            for start in range(0, max(len(values), 1), basket_entries):
                ents = values[start : start + basket_entries]
                if not ents:
                    continue
                data_buf = bytearray()
                offs: list[int] = []
                for ent in ents:
                    offs.append(kl + len(data_buf))
                    data_buf += _entry_payload(ent)
                flast = kl + len(data_buf)
                # real ROOT placement: entry data, then the offset
                # table as TBuffer::WriteArray emits it — int32 count
                # word + keylen-absolute offsets (uproot reads the
                # offsets at border+4)
                raw = (
                    bytes(data_buf)
                    + struct.pack(">i", len(ents))
                    + b"".join(struct.pack(">i", o) for o in offs)
                )
                # 19-byte trailer: the five fields + fHeaderOnly flag
                trailer = struct.pack(
                    ">HIIII", 3, len(raw), 4, len(ents), flast
                ) + bytes([0])
                rec = key_record(
                    "TBasket", name, tree, compress_payload(raw), len(raw),
                    seek, trailer=trailer,
                )
                records.append(rec)
                seek += len(rec)
            continue
        if counter is not None:
            values = [x for sub in values for x in sub]  # value stream
        arr = np.asarray(values).astype(np.dtype(LEAF_DTYPES[leaf]))
        for start in range(0, max(len(arr), 1), basket_entries):
            chunk = arr[start : start + basket_entries]
            if len(chunk) == 0:
                continue
            raw = chunk.tobytes()
            rec = key_record("TBasket", name, tree, compress_payload(raw), len(raw), seek)
            records.append(rec)
            seek += len(rec)

    if classes:
        # trailing StreamerInfo key — where real ROOT writes the class
        # descriptions (fSeekInfo points at the file tail). r14: the
        # key is COMPRESSED under the file's algorithm like any other
        # key (real ROOT compresses it; the reader's _payload
        # decompresses every key generically), so the compressed
        # round-trip tests exercise the tolerant walk through a
        # compressed streamer payload too.
        payload = _w_streamerinfo_list(classes)
        rec = key_record(
            "TList", "StreamerInfo", "Doubly linked list",
            compress_payload(payload), len(payload), seek,
        )
        records.append(rec)
        seek += len(rec)

    end = seek
    # public fCompress encoding: algorithm*100 + level (zlib=1xx,
    # lzma=2xx, lz4=4xx, zstd=5xx)
    fcompress = 0 if not compress else {
        "lz4": 404, "zstd": 503, "lzma": 206,
    }.get(compress, 101)
    if big_file:
        header = struct.pack(
            ">4sii" + "qqiiiBiqi",
            MAGIC, 1_063_200, 100,
            end, 0, 0, 0, 0, 8, fcompress, 0, 0,
        )
    else:
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
            fcompress,
            0,
            0,
        )
    with open(path, "wb") as f:
        f.write(header.ljust(100, b"\x00"))
        for rec in records:
            f.write(rec)
    assert os.path.getsize(path) == end
