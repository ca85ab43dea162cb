"""GAM (Graph Alignment/Map) codec.

A from-scratch reader/writer for vg's GAM format: a BGZF stream of
type-tagged protobuf message groups (tag "GAM"), each message a
`vg.Alignment`. Field numbers were verified empirically against the
reference fixtures (`test/reconstructInputSeq/test_reads.gam`,
`test/input_files/alignments/*.gam`) and match libvgio's vg.proto:

    Alignment: sequence=1 path=2 name=3 quality=4 (raw phred bytes)
               mapping_quality=5 score=6 is_secondary=15 identity=16
               time_used=35 read_paired=24 annotation=100
    Path:      name=1 mapping=2 is_circular=4 length=5
    Mapping:   position=1 edit=2 rank=5
    Position:  node_id=1 offset=2 is_reverse=4 name=5
    Edit:      from_length=1 to_length=2 sequence=3

Group framing: ``varint(count) tag-string [count-1 length-prefixed
messages]`` — a count of 1 is a tag-only (empty) group. Reference
consumer: `src/readGAM.h:37-51` via vg::io::for_each.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Iterator, List

from . import bgzf

TAG = b"GAM"


# ---------------------------------------------------------------- data model
@dataclass
class Position:
    node_id: int = 0
    offset: int = 0
    is_reverse: bool = False


@dataclass
class Edit:
    from_length: int = 0
    to_length: int = 0
    sequence: str = ""

    @property
    def is_match(self) -> bool:
        # vg::io::edit_is_match (`src/vgan_utils.h:41`)
        return self.from_length == self.to_length and not self.sequence

    @property
    def is_sub(self) -> bool:
        return self.from_length == self.to_length and bool(self.sequence)

    @property
    def is_insertion(self) -> bool:
        return self.from_length == 0 and self.to_length > 0

    @property
    def is_deletion(self) -> bool:
        return self.to_length == 0 and self.from_length > 0


@dataclass
class Mapping:
    position: Position = field(default_factory=Position)
    edits: List[Edit] = field(default_factory=list)
    rank: int = 0


@dataclass
class Path:
    name: str = ""
    mappings: List[Mapping] = field(default_factory=list)


@dataclass
class Alignment:
    """Mirror of the fields vgan consumes (`src/AlignmentInfo.h:16-46`)."""

    sequence: str = ""
    path: Path = field(default_factory=Path)
    name: str = ""
    quality: bytes = b""  # raw phred values (NOT ascii+33)
    mapping_quality: int = 0
    score: int = 0
    identity: float = 0.0
    read_paired: bool = False
    is_secondary: bool = False

    @property
    def is_mapped(self) -> bool:
        # vgan treats identity != 0 as mapped (`src/readGAM.h:47`)
        return self.identity != 0


# ---------------------------------------------------------------- wire format
def _rv(b: bytes, p: int):
    s = 0
    v = 0
    while True:
        x = b[p]
        p += 1
        v |= (x & 0x7F) << s
        if not (x & 0x80):
            return v, p
        s += 7


def _wv(v: int) -> bytes:
    out = bytearray()
    while True:
        x = v & 0x7F
        v >>= 7
        if v:
            out.append(x | 0x80)
        else:
            out.append(x)
            return bytes(out)


def _iter_fields(b: bytes):
    p = 0
    while p < len(b):
        key, p = _rv(b, p)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, p = _rv(b, p)
        elif wt == 2:
            l, p = _rv(b, p)
            v = b[p : p + l]
            p += l
        elif wt == 5:
            v = struct.unpack("<f", b[p : p + 4])[0]
            p += 4
        elif wt == 1:
            v = struct.unpack("<d", b[p : p + 8])[0]
            p += 8
        else:  # pragma: no cover - groups unsupported
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _parse_position(b: bytes) -> Position:
    pos = Position()
    for fn, _, v in _iter_fields(b):
        if fn == 1:
            pos.node_id = v
        elif fn == 2:
            pos.offset = v
        elif fn == 4:
            pos.is_reverse = bool(v)
    return pos


def _parse_edit(b: bytes) -> Edit:
    e = Edit()
    for fn, _, v in _iter_fields(b):
        if fn == 1:
            e.from_length = v
        elif fn == 2:
            e.to_length = v
        elif fn == 3:
            e.sequence = v.decode()
    return e


def _parse_mapping(b: bytes) -> Mapping:
    m = Mapping()
    for fn, _, v in _iter_fields(b):
        if fn == 1:
            m.position = _parse_position(v)
        elif fn == 2:
            m.edits.append(_parse_edit(v))
        elif fn == 5:
            m.rank = v
    return m


def _parse_path(b: bytes) -> Path:
    pth = Path()
    for fn, _, v in _iter_fields(b):
        if fn == 1:
            pth.name = v.decode()
        elif fn == 2:
            pth.mappings.append(_parse_mapping(v))
    return pth


def parse_alignment(b: bytes) -> Alignment:
    a = Alignment()
    for fn, _, v in _iter_fields(b):
        if fn == 1:
            a.sequence = v.decode()
        elif fn == 2:
            a.path = _parse_path(v)
        elif fn == 3:
            a.name = v.decode()
        elif fn == 4:
            a.quality = bytes(v)
        elif fn == 5:
            a.mapping_quality = v
        elif fn == 6:
            a.score = v
        elif fn == 15:
            a.is_secondary = bool(v)
        elif fn == 16:
            a.identity = v
        elif fn == 24:
            a.read_paired = bool(v)
    return a


def iter_messages(payload: bytes) -> Iterator[bytes]:
    p = 0
    n = len(payload)
    while p < n:
        count, p = _rv(payload, p)
        tl, p = _rv(payload, p)
        tag = payload[p : p + tl]
        p += tl
        if tag != TAG:
            raise ValueError(f"unexpected group tag {tag!r}")
        for _ in range(count - 1):
            ml, p = _rv(payload, p)
            yield payload[p : p + ml]
            p += ml


def read_gam(path: str, native: bool = True) -> List[Alignment]:
    """Decode a GAM file. Delegates to the C++ codec
    (cpp/gamcodec.cpp, the production hot path — CLAUDE.md rule) when
    the native lib is built; the pure-Python decode below is the
    fallback and the byte-parity oracle (tests/test_io.py)."""
    if native:
        from . import gam_native

        out = gam_native.read_gam_native(path)
        if out is not None:
            return out
    payload = bgzf.read_file(path)
    return [parse_alignment(m) for m in iter_messages(payload)]


def iter_gam(path: str) -> Iterator[Alignment]:
    payload = bgzf.read_file(path)
    for m in iter_messages(payload):
        yield parse_alignment(m)


# ---------------------------------------------------------------- encoding
def _tag_bytes(fn: int, wt: int) -> bytes:
    return _wv((fn << 3) | wt)


def _enc_len(fn: int, b: bytes) -> bytes:
    return _tag_bytes(fn, 2) + _wv(len(b)) + b


def _enc_varint(fn: int, v: int) -> bytes:
    return _tag_bytes(fn, 0) + _wv(v)


def _enc_double(fn: int, v: float) -> bytes:
    return _tag_bytes(fn, 1) + struct.pack("<d", v)


def encode_position(pos: Position) -> bytes:
    out = b""
    if pos.node_id:
        out += _enc_varint(1, pos.node_id)
    if pos.offset:
        out += _enc_varint(2, pos.offset)
    if pos.is_reverse:
        out += _enc_varint(4, 1)
    return out


def encode_edit(e: Edit) -> bytes:
    out = b""
    if e.from_length:
        out += _enc_varint(1, e.from_length)
    if e.to_length:
        out += _enc_varint(2, e.to_length)
    if e.sequence:
        out += _enc_len(3, e.sequence.encode())
    return out


def encode_mapping(m: Mapping) -> bytes:
    out = _enc_len(1, encode_position(m.position))
    for e in m.edits:
        out += _enc_len(2, encode_edit(e))
    if m.rank:
        out += _enc_varint(5, m.rank)
    return out


def encode_path(p: Path) -> bytes:
    out = b""
    if p.name:
        out += _enc_len(1, p.name.encode())
    for m in p.mappings:
        out += _enc_len(2, encode_mapping(m))
    return out


def encode_alignment(a: Alignment) -> bytes:
    out = b""
    if a.sequence:
        out += _enc_len(1, a.sequence.encode())
    pb = encode_path(a.path)
    if pb:
        out += _enc_len(2, pb)
    if a.name:
        out += _enc_len(3, a.name.encode())
    if a.quality:
        out += _enc_len(4, a.quality)
    if a.mapping_quality:
        out += _enc_varint(5, a.mapping_quality)
    if a.score:
        out += _enc_varint(6, a.score)
    if a.is_secondary:
        out += _enc_varint(15, 1)
    if a.identity:
        out += _enc_double(16, a.identity)
    if a.read_paired:
        out += _enc_varint(24, 1)
    return out


def write_gam(path: str, alignments: List[Alignment], group_size: int = 1000) -> None:
    chunks = []
    for off in range(0, len(alignments), group_size):
        grp = alignments[off : off + group_size]
        body = b"".join(_wv(len(m)) + m for m in (encode_alignment(a) for a in grp))
        chunks.append(_wv(len(grp) + 1) + _wv(len(TAG)) + TAG + body)
    bgzf.write_file(path, b"".join(chunks))
