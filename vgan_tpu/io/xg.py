"""sdsl-lite `.xg` (vg xg succinct index) reader.

The reference loads `.xg` graphs through vg's libxg when mapping
(`src/map_giraffe.cpp:41-55` family passes DB graph prefixes whose
`.xg` flavor giraffe consumes); this module decodes the container
natively so every graph format in the reference DB layouts loads
without vg.  Layout reverse-engineered against the fixture's decoded
`.gg` twin — see `XG_FORMAT_NOTES.md` in this directory for the
verified byte-level map (header, r_iv/g_iv/g_bv node records, s_iv
base codes, pn_iv names, XGPath enc_vector handle streams).

Scope: the vg-era serialization version 16 (the one the reference's
DBs ship).  Nodes, sequences, edges, path names and path step
sequences are decoded exactly; derived sdsl support structures
(rank/select, the path-name CSA, rrr offset vectors, node->path
membership) are skipped — they are recomputed views of the primary
data and `PackedGraph` rebuilds its own equivalents.

sdsl framing primitives used here:
- int_vector<0>:  u64 bit-size, u8 width, ceil(bits/64) LE u64 words
- int_vector<64>: u64 bit-size, words (fixed width -> no width byte)
- bit_vector:     u64 bit-size, words (no width byte)
- rank_support_v5: one int_vector<64>
- select_support_mcl: u64 arg_cnt; if nonzero: superblock iv0,
  mini_or_long bit_vector (empty when no long superblocks), then one
  iv0 per superblock (long or mini per the flag)
- enc_vector<elias_delta,128>: u64 size, m_z iv0 (the coded stream),
  samples-and-pointers iv0 (value/pointer pairs per 128-block)
- rrr_vector<63>: u64 size, m_bt iv0, m_btnr bit_vector, m_btnrp iv0,
  m_rank iv0, then two u64 tail words (constant across all observed
  paths; validated during the path scan)
"""
from __future__ import annotations

import struct
import warnings
from typing import Dict, List, Tuple

import numpy as np

XG_MAGIC = bytes.fromhex("f6f596a1")
_BASES = "ATCGN"  # s_iv code -> base (verified byte-exact vs .gg twin)


class XGFormatError(ValueError):
    pass


def _u64(buf: bytes, o: int) -> int:
    return struct.unpack_from("<Q", buf, o)[0]


def _iv0(buf: bytes, o: int) -> Tuple[int, int, int, int]:
    """int_vector<0> -> (next_off, bits, width, payload_off)."""
    bits = _u64(buf, o)
    width = buf[o + 8]
    nw = (bits + 63) // 64
    return o + 9 + 8 * nw, bits, width, o + 9


def _iv64_skip(buf: bytes, o: int) -> int:
    bits = _u64(buf, o)
    return o + 8 + 8 * ((bits + 63) // 64)


def _bv(buf: bytes, o: int) -> Tuple[int, int, int]:
    """bit_vector -> (next_off, bits, payload_off)."""
    bits = _u64(buf, o)
    nw = (bits + 63) // 64
    return o + 8 + 8 * nw, bits, o + 8


def _sel_mcl_skip(buf: bytes, o: int) -> int:
    """select_support_mcl serialization (see module docstring)."""
    cnt = _u64(buf, o)
    o += 8
    if cnt == 0:
        return o
    sb = (cnt + 4095) >> 12
    o, _, _, _ = _iv0(buf, o)  # m_superblock
    o, bits, pay = _bv(buf, o)  # mini_or_long flags (may be empty)
    if bits:
        nw = (bits + 63) // 64
        words = struct.unpack_from(f"<{nw}Q", buf, pay)
        flags = [(words[i // 64] >> (i % 64)) & 1 for i in range(sb)]
    else:
        flags = [0] * sb
    del flags  # long vs mini only renames the member; framing is equal
    for _ in range(sb):
        o, _, _, _ = _iv0(buf, o)
    return o


def _unpack_iv(buf: bytes, payload_off: int, bits: int, width: int) -> np.ndarray:
    """Unpack an int_vector payload into an int64 array."""
    if width == 0 or bits == 0:
        return np.zeros(0, dtype=np.int64)
    nw = (bits + 63) // 64
    words = np.frombuffer(buf, dtype="<u8", count=nw, offset=payload_off)
    n = bits // width
    if width == 8:
        return np.frombuffer(
            words.tobytes()[:n], dtype=np.uint8
        ).astype(np.int64)
    from .gbz import _unpack_ints

    return _unpack_ints(n, width, words)


_U64_MASK = (1 << 64) - 1

_POW2 = (1 << np.arange(64, dtype=np.uint64)).astype(np.uint64)


def _decode_elias_delta_stream(words, count: int) -> List[int]:
    """Decode `count` elias-delta codes from LSB-first u64 words.

    The bit stream is expanded once with np.unpackbits and one-bit
    positions are precomputed with flatnonzero, so the per-code work is
    a cursor bump plus two small dot products — no per-bit Python loop
    (the load-time bottleneck flagged for pangenome-scale path sets).
    """
    if count == 0:
        return []
    bits = np.unpackbits(
        np.asarray(words, dtype="<u8").view(np.uint8), bitorder="little"
    )
    ones = np.flatnonzero(bits)
    out: List[int] = []
    p = 0
    oi = 0
    for _ in range(count):
        nxt = int(ones[oi])
        oi += 1
        zl = nxt - p
        p = nxt + 1
        if zl == 0:
            out.append(1)
            continue
        ln = (1 << zl) | int(bits[p : p + zl].astype(np.uint64) @ _POW2[:zl])
        p += zl
        m = ln - 1
        val = (1 << m) | int(bits[p : p + m].astype(np.uint64) @ _POW2[:m])
        p += m
        # payload bits may contain set bits the ones[] cursor must skip
        while oi < len(ones) and ones[oi] < p:
            oi += 1
        out.append(val & _U64_MASK)
    return out


def _parse_enc_vector(buf: bytes, o: int) -> Tuple[int, List[int]]:
    """enc_vector<elias_delta, 128> -> (next_off, decoded values).

    Every 128th value is stored raw in the samples vector (paired with
    a bit-pointer we don't need for a full sequential decode); the
    rest are elias-delta coded deltas, accumulated mod 2^64 so that
    negative handle deltas (paths stepping to an earlier g-record)
    round-trip exactly.
    """
    size = _u64(buf, o)
    o += 8
    o, zbits, _, zpay = _iv0(buf, o)
    o, sbits, sw, spay = _iv0(buf, o)
    samples = _unpack_iv(buf, spay, sbits, sw)
    nw = (zbits + 63) // 64
    words = (
        np.frombuffer(buf, dtype="<u8", count=nw, offset=zpay)
        if nw
        else np.zeros(1, dtype="<u8")
    )
    n_samples = (size + 127) // 128
    deltas = _decode_elias_delta_stream(words, size - n_samples)
    vals: List[int] = []
    di = 0
    for i in range(size):
        if i % 128 == 0:
            vals.append(int(samples[2 * (i // 128)]) & _U64_MASK)
        else:
            vals.append((vals[-1] + deltas[di]) & _U64_MASK)
            di += 1
    return o, vals


def _skip_rrr(buf: bytes, o: int) -> int:
    o += 8  # m_size
    o, _, _, _ = _iv0(buf, o)  # m_bt (block classes)
    o, _, _ = _bv(buf, o)  # m_btnr (offset bits)
    o, _, _, _ = _iv0(buf, o)  # m_btnrp (pointer samples)
    o, _, _, _ = _iv0(buf, o)  # m_rank (rank samples)
    return o + 16  # constant 2-u64 tail (observed on every path)


def _parse_xgpath(buf: bytes, o: int) -> Tuple[int, int, List[int], bool]:
    """One XGPath: (next_off, min_handle, handle values, is_circular)."""
    min_handle = _u64(buf, o)
    o += 8
    o, vals = _parse_enc_vector(buf, o)
    o = _skip_rrr(buf, o)  # offsets rrr_vector (+0-byte rank/select)
    circ = buf[o]
    o += 1
    if circ not in (0, 1):
        raise XGFormatError(f"bad is_circular byte {circ:#x}")
    return o, min_handle, vals, bool(circ)


def parse_xg(path: str):
    """Decode an .xg file -> dict of primary structures."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != XG_MAGIC:
        raise XGFormatError(f"{path}: not an xg file (magic {buf[:4].hex()})")
    version = struct.unpack_from(">I", buf, 4)[0]
    if version not in (13, 14, 15, 16):
        raise XGFormatError(f"{path}: unsupported xg version {version}")
    if version != 16:
        # only v16 (the version the reference DBs ship) has been
        # differentially validated against a decoded .gg twin
        warnings.warn(
            f"{path}: xg version {version} layout is unvalidated "
            "(only v16 verified; see XG_FORMAT_NOTES.md)",
            stacklevel=2,
        )
    o = 8
    (seq_length, node_count, edge_count, path_count, min_id, max_id) = (
        struct.unpack_from("<6Q", buf, o)
    )
    o += 48
    # r_iv: id-offset -> 1-based node rank (derivable; skipped)
    o, _, _, _ = _iv0(buf, o)
    # g_iv: per-node records [id, seq_start, seq_len, to_deg, from_deg,
    # edge ints...]
    o, gbits, gw, gpay = _iv0(buf, o)
    g = _unpack_iv(buf, gpay, gbits, gw)
    # g_bv + rank + select
    o, _, _ = _bv(buf, o)
    o = _iv64_skip(buf, o)
    o = _sel_mcl_skip(buf, o)
    # s_iv: base codes, width 3
    o, sbits, sw, spay = _iv0(buf, o)
    s_codes = _unpack_iv(buf, spay, sbits, sw)
    if len(s_codes) != seq_length:
        raise XGFormatError("s_iv length != header seq_length")
    # s_bv + rank + select
    o, _, _ = _bv(buf, o)
    o = _iv64_skip(buf, o)
    o = _sel_mcl_skip(buf, o)
    # pn_iv: '$'-separated path names in path-object order
    o, pbits, pw, ppay = _iv0(buf, o)
    name_blob = "".join(chr(int(c)) for c in _unpack_iv(buf, ppay, pbits, pw))
    path_names = [s for s in name_blob.split("$") if s]
    if len(path_names) != path_count:
        raise XGFormatError(
            f"pn_iv holds {len(path_names)} names, header says {path_count}"
        )

    # Walk g_iv into records.
    rec_off: Dict[int, int] = {}  # g-offset -> record index
    nodes: List[Tuple[int, int, int]] = []  # (id, seq_start, seq_len)
    to_edges: List[List[int]] = []  # raw edge ints, first group
    from_edges: List[List[int]] = []  # raw edge ints, second group
    p = 0
    while p < len(g):
        rec_off[p] = len(nodes)
        nid, sstart, slen, tdeg, fdeg = (
            int(g[p]), int(g[p + 1]), int(g[p + 2]), int(g[p + 3]),
            int(g[p + 4]),
        )
        e0 = p + 5
        to_edges.append([int(x) for x in g[e0 : e0 + tdeg]])
        from_edges.append([int(x) for x in g[e0 + tdeg : e0 + tdeg + fdeg]])
        nodes.append((nid, sstart, slen))
        p = e0 + tdeg + fdeg
    if len(nodes) != node_count:
        raise XGFormatError(
            f"g_iv walk found {len(nodes)} records, header says {node_count}"
        )

    # The pn_csa / pn_bv(+supports) / pi_iv block between pn_iv and the
    # path objects contains data-dependent CSA internals; rather than
    # model the whole csa_wt serialization we scan for the path-count
    # u64 and validate by fully parsing every XGPath (handle values
    # must land on g-record starts).  See XG_FORMAT_NOTES.md.
    # Candidate offsets are found with eight strided u64 views (one per
    # byte phase) instead of a per-byte Python scan; 8-byte-aligned
    # candidates are tried first.
    cands: List[int] = []
    for phase in range(8):
        n64 = (len(buf) - phase) // 8
        if n64 <= 0:
            continue
        view = np.frombuffer(buf, dtype="<u8", count=n64, offset=phase)
        offs = phase + 8 * np.flatnonzero(view == path_count)
        cands.extend(
            int(c) for c in offs if o <= c <= len(buf) - 8
        )
    cands.sort(key=lambda c: (c % 8 != 0, c))
    paths_raw = None
    for cand in cands:
        try:
            q = cand + 8
            got = []
            for _ in range(path_count):
                q, mh, vals, circ = _parse_xgpath(buf, q)
                handles = [(mh + v) & _U64_MASK for v in vals]
                if not vals:
                    raise XGFormatError("empty path")
                if any((h >> 1) not in rec_off for h in handles):
                    raise XGFormatError("handle not at a record start")
                got.append((handles, circ))
            if q > len(buf):
                raise XGFormatError("ran past EOF")
        except (XGFormatError, struct.error, IndexError, OverflowError):
            continue
        paths_raw = got
        break
    if paths_raw is None:
        raise XGFormatError(f"{path}: could not locate XGPath block")

    seq_txt = "".join(_BASES[int(c)] for c in s_codes)
    return {
        "version": version,
        "min_id": min_id,
        "max_id": max_id,
        "edge_count": edge_count,
        "nodes": nodes,
        "seq": seq_txt,
        "to_edges": to_edges,
        "from_edges": from_edges,
        "rec_off": rec_off,
        "paths": paths_raw,
        "path_names": path_names,
    }


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def load_packed_graph_xg(path: str):
    """.xg -> PackedGraph (differential-tested vs the .gg twin)."""
    from .gbz import GBZ

    x = parse_xg(path)
    nodes = x["nodes"]
    node_seqs: Dict[int, str] = {}
    for nid, sstart, slen in nodes:
        node_seqs[nid] = x["seq"][sstart : sstart + slen]
    # Edge ints: zigzag(g-entry delta from this record's start) << 1 |
    # orientation flag (0 = forward->forward; all reference DB graphs
    # are forward-only).  A set flag means a reverse-strand edge whose
    # full from_rev/to_rev combination the single bit cannot represent
    # — decoding it would emit the same edge twice with conflicting
    # orientations from the two endpoint views.  Forward-only is the
    # validated scope (see XG_FORMAT_NOTES.md); such edges are SKIPPED
    # with one aggregated warning rather than failing the whole load,
    # so graphs containing inversions still open (minus those edges) —
    # convert via GFA/.vg for full orientation fidelity.
    rec_start = sorted(x["rec_off"])  # g-offsets in record order
    edges: List[Tuple[int, bool, int, bool]] = []
    seen = set()
    rev_skipped: List[int] = []
    for ridx, (nid, _, _) in enumerate(nodes):
        base = rec_start[ridx]
        for group, incoming in ((x["to_edges"][ridx], True),
                                (x["from_edges"][ridx], False)):
            for eint in group:
                delta = _unzigzag(eint >> 1)
                if eint & 1:
                    rev_skipped.append(ridx)
                    continue
                tgt_off = base + delta
                tidx = x["rec_off"].get(tgt_off)
                if tidx is None:
                    raise XGFormatError(
                        f"edge delta {delta} from record {ridx} misses"
                    )
                other = nodes[tidx][0]
                e = (other, False, nid, False) if incoming else (
                    nid, False, other, False
                )
                key = (e[0], e[2])
                if key in seen:
                    continue
                seen.add(key)
                edges.append(e)
    if rev_skipped:
        import warnings

        sample = ", ".join(str(r) for r in rev_skipped[:5])
        warnings.warn(
            f"{path}: skipped {len(rev_skipped)} reverse-strand edge "
            f"record(s) (e.g. records {sample}); the .xg single-bit "
            "orientation encoding is ambiguous here — convert the "
            "graph via GFA or .vg for full inversion support. Reads "
            "spanning the affected adjacencies will not map.",
            stacklevel=2,
        )
    paths = []
    for name, (handles, _circ) in zip(x["path_names"], x["paths"]):
        steps = [
            (nodes[x["rec_off"][h >> 1]][0], bool(h & 1)) for h in handles
        ]
        paths.append((name, steps))
    return GBZ(node_seqs, edges, paths).to_packed_graph(
        meta={"source": "xg", "xg_version": x["version"],
              "skipped_reverse_edges": len(rev_skipped)}
    )
