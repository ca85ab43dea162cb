"""(w,k)-minimizer extraction.

Equivalent of the vg minimizer index's sampling scheme (the reference
builds it via `vg minimizer -k 31 -w 11` for HaploCart and
`-k 20 -w 10` for the toy/euka DBs, `src/map_giraffe.cpp:41-55`,
`test/reconstructInputSeq/cmds:17`): in every window of w consecutive
k-mers, the one with the smallest hash of its canonical encoding is
sampled. Hash = splitmix64 finalizer over the 2-bit packed k-mer,
canonical = min(fwd, revcomp).

Host path is vectorized numpy (used for index build); the same math
runs under jit for device-side read sketching (jnp arrays work through
the same functions).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * _M1).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * _M2).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def to_ry(codes: np.ndarray) -> np.ndarray:
    """Project base codes into RYmer (purine/pyrimidine) space:
    A,G -> A and C,T -> T, leaving non-ACGT codes untouched.

    The aDNA deamination substitutions (C->T, G->A,
    `src/damage.cpp:41-323`) are transitions within each class, so
    k-mers of damaged fragments are invariant under this projection —
    the basis of SAFARI-style damage-aware seeding (the reference
    parses -S/--SAFARI but never shipped the mapper,
    `src/Euka.cpp:300-303`). Mapping onto the A/T codes keeps the
    existing 2-bit packing and complement (A<->T) machinery valid in
    RY space (R and Y are each other's complement)."""
    c = np.asarray(codes, dtype=np.uint8)
    out = c.copy()
    out[(c == 2)] = 0  # G -> R(A)
    out[(c == 1)] = 3  # C -> Y(T)
    return out


def kmer_codes(codes: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """2-bit pack all k-mers of a code sequence.

    Returns (fwd_kmers[u64], valid[bool]) of length len-k+1; windows
    containing non-ACGT bases are invalid."""
    n = len(codes)
    if n < k:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=bool)
    c = (codes & np.uint8(3)).astype(np.uint64)
    bad = codes >= 4
    # doubling pack: P_m[i] = 2-bit pack of m codes starting at i;
    # P_{2m}[i] = P_m[i] << 2m | P_m[i+m]. O(log k) full-array ops
    # instead of a [n, k] window matrix.
    packs = {1: c}
    m = 1
    while 2 * m <= k:
        p = packs[m]
        packs[2 * m] = (p[: len(p) - m] << np.uint64(2 * m)) | p[m:]
        m *= 2
    fwd = None
    width = 0  # codes already packed
    rem = k
    for m in sorted(packs, reverse=True):
        while rem >= m:
            part = packs[m]
            if fwd is None:
                fwd = part[: n - k + 1].copy()
            else:
                fwd = (fwd << np.uint64(2 * m)) | part[width : width + n - k + 1]
            width += m
            rem -= m
    # validity: no non-ACGT base inside the window
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(bad, out=cum[1:])
    valid = (cum[k:] - cum[: n - k + 1]) == 0
    return fwd, valid


def revcomp_code(kmer: np.ndarray, k: int) -> np.ndarray:
    """Reverse complement of 2-bit packed k-mers.

    Complement of a 2-bit code is 3-b = b^3, so complementing the
    whole word is one XOR; reversing the 2-bit groups is a standard
    O(log) swap cascade (pairs within nibbles, nibbles within bytes,
    byteswap), then a right shift drops the 64-2k unused bits."""
    x = np.asarray(kmer, dtype=np.uint64) ^ np.uint64(0xFFFFFFFFFFFFFFFF)
    m2 = np.uint64(0x3333333333333333)
    x = ((x & m2) << np.uint64(2)) | ((x >> np.uint64(2)) & m2)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x = ((x & m4) << np.uint64(4)) | ((x >> np.uint64(4)) & m4)
    x = x.byteswap()
    return x >> np.uint64(64 - 2 * k)


def all_kmers(codes: np.ndarray, k: int):
    """All valid k-mers with canonical hashes (used on the READ side:
    the graph side is minimizer-sampled, so querying every read k-mer
    preserves sensitivity for short shared stretches, cf. giraffe's
    window guarantee only holding for stretches >= w+k-1)."""
    fwd, valid = kmer_codes(codes, k)
    if len(fwd) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64), np.zeros(0, bool)
    rc = revcomp_code(fwd, k)
    canon = np.minimum(fwd, rc)
    is_rc = rc < fwd
    h = splitmix64(canon)
    sel = np.nonzero(valid)[0]
    return sel.astype(np.int64), h[sel], is_rc[sel]


def all_kmers_batch(read_codes_list, k: int):
    """Batched all_kmers over a whole read list in one numpy pass:
    reads are concatenated with (k-1)-long invalid separators so no
    window spans a read boundary. Returns (read_idx, local_pos,
    hashes, is_rc) across all reads — replaces len(reads) separate
    all_kmers calls (the per-read call overhead dominated host seeding
    time)."""
    n_reads = len(read_codes_list)
    if n_reads == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.uint64), np.zeros(0, bool))
    sep = np.full(k - 1, 4, dtype=np.uint8)
    parts = []
    offs = np.zeros(n_reads, dtype=np.int64)
    pos0 = 0
    for ri, c in enumerate(read_codes_list):
        offs[ri] = pos0
        parts.append(np.asarray(c, dtype=np.uint8))
        parts.append(sep)
        pos0 += len(c) + k - 1
    cat = np.concatenate(parts)
    n = len(cat)
    if n < k:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.uint64), np.zeros(0, bool))
    # chunked rolling pack to bound the [rows, k] window matrix
    sel_all, h_all, rc_all = [], [], []
    CHUNK = 1 << 18
    total_rows = n - k + 1
    for r0 in range(0, total_rows, CHUNK):
        r1 = min(total_rows, r0 + CHUNK)
        fwd, valid = kmer_codes(cat[r0 : r1 + k - 1], k)
        sel = np.nonzero(valid)[0]
        if not len(sel):
            continue
        fwd = fwd[sel]
        rc = revcomp_code(fwd, k)
        canon = np.minimum(fwd, rc)
        sel_all.append(sel + r0)
        h_all.append(splitmix64(canon))
        rc_all.append(rc < fwd)
    if not sel_all:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.uint64), np.zeros(0, bool))
    sel = np.concatenate(sel_all)
    ridx = np.searchsorted(offs, sel, side="right") - 1
    local = sel - offs[ridx]
    return (ridx.astype(np.int64), local.astype(np.int64),
            np.concatenate(h_all), np.concatenate(rc_all))


def minimizers(
    codes: np.ndarray, k: int, w: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract (w,k)-minimizers.

    Returns (positions, hashes, is_rc): start position of each sampled
    k-mer, its canonical hash, and whether the canonical orientation is
    the reverse complement."""
    fwd, valid = kmer_codes(codes, k)
    if len(fwd) == 0:
        return (np.zeros(0, np.int64),) * 2 + (np.zeros(0, bool),)
    rc = revcomp_code(fwd, k)
    canon = np.minimum(fwd, rc)
    is_rc = rc < fwd
    h = splitmix64(canon)
    h = np.where(valid, h, np.uint64(0xFFFFFFFFFFFFFFFF))
    n = len(h)
    if n < w:
        w = n
    # windowed argmin via sliding windows
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(h, w)  # [n-w+1, w]
    arg = win.argmin(axis=1) + np.arange(len(win))
    sel = np.unique(arg)
    sel = sel[valid[sel]]
    return sel.astype(np.int64), h[sel], is_rc[sel]
