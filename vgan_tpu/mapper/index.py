"""Minimizer index over the haplotype paths of a packed graph.

Replaces vg's GBWT-constrained minimizer index (`.min` + `.gbwt`,
`src/map_giraffe.cpp:41-55`): minimizers are extracted from every
haplotype path's linearized sequence and posted as *graph positions*
(node, oriented offset) so occurrences shared by many near-identical
haplotypes dedup to one posting, with a representative (path, offset)
retained for the banded-extension stage. Lookups are a binary search
into the sorted hash array (TPU-friendly: `searchsorted` instead of
pointer-chasing hash probes).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..graph.packed import PackedGraph
from . import minimizer as mz


@dataclass
class MinimizerIndex:
    k: int
    w: int
    hashes: np.ndarray  # [U] sorted unique hashes
    post_off: np.ndarray  # [U+1] CSR offsets
    post_path: np.ndarray  # [Np] representative path idx
    post_ppos: np.ndarray  # [Np] offset of k-mer start on that path
    post_rc: np.ndarray  # [Np] canonical k-mer is reverse of path orientation
    # per-path linearization support
    path_len: np.ndarray  # [P]
    step_off: List[np.ndarray]  # per path: cumulative node start offsets
    ry: bool = False  # index is over RYmer-projected sequence

    @classmethod
    def build(
        cls,
        graph: PackedGraph,
        k: int = 20,
        w: int = 10,
        ry: bool = False,
        max_occ: int | None = None,
    ) -> "MinimizerIndex":
        """Build the index. ry=True hashes RYmer-projected sequence
        (damage-aware SAFARI seeding); max_occ drops hashes with more
        postings (frequent-kmer filter — RY space is 1 bit/base, so
        low-complexity stretches need it)."""
        postings: Dict[int, Dict[Tuple[int, int, bool], Tuple[int, int, bool]]] = {}
        path_len = np.zeros(graph.n_paths, dtype=np.int64)
        step_off: List[np.ndarray] = []
        for p in range(graph.n_paths):
            codes = _path_codes(graph, p)
            path_len[p] = len(codes)
            offs = _step_offsets(graph, p)
            step_off.append(offs)
            pos, hashes, is_rc = mz.minimizers(
                mz.to_ry(codes) if ry else codes, k, w
            )
            for ppos, h, rc in zip(pos, hashes, is_rc):
                # graph position of the k-mer start
                step = int(np.searchsorted(offs, ppos, side="right") - 1)
                nidx = int(graph.path_steps_node[p][step])
                noff = int(ppos - offs[step])
                key = (nidx, noff, bool(graph.path_steps_rev[p][step]))
                postings.setdefault(int(h), {}).setdefault(
                    key, (p, int(ppos), bool(rc))
                )
        if max_occ is not None:
            postings = {
                h: d for h, d in postings.items() if len(d) <= max_occ
            }
        uniq = np.array(sorted(postings), dtype=np.uint64)
        counts = np.array([len(postings[int(h)]) for h in uniq], dtype=np.int64)
        post_off = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(counts, out=post_off[1:])
        Np = int(post_off[-1])
        post_path = np.zeros(Np, dtype=np.int32)
        post_ppos = np.zeros(Np, dtype=np.int64)
        post_rc = np.zeros(Np, dtype=bool)
        i = 0
        for h in uniq:
            for p, ppos, rc in postings[int(h)].values():
                post_path[i] = p
                post_ppos[i] = ppos
                post_rc[i] = rc
                i += 1
        return cls(
            k=k, w=w, hashes=uniq, post_off=post_off, post_path=post_path,
            post_ppos=post_ppos, post_rc=post_rc, path_len=path_len,
            step_off=step_off, ry=ry,
        )

    def lookup(self, hashes: np.ndarray) -> List[Tuple[int, int]]:
        """For each query hash return the (start, end) posting range
        (empty if absent)."""
        idx = np.searchsorted(self.hashes, hashes)
        out = []
        for q, i in zip(hashes, idx):
            if i < len(self.hashes) and self.hashes[i] == q:
                out.append((int(self.post_off[i]), int(self.post_off[i + 1])))
            else:
                out.append((0, 0))
        return out


def _path_codes(graph: PackedGraph, p: int) -> np.ndarray:
    from ..utils import dna

    parts = []
    for nidx, rev in zip(graph.path_steps_node[p], graph.path_steps_rev[p]):
        codes = graph.node_seq_pool[graph.node_off[nidx] : graph.node_off[nidx + 1]]
        parts.append(dna.revcomp_codes(codes) if rev else codes)
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint8)


def _step_offsets(graph: PackedGraph, p: int) -> np.ndarray:
    lens = [
        int(graph.node_off[n + 1] - graph.node_off[n])
        for n in graph.path_steps_node[p]
    ]
    offs = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    return offs
