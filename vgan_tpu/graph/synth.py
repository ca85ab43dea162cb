"""Synthetic haplotype-graph builder.

Generates HaploCart-shaped pangenome graphs (segmented backbone nodes
of <=8bp like the real mtDNA graph, `src/test.cpp:627`, with single-node
variant bubbles and one path per haplotype) from any reference
sequence. Used for mtDNA-scale end-to-end tests and benchmarks since
the reference's real hcfiles DB is distributed out-of-band (FTP,
`src/Makefile:89-91`) and is not part of the repo snapshot.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils import dna
from .packed import PackedGraph


def build_haplotype_graph(
    ref_seq: str,
    n_haplotypes: int = 16,
    n_variants: int = 60,
    node_len: int = 8,
    seed: int = 0,
    hap_names: Optional[List[str]] = None,
):
    """Returns (PackedGraph, truth) where truth maps haplotype name ->
    set of variant ids it carries. Haplotype 0 carries no variants
    (the reference haplotype)."""
    rng = np.random.default_rng(seed)
    ref = ref_seq.upper().replace("N", "A")
    L = len(ref)
    n_backbone = (L + node_len - 1) // node_len

    # segments: backbone nodes 1..n_backbone
    segments: Dict[int, str] = {}
    for i in range(n_backbone):
        segments[i + 1] = ref[i * node_len : (i + 1) * node_len]

    # variant sites: distinct backbone nodes (not first/last)
    sites = rng.choice(
        np.arange(1, n_backbone - 1), size=min(n_variants, n_backbone - 2),
        replace=False,
    )
    sites.sort()
    alt_of: Dict[int, int] = {}  # backbone node id -> alt node id
    next_id = n_backbone + 1
    links: List[Tuple[int, bool, int, bool]] = []
    for s in sites:
        nid = int(s) + 1
        seq = segments[nid]
        off = int(rng.integers(0, len(seq)))
        base = seq[off]
        alt_base = "ACGT"[(("ACGT".find(base)) + 1 + int(rng.integers(0, 3))) % 4]
        alt_seq = seq[:off] + alt_base + seq[off + 1 :]
        segments[next_id] = alt_seq
        alt_of[nid] = next_id
        next_id += 1

    # edges: backbone chain + bubbles
    for i in range(1, n_backbone):
        links.append((i, False, i + 1, False))
    for nid, alt in alt_of.items():
        links.append((nid - 1, False, alt, False))
        links.append((alt, False, nid + 1, False))

    # haplotypes: hap 0 = reference; others carry nested variant subsets
    names = hap_names or [f"hap{h}" for h in range(n_haplotypes)]
    paths = []
    truth: Dict[str, set] = {}
    site_ids = list(alt_of.keys())
    for h in range(n_haplotypes):
        if h == 0:
            carried = set()
        else:
            k = int(rng.integers(1, max(2, len(site_ids) // 2)))
            carried = set(
                rng.choice(site_ids, size=min(k, len(site_ids)), replace=False)
                .tolist()
            )
        steps = []
        for i in range(1, n_backbone + 1):
            steps.append((alt_of[i] if i in carried else i, False))
        paths.append((names[h], steps))
        truth[names[h]] = carried

    graph = _graph_from_parts(segments, paths, links)
    return graph, truth


def _graph_from_parts(segments, paths, links) -> PackedGraph:
    ids = sorted(segments)
    min_id = ids[0]
    max_id = ids[-1]
    n_nodes = max_id - min_id + 1
    lens = np.zeros(n_nodes, dtype=np.int64)
    for nid in ids:
        lens[nid - min_id] = len(segments[nid])
    node_off = np.zeros(n_nodes + 1, dtype=np.int64)
    np.cumsum(lens, out=node_off[1:])
    pool = np.zeros(int(node_off[-1]), dtype=np.uint8)
    for nid in ids:
        i = nid - min_id
        pool[node_off[i] : node_off[i + 1]] = dna.encode(segments[nid])
    path_names = [p[0] for p in paths]
    steps_node = [
        np.array([nid - min_id for nid, _ in p[1]], dtype=np.int32) for p in paths
    ]
    steps_rev = [np.array([rev for _, rev in p[1]], dtype=bool) for p in paths]
    support = np.zeros((n_nodes, len(paths)), dtype=bool)
    for j, sn in enumerate(steps_node):
        support[sn, j] = True
    return PackedGraph(
        min_id=min_id,
        node_seq_pool=pool,
        node_off=node_off,
        edge_from=np.array([l[0] - min_id for l in links], dtype=np.int32),
        edge_from_rev=np.array([l[1] for l in links], dtype=bool),
        edge_to=np.array([l[2] - min_id for l in links], dtype=np.int32),
        edge_to_rev=np.array([l[3] for l in links], dtype=bool),
        path_names=path_names,
        path_steps_node=steps_node,
        path_steps_rev=steps_rev,
        path_support=support,
    )


def sample_reads(
    graph: PackedGraph,
    path_idx: int,
    n_reads: int,
    read_len: int = 100,
    error_rate: float = 0.002,
    seed: int = 0,
):
    """Sample error-bearing reads (both strands) from a haplotype."""
    from ..io.fastx import Read

    rng = np.random.default_rng(seed)
    seq = graph.path_seq(path_idx)
    L = len(seq)
    out = []
    for i in range(n_reads):
        start = int(rng.integers(0, L - read_len))
        codes = dna.encode(seq[start : start + read_len])
        errs = rng.random(read_len) < error_rate
        codes = codes.copy()
        codes[errs] = rng.integers(0, 4, size=int(errs.sum()))
        if rng.random() < 0.5:
            codes = dna.revcomp_codes(codes)
        out.append(
            Read(
                name=f"r{i}",
                seq=dna.decode(codes),
                qual=bytes([30 + int(rng.integers(0, 10)) for _ in range(read_len)]),
            )
        )
    return out
