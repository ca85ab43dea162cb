"""soibean: species identification / k-source mixture via tree MCMC.

TPU-native reformulation of `src/soibean.cpp` + `src/getLCAfromGAM.h`
+ `src/MCMC.cpp:522-1088`.

Design: analyse_GAM's per-read x per-path x per-base triple loop
(`src/getLCAfromGAM.h:123-539`) collapses into per-(read, path)
sufficient statistics, because every per-base quantity is either
path-independent or enters only through node-path support:

  pathMap[r,p]   - the precomputed per-path log likelihood
  counts25[r,p,c]- counts of supported (graph-class, read-class) base
                   pairs, classes = {A,C,G,T,other} x {A,C,G,T,other}

Each MCMC iteration then evaluates, per source, the HKY85 recompute of
`MCMC::computeBaseLogLike` (`src/MCMC.h:111-296`) as a closed-form
25-vector dotted with counts25 — an O(R*25) contraction instead of the
reference's O(R * bases) scalar loop, executed inside a jax scan with
chains vmapped (see infer/tree_mcmc.py).

Reference quirks preserved:
* supported ACGT-vs-ACGT bases score the constant log(0.9999999):
  the damage marginal `src/getLCAfromGAM.h:340-353` adds
  log(post[bpd]) for matching AND mismatching read bases alike, so it
  telescopes to log(sum post) = log(1), clamped to log(0.9999999).
  Supported bases whose *graph* char is a rare IUPAC code instead
  yield log(4*q/3) (no pre-damage row matches).
* quality is indexed by the position WITHIN the node slice
  (`src/getLCAfromGAM.h:227`), i.e. every mapping re-reads the first
  |mapping| quality values of the read.
* `mppg_sizes` has one entry per edit; trailing entries beyond the
  mapping count are scored unsupported for every path
  (`src/getLCAfromGAM.h:156-166`).
* unsupported ACGT bases get the PENALTY-periodic score: every base
  whose |baseOnRead| % PENALTY == 0 scores log(1-q), others log(q/3)
  (`src/getLCAfromGAM.h:471-512`); baseOnRead starts at the mapping's
  aligned start coordinate and walks the read (down for reverse).
* reverse-strand slices use startIndex = max(baseIX - size - 1, 0)
  (`src/getLCAfromGAM.h:180`), reproducing its off-by-one.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..graph.packed import PackedGraph
from ..graph.reconstruct import reconstruct_graph_sequence
from ..io.gam import Alignment
from ..models import phred
from ..utils import guards
from ..utils import dna

LOG_SUPPORTED_CONST = float(np.log(0.9999999))
LOG_N = float(np.log(0.25))
LOG_GAP = float(np.log(0.02))


@dataclass
class ReadStats:
    """Per-read sufficient statistics over all paths."""

    names: List[str]  # read names
    path_map: np.ndarray  # [R, P] precomputed path log-likelihoods
    counts25: np.ndarray  # [R, P, 25] supported pair-class counts
    most_prob_unique: np.ndarray  # [R] bool: single argmax path
    most_prob_idx: np.ndarray  # [R] argmax path index


def _class_of(code: int) -> int:
    return code if code < 4 else 4


def analyse_reads(
    graph: PackedGraph,
    alignments: Sequence[Alignment],
    penalty: int = 7,
    detail_path: str = "",
    path_thres: int = 0,
) -> ReadStats:
    """Host-side equivalent of analyse_GAM building the stats arrays.

    detail_path/path_thres: the --alignment-detail / --pathThres
    feature (`src/getLCAfromGAM.h:73-77,199-214`): writes
    <out>_MatchInfo.tsv with one row per (supported path, matching
    base) for nodes whose path count is <= path_thres (0 = all paths,
    the reference default "all paths")."""
    qscore = phred.qscore_vec()
    P = graph.n_paths
    support = graph.path_support  # [n_nodes, P] bool
    reads = [a for a in alignments if a.identity != 0 and a.path.mappings]
    R = len(reads)
    path_map = np.zeros((R, P), dtype=np.float64)
    counts25 = np.zeros((R, P, 25), dtype=np.float32)
    names: List[str] = []
    detail = None
    if detail_path:
        detail = open(detail_path + "_MatchInfo.tsv", "w")
        detail.write(
            "Path name\tRead name\tNode sequence\tIndex on node\t"
            "Node Base\tRead Sequence\tIndex on read\n"
        )

    # batch reconstruction via the native lib when available (the
    # per-read python reconstruct is the precompute's hot spot)
    recon = None
    try:
        from ..mapper.batch_map import load_native, table_from_alignments

        if load_native() is not None and R:
            from .hc_columnar import reconstruct_table

            recon = reconstruct_table(graph, table_from_alignments(reads))
    except OSError:  # pragma: no cover
        recon = None

    for ridx, a in enumerate(reads):
        names.append(a.name)
        if recon is not None:
            g_cat, g_off, g_len, r_cat, r_off, r_len, szs, s_off, s_len = (
                recon
            )
            g_all = g_cat[g_off[ridx] : g_off[ridx] + g_len[ridx]]
            r_all = r_cat[r_off[ridx] : r_off[ridx] + r_len[ridx]]
            mppg_sizes = szs[s_off[ridx] : s_off[ridx] + s_len[ridx]]
            graph_seq = read_seq = None  # decoded lazily (detail only)
        else:
            graph_seq, read_seq, mppg_sizes = reconstruct_graph_sequence(
                graph, a.path, a.sequence
            )
            g_all = dna.encode(graph_seq)
            r_all = dna.encode(read_seq)
        isrev = a.path.mappings[0].position.is_reverse
        qual = np.frombuffer(a.quality, dtype=np.uint8)
        baseIX = len(a.sequence) - 1 if isrev else 0
        n_map = len(a.path.mappings)

        specials_sum = 0.0
        # per-mapping vectors
        M = len(mppg_sizes)
        sup_rows = np.zeros((M, P), dtype=bool)
        stored_sup = np.zeros(M, dtype=np.float64)
        unsup_pen = np.zeros(M, dtype=np.float64)
        pc25 = np.zeros((M, 25), dtype=np.float32)

        for i, size in enumerate(mppg_sizes):
            if i < n_map:
                nid = a.path.mappings[i].position.node_id
                sup_rows[i] = support[nid - graph.min_id]
            # else: all-unsupported ("No_support") — sup_rows[i] stays False

            if isrev:
                start = baseIX - size - 1 if baseIX - size - 1 >= 0 else 0
            else:
                start = baseIX
            g = g_all[start : start + size]
            r = r_all[start : start + size]
            L = len(g)

            if detail is not None and i < n_map:
                if graph_seq is None:
                    graph_seq = dna.decode(g_all)
                    read_seq = dna.decode(r_all)
                n_probpaths = int(sup_rows[i].sum())
                if path_thres <= 0 or n_probpaths <= path_thres:
                    gs = graph_seq[start : start + size]
                    rs = read_seq[start : start + size]
                    for p in np.flatnonzero(sup_rows[i]):
                        pname = graph.path_names[int(p)]
                        for s in range(len(gs)):
                            if gs[s] == rs[s]:
                                detail.write(
                                    f"{pname}\t{a.name}\t{gs}\t{s}\t"
                                    f"{gs[s]}\t{a.sequence}\t"
                                    f"{baseIX + s}\n"
                                )
            # slice-local quality (reference quirk)
            q_idx = np.zeros(L, dtype=np.int64)
            avail = min(L, len(qual))
            q_idx[:avail] = qual[:avail]
            q = qscore[np.clip(q_idx, 0, 99)]

            is_n = (g == dna.N) | (r == dna.N)
            is_s = ~is_n & ((g == dna.SOFTCLIP) | (r == dna.SOFTCLIP))
            is_gap = ~is_n & ~is_s & ((g == dna.GAP) | (r == dna.GAP))
            is_base = ~is_n & ~is_s & ~is_gap  # ACGT or rare

            specials_sum += (
                is_n.sum() * LOG_N
                + np.log(q[is_s] / 3.0).sum()
                + is_gap.sum() * LOG_GAP
            )

            # supported stored values over base-class positions
            g_rare = is_base & (g >= 4)  # graph char not plain ACGT
            g_acgt = is_base & (g < 4)
            stored_sup[i] = g_acgt.sum() * LOG_SUPPORTED_CONST + np.log(
                4.0 * q[g_rare] / 3.0
            ).sum()

            # unsupported penalty: baseOnRead walk over non-gap read chars
            nongap = (r != dna.GAP).astype(np.int64)
            before = np.concatenate([[0], np.cumsum(nongap)[:-1]])
            base_on_read = (baseIX - before) if isrev else (baseIX + before)
            periodic = (np.abs(base_on_read) % penalty) == 0
            pen = np.where(periodic, np.log1p(-q), np.log(q / 3.0))
            unsup_pen[i] = pen[is_base].sum()

            # pair-class counts for the HKY recompute
            if is_base.any():
                gc = np.minimum(g[is_base], 4)
                rc = np.minimum(r[is_base], 4)
                np.add.at(pc25[i], gc * 5 + rc, 1)

            if isrev:
                baseIX = start
            else:
                baseIX += size

        S = sup_rows.astype(np.float64)  # [M, P]
        path_map[ridx] = (
            specials_sum + stored_sup @ S + unsup_pen @ (1.0 - S)
        )
        counts25[ridx] = np.einsum("mp,mc->pc", S.astype(np.float32), pc25)

    if detail is not None:
        detail.close()
    # batch equivalent of `src/getLCAfromGAM.h:355-357` per-base gate
    guards.check_loglik(path_map, "soibean pathMap")
    # mostProbPath: exact-equality argmax ties (`src/getLCAfromGAM.h:564-579`)
    if R:
        mx = path_map.max(axis=1, keepdims=True)
        ties = (path_map == mx).sum(axis=1)
        unique = ties == 1
        idx = path_map.argmax(axis=1)
    else:
        unique = np.zeros(0, dtype=bool)
        idx = np.zeros(0, dtype=np.int64)
    return ReadStats(
        names=names,
        path_map=path_map,
        counts25=counts25,
        most_prob_unique=unique,
        most_prob_idx=idx,
    )


# ---------------------------------------------------------------------------
# base frequencies + HKY composites (`src/soibean.cpp:609-640`)
# ---------------------------------------------------------------------------
def load_base_freqs(path: str, dbprefix: str) -> Dict[str, float]:
    with open(path) as f:
        for line in f:
            t = line.split()
            if t and t[0] == dbprefix:
                a, c, g, tt = map(float, t[1:5])
                return make_freqs(a, c, g, tt)
    raise ValueError(f"no base frequencies for {dbprefix} in {path}")


def make_freqs(a: float, c: float, g: float, t: float) -> Dict[str, float]:
    f = {"A": a, "C": c, "G": g, "T": t}
    f["R"] = a + g
    f["Y"] = c + t
    f["M"] = 1.0 / (2.0 * (22.0 * a * g + 22.0 * c * t + (a * c + a * t + g * c + g * t)))
    return f


def signature_nodes(
    stats: ReadStats, path_names: List[str], tree_index: Dict[str, int],
    cutk: int = 0,
) -> Tuple[List[int], List[str]]:
    """Initial k estimate from unique-best-path read frequencies
    (`src/soibean.cpp:660-719`): paths that are the single best for at
    least 1% of reads, ordered by frequency."""
    freq: Dict[str, int] = {}
    for u, idx in zip(stats.most_prob_unique, stats.most_prob_idx):
        if u:
            name = path_names[int(idx)]
            freq[name] = freq.get(name, 0) + 1
    order = sorted(freq.items(), key=lambda kv: -kv[1])
    thres = len(stats.names) * 0.01
    nodes: List[int] = []
    paths: List[str] = []
    for name, count in order:
        if count >= thres and name in tree_index:
            nodes.append(tree_index[name])
            paths.append(name)
    if not nodes:
        for name, _count in order:
            if name in tree_index:
                nodes.append(tree_index[name])
                paths.append(name)
    if cutk > 0:
        nodes, paths = nodes[:cutk], paths[:cutk]
    return nodes, paths


def initial_log_like(stats: ReadStats, path_idxs: List[int]) -> float:
    """`src/soibean.cpp:750-776`: mean-field initial likelihood."""
    if len(path_idxs) == 1:
        return float(stats.path_map[:, path_idxs[0]].sum())
    freq = np.log(1.0 / len(path_idxs))
    sub = stats.path_map[:, path_idxs] + freq  # [R, k]
    mx = sub.max(axis=1, keepdims=True)
    return float((mx[:, 0] + np.log(np.exp(sub - mx).sum(axis=1))).sum())
