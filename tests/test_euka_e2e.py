"""euka end-to-end on a synthetic 3-taxon world, mirroring the
reference's mixture tests (`src/test.cpp:1026-1099`): reads sampled at
~5/25/70 proportions must be detected and the MCMC abundance estimates
must land near those proportions."""
import numpy as np
import pytest

from vgan_tpu.graph.packed import PackedGraph
from vgan_tpu.graph.synth import build_haplotype_graph, sample_reads
from vgan_tpu.mapper.giraffe import BatchedMapper
from vgan_tpu.pipelines import euka as ek
from vgan_tpu.pipelines.euka_runner import abundance_mcmc_from_result
from vgan_tpu.utils import dna


def _merge_graphs(graphs):
    """Concatenate disjoint graphs into one (disjoint node-id ranges),
    like euka_db's per-taxon node regions."""
    pools, offs, paths_n, paths_r, names = [], [], [], [], []
    edges_f, edges_fr, edges_t, edges_tr = [], [], [], []
    node_base = 0
    pool_base = 0
    ranges = []
    for g in graphs:
        pools.append(g.node_seq_pool)
        offs.append(g.node_off[1:] + pool_base)
        for j in range(g.n_paths):
            names.append(g.path_names[j])
            paths_n.append(g.path_steps_node[j] + node_base)
            paths_r.append(g.path_steps_rev[j])
        edges_f.append(g.edge_from + node_base)
        edges_fr.append(g.edge_from_rev)
        edges_t.append(g.edge_to + node_base)
        edges_tr.append(g.edge_to_rev)
        ranges.append((node_base + 1, node_base + g.n_nodes))  # 1-based ids
        node_base += g.n_nodes
        pool_base += len(g.node_seq_pool)
    node_off = np.concatenate([np.zeros(1, np.int64)] + offs).astype(np.int64)
    n_nodes = node_base
    support = np.zeros((n_nodes, len(names)), dtype=bool)
    for j, sn in enumerate(paths_n):
        support[sn, j] = True
    return (
        PackedGraph(
            min_id=1,
            node_seq_pool=np.concatenate(pools),
            node_off=node_off,
            edge_from=np.concatenate(edges_f),
            edge_from_rev=np.concatenate(edges_fr),
            edge_to=np.concatenate(edges_t),
            edge_to_rev=np.concatenate(edges_tr),
            path_names=names,
            path_steps_node=paths_n,
            path_steps_rev=paths_r,
            path_support=support,
        ),
        ranges,
    )


@pytest.fixture(scope="module")
def taxa_world():
    rng = np.random.default_rng(5)
    graphs = []
    for t in range(3):
        seq = dna.decode(rng.integers(0, 4, size=3000).astype(np.uint8))
        g, _ = build_haplotype_graph(
            seq, n_haplotypes=2, n_variants=8, seed=20 + t,
            hap_names=[f"tax{t}_h0", f"tax{t}_h1"],
        )
        graphs.append(g)
    graph, ranges = _merge_graphs(graphs)
    clades = [
        ek.CladeInfo(t, f"Taxon{t}", 0.03 + 0.02 * t, 2, ranges[t][0], ranges[t][1])
        for t in range(3)
    ]
    chunks = []
    for t in range(3):
        lo, hi = ranges[t]
        bounds = np.linspace(lo, hi, 9, dtype=int)
        chunks.append(
            [(int(bounds[i]), int(bounds[i + 1]), 1.5) for i in range(8)]
        )
    mapper = BatchedMapper(graph, k=20, w=10)
    return graph, clades, chunks, mapper


def test_three_taxon_mixture(taxa_world):
    graph, clades, chunks, mapper = taxa_world
    rng_counts = [(0, 140), (2, 40), (4, 20)]  # path_idx (taxon*2), n
    reads = []
    for i, (pidx, n) in enumerate(rng_counts):
        reads += sample_reads(graph, pidx, n, read_len=80, seed=40 + i)
    alignments = [a for a in mapper.map_reads(reads) if a.identity != 0]
    assert len(alignments) > 0.9 * len(reads)
    scorer = ek.EukaScorer(graph, clades, chunks)
    res = scorer.score(
        alignments, min_mq=29, min_frag=10, min_bins=4, max_bins=0,
        entropy_threshold=1.17,
    )
    # all three taxa detected
    assert sorted(res.detected) == [0, 1, 2], (res.detected, res.counts)
    # reads assigned to the right taxa
    assert res.counts[0] > res.counts[1] > res.counts[2]
    mcmc = abundance_mcmc_from_result(res, n_iter=4000, burnin=200, seed=7)
    assert mcmc is not None
    est = {i: mcmc.estimate[r] for r, i in enumerate(res.detected)}
    # abundance windows (reference-style tolerance bands)
    assert 0.55 < est[0] < 0.85, est
    assert 0.10 < est[1] < 0.35, est
    assert 0.02 < est[2] < 0.25, est
    # per-component posterior medians sum approximately (not exactly) to 1
    assert abs(sum(est.values()) - 1.0) < 0.02


def test_single_taxon_is_one(taxa_world):
    graph, clades, chunks, mapper = taxa_world
    reads = sample_reads(graph, 2, 60, read_len=80, seed=99)  # taxon 1 only
    alignments = [a for a in mapper.map_reads(reads) if a.identity != 0]
    scorer = ek.EukaScorer(graph, clades, chunks)
    res = scorer.score(
        alignments, min_mq=29, min_frag=10, min_bins=2, max_bins=0,
        entropy_threshold=0.9,
    )
    assert res.detected == [1]
    init = ek.compute_init_vec(res.counts, res.detected)
    assert init[0] == pytest.approx(1.0)
