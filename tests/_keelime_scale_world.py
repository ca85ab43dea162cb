"""Shared builder for keelime scaling worlds: a linear-chain graph at
FIXED ~75x coverage with three 300bp coverage gaps (multi-contig), and
fragments constructed directly (no mapper) so the slow suite times the
assembly pipeline itself (VERDICT r4 #4)."""
import numpy as np

from vgan_tpu.graph.packed import PackedGraph
from vgan_tpu.pipelines import keelime as kl
from vgan_tpu.utils import dna


def build_scale_world(n_reads: int, seed: int = 0):
    G = n_reads * 60 // 75  # fixed coverage: genome grows with reads
    rng = np.random.default_rng(seed)
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, G))
    node_len = 16
    nn = (G + node_len - 1) // node_len
    pool = dna.encode(ref)
    off = np.minimum(np.arange(nn + 1, dtype=np.int64) * node_len, G)
    graph = PackedGraph(
        min_id=1, node_seq_pool=pool, node_off=off,
        edge_from=np.arange(nn - 1, dtype=np.int32),
        edge_from_rev=np.zeros(nn - 1, bool),
        edge_to=np.arange(1, nn, dtype=np.int32),
        edge_to_rev=np.zeros(nn - 1, bool),
        path_names=["ref"],
        path_steps_node=[np.arange(nn, dtype=np.int32)],
        path_steps_rev=[np.zeros(nn, bool)],
        path_support=np.ones((nn, 1), bool),
    )
    gaps = [(int(G * f), int(G * f) + 300) for f in (0.25, 0.5, 0.75)]
    L = 60
    starts = rng.integers(0, G - L, size=int(n_reads * 1.4))
    keep = np.ones(len(starts), bool)
    for g0, g1 in gaps:
        keep &= ~((starts > g0 - L) & (starts < g1))
    starts = starts[keep][:n_reads]
    frags = []
    for ridx, s in enumerate(starts):
        s = int(s)
        seq = ref[s : s + L]
        n0, n1 = s // node_len, (s + L - 1) // node_len
        node_ids = list(range(n0 + 1, n1 + 2))
        offsets = [s - n0 * node_len] + [0] * (n1 - n0)
        probs = np.full((L, 5), 0.01)
        counts = np.zeros((L, 5), np.int64)
        for i, ch in enumerate(seq):
            j = "ACGT-".index(ch)
            probs[i, j] = 0.96
            counts[i, j] = 1
        frags.append(kl.Frag(
            name=f"r{ridx}", seq=seq, graph_seq=seq, node_ids=node_ids,
            offsets=offsets, coverage=[1] * len(node_ids), probs=probs,
            counts=counts, cut=(False, 0), ry="",
        ))
    return graph, frags, G
