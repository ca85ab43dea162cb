"""Device-resident HaploCart scoring step.

The full per-batch compute of `src/HaploCart.cpp:408-421` as one jitted
function: per-base probability math on [M, S] mapping tiles (VPU),
per-node scatter-accumulation (segment sum), and the path reduction as
a single [n_nodes] x [n_nodes, n_paths] matvec (MXU). M = total
mappings in the batch, S = max node length (8 for the HC graph,
`src/test.cpp:627`).

This function is the framework's flagship jittable step: it is what
`__graft_entry__.entry()` exposes and what bench.py measures.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import mutation, phred


class HcBatch(NamedTuple):
    """Columnar mapping batch (padded)."""

    g: jnp.ndarray  # [M, S] graph codes (0..3 ACGT, >=4 skip)
    r: jnp.ndarray  # [M, S] read codes (from read start — reference quirk)
    q: jnp.ndarray  # [M, S] int quality of the mapping slice
    pang: jnp.ndarray  # [M] pangenome coordinate of the mapping's node
    mq: jnp.ndarray  # [M] read mapping quality
    b: jnp.ndarray  # [M] unsupported-path penalty (precomputed log-sum)
    node: jnp.ndarray  # [M] node index
    valid: jnp.ndarray  # [M, S] in-bounds mask


class HcTables(NamedTuple):
    match_tab: jnp.ndarray  # [PAN] (1-mu)^gens
    mapp_tab: jnp.ndarray  # [PAN] mappability
    qtab: jnp.ndarray  # [100] p_seq_error
    imtab: jnp.ndarray  # [100] p_incorrectly_mapped
    bg: jnp.ndarray  # [8] background freqs by code
    support: jnp.ndarray  # [n_nodes, n_paths]


def make_tables(support: np.ndarray, dtype=jnp.float32) -> HcTables:
    bg = np.concatenate([mutation.BACKGROUND_FREQ, [0.25, 0.25, 0.25]])
    return HcTables(
        match_tab=jnp.asarray(mutation.match_prob_table(), dtype),
        mapp_tab=jnp.asarray(np.ones(mutation.PANGENOME_LEN), dtype),
        qtab=jnp.asarray(phred.qscore_vec(), dtype),
        imtab=jnp.asarray(phred.incorrect_mapping_vec(), dtype),
        bg=jnp.asarray(bg, dtype),
        support=jnp.asarray(support, dtype),
    )


def mapping_scores(batch: HcBatch, t: HcTables):
    """Per-mapping supported-increment A[M] (`src/process_mapping.cpp:54-81`)."""
    qv = t.qtab[jnp.clip(batch.q, 0, 99)]
    valid = batch.valid & (batch.g < 4) & (batch.r < 4)
    eps = jnp.where(batch.g == batch.r, qv, 1.0 - qv)
    p_obs = t.match_tab[batch.pang][:, None] * (1.0 - eps)
    p_correct = (1.0 - t.imtab[jnp.clip(batch.mq, 0, 99)]) * t.mapp_tab[batch.pang]
    bg = t.bg[batch.r]
    term = jnp.log(
        (1.0 - p_correct)[:, None] * bg + p_correct[:, None] * p_obs
    )
    return jnp.where(valid, term, 0.0).sum(axis=1)


@jax.jit
def score_batch(batch: HcBatch, t: HcTables):
    """final_vec over paths for one sharded batch of mappings."""
    A = mapping_scores(batch, t)
    d = A - batch.b
    n_nodes = t.support.shape[0]
    c = jax.ops.segment_sum(d, batch.node, num_segments=n_nodes)
    total_b = batch.b.sum()
    return total_b + c @ t.support


def synth_batch(
    n_reads: int,
    read_len: int = 100,
    node_len: int = 8,
    n_nodes: int = 11825,
    seed: int = 0,
    dtype=jnp.float32,
) -> HcBatch:
    """Synthesize a HaploCart-scale workload (for bench/compile-check)."""
    rng = np.random.default_rng(seed)
    m_per_read = read_len // node_len
    M = n_reads * m_per_read
    S = node_len
    g = rng.integers(0, 4, size=(M, S), dtype=np.int32)
    r = g.copy()
    mut = rng.random((M, S)) < 0.02
    r[mut] = rng.integers(0, 4, size=int(mut.sum()))
    q = rng.integers(20, 40, size=(M, S)).astype(np.int32)
    pang = rng.integers(1, 16569, size=M).astype(np.int32)
    mq = np.repeat(rng.integers(30, 61, size=n_reads), m_per_read).astype(np.int32)
    b = (read_len * np.log(1e-3)) * np.ones(M)
    node = rng.integers(0, n_nodes, size=M).astype(np.int32)
    valid = np.ones((M, S), dtype=bool)
    return HcBatch(
        g=jnp.asarray(g),
        r=jnp.asarray(r),
        q=jnp.asarray(q),
        pang=jnp.asarray(pang),
        mq=jnp.asarray(mq),
        b=jnp.asarray(b, dtype),
        node=jnp.asarray(node),
        valid=jnp.asarray(valid),
    )


def synth_support(n_nodes: int = 11825, n_paths: int = 5179, seed: int = 1):
    rng = np.random.default_rng(seed)
    # realistic density: most nodes are on most paths (backbone), some
    # variant nodes are sparse
    support = rng.random((n_nodes, n_paths)) < 0.85
    return support.astype(np.float32)


def batch_from_alignments(db, alignments, max_node_len: int = 8):
    """Build an HcBatch from real GAM alignments (device-scorer input).

    Host prep mirrors pipelines/haplocart.mapping_scalars (same quirks:
    read bases from the read start, per-mapping quality slices, whole-
    read unsupported penalty); the per-base math then runs on device.
    Mappings longer than max_node_len are truncated to it (the real HC
    graph has <=8bp nodes, `src/test.cpp:627`); pass a larger value for
    graphs with longer nodes."""
    from ..graph.reconstruct import reconstruct_graph_sequence
    from ..models import phred
    from ..utils import dna

    rows_g, rows_r, rows_q, rows_v = [], [], [], []
    pang, mq, bvec, node = [], [], [], []
    qscore = phred.qscore_vec()
    log_q0 = float(np.log(qscore[0]))
    S = max_node_len
    col = np.arange(S)
    for a in alignments:
        if a.identity < 1e-10 or not a.path.mappings:
            continue
        graph_seq, read_seq, sizes = reconstruct_graph_sequence(
            db.graph, a.path, a.sequence
        )
        gcodes = dna.encode(graph_seq).astype(np.int32)
        rcodes = dna.encode(read_seq).astype(np.int32)
        L = len(read_seq)
        qual = np.zeros(2 * L + 8, dtype=np.int64)
        q_raw = np.frombuffer(a.quality, dtype=np.uint8)
        qual[: len(q_raw)] = q_raw
        n_map = len(a.path.mappings)
        # per-mapping sizes: sizes is per-edit (reference quirk) but
        # indexed per mapping (`src/update_likelihood.cpp:36`)
        size_m = np.array(
            [sizes[i] if i < len(sizes) else 0 for i in range(n_map)],
            dtype=np.int64,
        )
        starts = np.concatenate([[0], np.cumsum(size_m)[:-1]])
        take = np.minimum(size_m, S)
        # all rows of this read in one gather
        idx = starts[:, None] + col[None, :]  # [n_map, S]
        v = col[None, :] < take[:, None]
        gpad = np.full(len(gcodes) + S, 255, dtype=np.int32)
        gpad[: len(gcodes)] = gcodes
        g_rows = np.where(v, gpad[np.minimum(idx, len(gpad) - 1)], 255)
        # read row content is shared: the first `take` chars of the
        # read from its start (reference quirk), masked per mapping
        r_base = np.full(S, 255, dtype=np.int32)
        r_base[: min(S, len(rcodes))] = rcodes[:S]
        r_rows = np.where(v, r_base[None, :], 255)
        qpad = np.zeros(len(qual) + S, dtype=np.int32)
        qpad[: len(qual)] = qual
        q_rows = np.where(v, qpad[np.minimum(idx, len(qpad) - 1)], 0)
        # unsupported-path penalty over [pos, pos+L) of the padded
        # quality array, via one cumulative sum per read
        logq = np.log(qscore[np.clip(qual, 0, 99)])
        cum = np.concatenate([[0.0], np.cumsum(logq)])
        ends = starts + L
        in_range = np.minimum(ends, len(qual))
        b_read = (
            cum[in_range] - cum[np.minimum(starts, len(qual))]
            + (ends - in_range) * log_q0
        )
        nidx = np.array(
            [m.position.node_id - db.graph.min_id for m in a.path.mappings],
            dtype=np.int32,
        )
        rows_g.append(g_rows)
        rows_r.append(r_rows)
        rows_q.append(q_rows)
        rows_v.append(v)
        node.append(nidx)
        pang.append(db.pangenome_base[nidx].astype(np.int32))
        mq.append(np.full(n_map, min(a.mapping_quality, 99), dtype=np.int32))
        bvec.append(b_read)
    if not node:
        return None
    return HcBatch(
        g=jnp.asarray(np.concatenate(rows_g)),
        r=jnp.asarray(np.concatenate(rows_r)),
        q=jnp.asarray(np.concatenate(rows_q)),
        pang=jnp.asarray(np.concatenate(pang)),
        mq=jnp.asarray(np.concatenate(mq)),
        b=jnp.asarray(np.concatenate(bvec)),
        node=jnp.asarray(np.concatenate(node)),
        valid=jnp.asarray(np.concatenate(rows_v)),
    )


def make_tables_from_db(db, dtype=jnp.float32) -> HcTables:
    from ..models import mutation, phred

    mapp = db.mappabilities
    need = int(db.pangenome_base.max()) + 1
    if len(mapp) < need:
        mapp = np.concatenate([mapp, np.ones(need - len(mapp))])
    bg = np.concatenate([mutation.BACKGROUND_FREQ, [0.25, 0.25, 0.25]])
    return HcTables(
        match_tab=jnp.asarray(db.match_prob, dtype),
        mapp_tab=jnp.asarray(mapp, dtype),
        qtab=jnp.asarray(phred.qscore_vec(), dtype),
        imtab=jnp.asarray(phred.incorrect_mapping_vec(), dtype),
        bg=jnp.asarray(bg, dtype),
        support=jnp.asarray(db.graph.path_support, dtype),
    )
