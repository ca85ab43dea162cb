"""I/O layer tests: BGZF, GAM codec, GFA parsing."""
import numpy as np
import pytest

from vgan_tpu.io import bgzf, gam
from vgan_tpu.utils import dna


def test_bgzf_roundtrip(tmp_path):
    payload = bytes(range(256)) * 1000
    p = tmp_path / "x.bgzf"
    bgzf.write_file(str(p), payload)
    assert bgzf.read_file(str(p)) == payload
    # must be valid standard gzip too
    import gzip

    assert gzip.decompress(p.read_bytes()) == payload


def test_read_toy_gam(toy_reads):
    # test_reads.gam carries the 10 reconstruction fixtures
    assert len(toy_reads) == 10
    a = toy_reads[0]
    assert a.sequence == "CCCCATTTATACCGTGAGTAGGGTCGACCAAGAAC"
    assert a.name == "perfect_match_plus_strand"
    assert a.identity != 0
    assert a.path.mappings[0].position.node_id == 13
    assert a.path.mappings[0].position.offset == 9
    assert not a.path.mappings[0].position.is_reverse
    # minus strand read
    m = toy_reads[5]
    assert m.name == "perfect_match_minus_strand"
    assert m.path.mappings[0].position.is_reverse


def test_read_real_gam(ref):
    reads = gam.read_gam(str(ref / "test/input_files/alignments/J2a1a1a1.gam"))
    assert len(reads) == 81
    assert all(r.sequence for r in reads)
    # qualities are raw phred bytes
    assert max(max(r.quality) for r in reads if r.quality) <= 93


def test_gam_roundtrip(tmp_path, toy_reads):
    p = tmp_path / "rt.gam"
    gam.write_gam(str(p), toy_reads)
    back = gam.read_gam(str(p))
    assert len(back) == len(toy_reads)
    for a, b in zip(toy_reads, back):
        assert a.sequence == b.sequence
        assert a.name == b.name
        assert a.quality == b.quality
        assert a.mapping_quality == b.mapping_quality
        assert abs(a.identity - b.identity) < 1e-12
        assert len(a.path.mappings) == len(b.path.mappings)
        for ma, mb in zip(a.path.mappings, b.path.mappings):
            assert ma.position.node_id == mb.position.node_id
            assert ma.position.offset == mb.position.offset
            assert ma.position.is_reverse == mb.position.is_reverse
            assert ma.rank == mb.rank
            assert [
                (e.from_length, e.to_length, e.sequence) for e in ma.edits
            ] == [(e.from_length, e.to_length, e.sequence) for e in mb.edits]


def test_gfa_parse(toy_graph):
    g = toy_graph
    assert g.min_id == 2  # node 1 absent in toy GFA
    assert g.node_seq(13) == "TGGAGCGCGCCCCATTTATACCGTGAGTAGGG"
    assert g.node_seq(5) == "AATAATTAG"
    # reverse orientation
    assert g.node_seq(16, True) == "A"
    assert g.n_paths >= 1
    # path support row for a node on seq_1
    row = g.path_support[g.node_index(13)]
    assert row.any()


def test_dna_codes():
    codes = dna.encode("ACGTN-SW")
    assert list(codes) == [0, 1, 2, 3, 4, 5, 6, 7]
    assert dna.decode(codes[:7]) == "ACGTN-S"
    assert dna.revcomp("ACGTN") == "NACGT"


def test_native_gam_codec(ref, toy_reads):
    from vgan_tpu.io import gam_native

    if not gam_native.available():
        pytest.skip("native codec unavailable")
    fast = gam_native.read_gam_fast(
        str(ref / "test/reconstructInputSeq/test_reads.gam")
    )
    assert len(fast) == len(toy_reads)
    for a, b in zip(toy_reads, fast):
        assert a.sequence == b.sequence
        assert a.name == b.name
        assert a.quality == b.quality
        assert a.mapping_quality == b.mapping_quality
        assert abs(a.identity - b.identity) < 1e-12
        assert len(a.path.mappings) == len(b.path.mappings)
        for ma, mb in zip(a.path.mappings, b.path.mappings):
            assert ma.position.node_id == mb.position.node_id
            assert ma.position.offset == mb.position.offset
            assert ma.position.is_reverse == mb.position.is_reverse
            assert [
                (e.from_length, e.to_length, e.sequence) for e in ma.edits
            ] == [(e.from_length, e.to_length, e.sequence) for e in mb.edits]


def test_native_gam_codec_large(ref):
    """Byte-parity between the production C++ codec (the default
    read_gam path) and the pure-Python decoder on a real 81-read GAM —
    including qualities containing phred-0 (NUL) bytes, which
    regressed once via a c_char_p truncation."""
    from vgan_tpu.io import gam, gam_native

    if not gam_native.available():
        pytest.skip("native codec unavailable")
    p = str(ref / "test/input_files/alignments/J2a1a1a1.gam")
    native = gam_native.read_gam_native(p)
    py = gam.read_gam(p, native=False)
    assert native is not None and len(native) == len(py)
    assert any(0 in a.quality for a in py)  # the hard case is present
    for a, b in zip(py, native):
        assert (a.sequence, a.name, a.quality, a.mapping_quality,
                a.score, a.identity, a.read_paired) == (
            b.sequence, b.name, b.quality, b.mapping_quality,
            b.score, b.identity, b.read_paired)
        assert len(a.path.mappings) == len(b.path.mappings)
        for ma, mb in zip(a.path.mappings, b.path.mappings):
            assert (ma.position.node_id, ma.position.offset,
                    ma.position.is_reverse, ma.rank) == (
                mb.position.node_id, mb.position.offset,
                mb.position.is_reverse, mb.rank)
            assert [
                (e.from_length, e.to_length, e.sequence) for e in ma.edits
            ] == [(e.from_length, e.to_length, e.sequence) for e in mb.edits]


def test_read_vg_matches_gfa_twin(ref):
    """The bundled .vg and .gfa fixtures are the same graph
    (`test/reconstructInputSeq/cmds`); the vg-protobuf reader must
    produce an identical PackedGraph."""
    import numpy as np

    from vgan_tpu.graph.packed import PackedGraph
    from vgan_tpu.io.vgformat import read_vg

    g_vg = read_vg(str(ref / "test/reconstructInputSeq/target_graph.vg"))
    g_gfa = PackedGraph.from_gfa(
        str(ref / "test/reconstructInputSeq/target_graph.gfa")
    )
    assert g_vg.min_id == g_gfa.min_id
    assert np.array_equal(g_vg.node_seq_pool, g_gfa.node_seq_pool)
    assert np.array_equal(g_vg.node_off, g_gfa.node_off)
    assert sorted(g_vg.path_names) == sorted(g_gfa.path_names)
    for n in g_vg.path_names:
        i, j = g_vg.path_names.index(n), g_gfa.path_names.index(n)
        assert np.array_equal(
            g_vg.path_steps_node[i], g_gfa.path_steps_node[j]
        )
        assert np.array_equal(g_vg.path_steps_rev[i], g_gfa.path_steps_rev[j])
    ev = sorted(zip(g_vg.edge_from.tolist(), g_vg.edge_from_rev.tolist(),
                    g_vg.edge_to.tolist(), g_vg.edge_to_rev.tolist()))
    eg = sorted(zip(g_gfa.edge_from.tolist(), g_gfa.edge_from_rev.tolist(),
                    g_gfa.edge_to.tolist(), g_gfa.edge_to_rev.tolist()))
    assert ev == eg
    assert np.array_equal(
        g_vg.path_support[:, [g_vg.path_names.index(n) for n in g_gfa.path_names]],
        g_gfa.path_support,
    )


def test_native_fastq_parity(ref, tmp_path):
    """The C++ FASTQ parser matches the Python reader field-for-field,
    plain and gzipped."""
    import gzip as _gzip
    import shutil

    from vgan_tpu.io import fastx

    src = str(ref / "test/reconstructInputSeq/test_reads.fq")
    native = fastx._read_fastq_native(src)
    if native is None:
        import pytest

        pytest.skip("native lib unavailable")
    pure = list(fastx.iter_fastq(src))
    assert len(native) == len(pure)
    for a, b in zip(native, pure):
        assert (a.name, a.seq, a.qual) == (b.name, b.seq, b.qual)
    gz = str(tmp_path / "reads.fq.gz")
    with open(src, "rb") as f, _gzip.open(gz, "wb") as g:
        shutil.copyfileobj(f, g)
    nz = fastx.read_fastq(gz)
    assert len(nz) == len(pure) and nz[0].seq == pure[0].seq


def test_fastq_edge_cases_native_python_parity(tmp_path):
    """Truncated records (no trailing newline after seq/'+'/qual) and
    CRLF line endings parse identically in the C++ and Python readers
    — the truncated forms previously drove an out-of-bounds memchr in
    the native parser (ADVICE r1)."""
    import pytest

    from vgan_tpu.io import fastx

    cases = {
        "trunc_seq.fq": "@r1\nACGT",               # ends mid-record after seq
        "trunc_plus.fq": "@r1\nACGT\n+",            # ends after '+'
        "trunc_qual.fq": "@r1\nACGT\n+\nII",        # short qual, no newline
        "crlf.fq": "@r1 desc\r\nACGT\r\n+\r\nIIII\r\n",
        "long_qual.fq": "@r1\nACGT\n+\nIIIIII\n",   # qual longer than seq
    }
    for fname, text in cases.items():
        p = str(tmp_path / fname)
        with open(p, "w") as f:
            f.write(text)
        pure = list(fastx.iter_fastq(p))
        assert len(pure) == 1
        r = pure[0]
        assert r.seq == "ACGT" and len(r.qual) == 4
        native = fastx._read_fastq_native(p)
        if native is None:
            pytest.skip("native lib unavailable")
        assert len(native) == 1
        a = native[0]
        assert (a.name, a.seq, a.qual) == (r.name, r.seq, r.qual), fname


def test_runtime_guards():
    """Batch-boundary equivalents of the reference's NaN/positivity
    throws (SURVEY §5; `src/getLCAfromGAM.h:355-357`,
    `src/MCMC.cpp:1164-1169`)."""
    import numpy as np
    import pytest

    from vgan_tpu.utils import guards

    guards.check_finite(np.array([1.0, -2.0]), "x")
    with pytest.raises(RuntimeError, match="nan"):
        guards.check_finite(np.array([1.0, np.nan]), "x")
    guards.check_loglik(np.array([-3.0, 0.0]), "ll")
    with pytest.raises(RuntimeError, match="positive"):
        guards.check_loglik(np.array([-3.0, 0.5]), "ll")
    with pytest.raises(RuntimeError, match="nan"):
        guards.check_loglik(np.array([np.inf]), "ll")
    guards.check_simplex(np.array([[0.3, 0.7], [0.5, 0.5]]), "s")
    with pytest.raises(RuntimeError, match="sum"):
        guards.check_simplex(np.array([0.3, 0.3]), "s")


def test_read_og_matches_gfa_twin(ref):
    """The bundled .og fixture is the same graph as its GFA twin
    (`test/reconstructInputSeq/`); the bdsg-ODGI binary reader must
    produce an identical PackedGraph (sequences, paths incl.
    orientations, canonical edge set)."""
    import numpy as np

    from vgan_tpu.graph.packed import PackedGraph
    from vgan_tpu.io.odgi import read_og

    g_og = read_og(str(ref / "test/reconstructInputSeq/target_graph.og"))
    g_gfa = PackedGraph.from_gfa(
        str(ref / "test/reconstructInputSeq/target_graph.gfa")
    )
    assert g_og.min_id == g_gfa.min_id
    assert g_og.n_nodes == g_gfa.n_nodes
    assert np.array_equal(g_og.node_seq_pool, g_gfa.node_seq_pool)
    assert np.array_equal(g_og.node_off, g_gfa.node_off)
    assert sorted(g_og.path_names) == sorted(g_gfa.path_names)
    for n in g_og.path_names:
        i, j = g_og.path_names.index(n), g_gfa.path_names.index(n)
        assert np.array_equal(
            g_og.path_steps_node[i], g_gfa.path_steps_node[j]
        ), n
        assert np.array_equal(g_og.path_steps_rev[i], g_gfa.path_steps_rev[j])

    def canon(g):
        out = set()
        for a, ar, b, br in zip(
            g.edge_from.tolist(), g.edge_from_rev.tolist(),
            g.edge_to.tolist(), g.edge_to_rev.tolist(),
        ):
            e = (a, ar, b, br)
            out.add(min(e, (e[2], not e[3], e[0], not e[1])))
        return out

    assert canon(g_og) == canon(g_gfa)
    assert np.array_equal(
        g_og.path_support[:, [g_og.path_names.index(n) for n in g_gfa.path_names]],
        g_gfa.path_support,
    )


def test_build_db_from_og(ref, tmp_path):
    """build-db accepts .og input directly."""
    from vgan_tpu import cli

    out = tmp_path / "db"
    rc = cli.main(
        ["build-db", str(ref / "test/reconstructInputSeq/target_graph.og"), str(out)]
    )
    assert rc == 0
    from vgan_tpu.graph.packed import PackedGraph

    g = PackedGraph.load(str(out / "graph.npz"))
    assert g.n_nodes == 28 and g.n_paths == 5


# ------------------------------------------------------------------- GBZ
def test_gbz_matches_gfa_twin(ref):
    """The GBZ reader (simple-sds decode of target.giraffe.gbz, the
    HaploCart-mode giraffe input `src/map_giraffe.cpp:41-55`) produces
    the exact graph of its GFA twin: node sequences, paths (names +
    oriented steps) and the full edge set (VERDICT r1 #7)."""
    from vgan_tpu.io.gbz import read_gbz
    from vgan_tpu.io.gfa import parse_gfa

    g = read_gbz(str(ref / "test/input_files/target.giraffe.gbz"))
    segs, paths, links = parse_gfa(
        str(ref / "test/reconstructInputSeq/target_graph.gfa")
    )
    assert set(g.node_seqs) == set(segs)
    for nid, seq in segs.items():
        assert g.node_seqs[nid] == seq, nid
    gfa_paths = {p[0]: [(n, bool(rv)) for n, rv in p[1]] for p in paths}
    assert sorted(n for n, _ in g.paths) == sorted(gfa_paths)
    for name, steps in g.paths:
        assert steps == gfa_paths[name], name

    def canon(a, b):
        ra, rb = (b[0], not b[1]), (a[0], not a[1])
        return min((a, b), (ra, rb))

    gfa_e = {canon((f, bool(fr)), (t, bool(tr))) for f, fr, t, tr in links}
    gbz_e = {canon((f, fr), (t, tr)) for f, fr, t, tr in g.edges}
    assert gbz_e == gfa_e


def test_build_db_from_gbz_identical(ref, tmp_path):
    """build-db on the GBZ produces a packed graph identical to the
    GFA-built one."""
    import numpy as np

    from vgan_tpu import cli
    from vgan_tpu.graph.packed import PackedGraph

    d1, d2 = tmp_path / "gbz", tmp_path / "gfa"
    assert cli.main([
        "build-db", str(ref / "test/input_files/target.giraffe.gbz"),
        str(d1),
    ]) == 0
    assert cli.main([
        "build-db",
        str(ref / "test/reconstructInputSeq/target_graph.gfa"), str(d2),
    ]) == 0
    a = PackedGraph.load(str(d1 / "graph.npz"))
    b = PackedGraph.load(str(d2 / "graph.npz"))
    assert a.min_id == b.min_id
    np.testing.assert_array_equal(a.node_off, b.node_off)
    np.testing.assert_array_equal(a.node_seq_pool, b.node_seq_pool)
    assert a.path_names == b.path_names
    for sa, sb in zip(a.path_steps_node, b.path_steps_node):
        np.testing.assert_array_equal(sa, sb)
    for sa, sb in zip(a.path_steps_rev, b.path_steps_rev):
        np.testing.assert_array_equal(sa, sb)
    np.testing.assert_array_equal(a.path_support, b.path_support)
    ea = {tuple(x) for x in zip(a.edge_from, a.edge_from_rev,
                                a.edge_to, a.edge_to_rev)}
    eb = {tuple(x) for x in zip(b.edge_from, b.edge_from_rev,
                                b.edge_to, b.edge_to_rev)}

    def canon(f, fr, t, tr):
        x, y = (int(f), bool(fr)), (int(t), bool(tr))
        rx, ry = (y[0], not y[1]), (x[0], not x[1])
        return min((x, y), (rx, ry))

    assert {canon(*e) for e in ea} == {canon(*e) for e in eb}


def test_gg_gbwt_pair_matches_gfa_twin(ref):
    """The .gg (GBWTGraph node sequences) + .gbwt (simple-sds GBWT:
    topology, haplotype paths, names) pair — the euka/soibean-era
    giraffe index family (`src/map_giraffe_Euka.cpp:16-101`) — loads
    into the exact GFA-twin graph."""
    import numpy as np

    from vgan_tpu.graph.packed import PackedGraph
    from vgan_tpu.io.gbz import load_packed_graph_gg

    g1 = load_packed_graph_gg(
        str(ref / "test/input_files/target.gg"),
        str(ref / "test/input_files/target.gbwt"),
    )
    g2 = PackedGraph.from_gfa(
        str(ref / "test/reconstructInputSeq/target_graph.gfa")
    )
    assert g1.min_id == g2.min_id and g1.n_nodes == g2.n_nodes
    np.testing.assert_array_equal(g1.node_seq_pool, g2.node_seq_pool)
    assert g1.path_names == g2.path_names
    for a, b in zip(g1.path_steps_node, g2.path_steps_node):
        np.testing.assert_array_equal(a, b)

    def canon(g):
        out = set()
        for f, fr, t, tr in zip(g.edge_from, g.edge_from_rev,
                                g.edge_to, g.edge_to_rev):
            a, b = (int(f), bool(fr)), (int(t), bool(tr))
            ra, rb = (b[0], not b[1]), (a[0], not a[1])
            out.add(min((a, b), (ra, rb)))
        return out

    assert canon(g1) == canon(g2)


def test_xg_matches_gg_twin(ref):
    """The sdsl .xg reader (`vgan_tpu/io/xg.py`, the vg xg index the
    reference's giraffe stack consumes, `src/map_giraffe.cpp:41-55`
    family) decodes target.xg into the exact graph the .gg+.gbwt twin
    yields: nodes, sequences, edges, and per-name path step sequences.
    Path COLUMN order differs (.xg keeps insertion order), so support
    is compared under the name permutation."""
    import numpy as np

    from vgan_tpu.io.gbz import load_packed_graph_gg
    from vgan_tpu.io.xg import load_packed_graph_xg

    gx = load_packed_graph_xg(str(ref / "test/input_files/target.xg"))
    gg = load_packed_graph_gg(
        str(ref / "test/input_files/target.gg"),
        str(ref / "test/input_files/target.gbwt"),
    )
    assert gx.min_id == gg.min_id and gx.n_nodes == gg.n_nodes
    np.testing.assert_array_equal(gx.node_off, gg.node_off)
    np.testing.assert_array_equal(gx.node_seq_pool, gg.node_seq_pool)
    assert sorted(gx.path_names) == sorted(gg.path_names)
    by_name = dict(zip(gx.path_names, gx.path_steps_node))
    rev_by_name = dict(zip(gx.path_names, gx.path_steps_rev))
    for name, steps, rev in zip(
        gg.path_names, gg.path_steps_node, gg.path_steps_rev
    ):
        np.testing.assert_array_equal(by_name[name], steps)
        np.testing.assert_array_equal(rev_by_name[name], rev)
    perm = [gx.path_names.index(n) for n in gg.path_names]
    np.testing.assert_array_equal(gx.path_support[:, perm],
                                  gg.path_support)
    ex = set(zip(gx.edge_from.tolist(), gx.edge_from_rev.tolist(),
                 gx.edge_to.tolist(), gx.edge_to_rev.tolist()))
    eg = set(zip(gg.edge_from.tolist(), gg.edge_from_rev.tolist(),
                 gg.edge_to.tolist(), gg.edge_to_rev.tolist()))
    assert ex == eg


def test_build_db_from_xg(ref, tmp_path):
    """`build-db target.xg` produces a usable packed DB (VERDICT r2
    stretch #9: the .xg flavor loads natively end-to-end)."""
    from vgan_tpu.cli import main

    rc = main([
        "build-db", str(ref / "test/input_files/target.xg"),
        str(tmp_path / "xgdb"),
    ])
    assert rc == 0
    from vgan_tpu.graph.packed import PackedGraph

    g = PackedGraph.load(str(tmp_path / "xgdb" / "graph.npz"))
    assert g.n_nodes == 28 and g.n_paths == 5
