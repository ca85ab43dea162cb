"""keelime assembler unit tests: oracle comparisons against literal
transcriptions of the reference C++ loops (src/assembly.cpp) plus
behavioral tests of the merge rules the reference only exercises
end-to-end."""
import numpy as np
import pytest

from vgan_tpu.pipelines import keelime as kl


# ------------------------------------------------------------- oracles
def oracle_calc_match_score(a, b):
    """Literal transcription of calculate_match_score
    (src/assembly.cpp:455-486)."""
    if a == "-" and b == "-":
        return 1.0
    if a == "-" or b == "-":
        return 0.0
    if a == "N" or b == "N":
        return 0.0
    if a in "ACGT" and a == b:
        return 3.0
    if (a == "R" and b in "AG") or (b == "R" and a in "AG"):
        return 2.0
    if (a == "Y" and b in "CT") or (b == "Y" and a in "CT"):
        return 2.0
    if (a == "R" and b == "R") or (a == "Y" and b == "Y"):
        return 1.0
    if (a, b) in (("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")):
        return -1.0
    return -3.0


def oracle_bases_match(a, b):
    """Literal transcription of basesMatch (src/assembly.cpp:323-386);
    returns (match, penalty)."""
    if a == b:
        return True, 0.0
    if a == "-" or b == "-":
        return False, 0.0
    if a == "N" or b == "N":
        return False, 0.0
    if a in "Rr" and b in "AaGgRr":
        return True, 0.0
    if a in "Yy" and b in "CcTtYy":
        return True, 0.0
    if a in "AaGg" and b in "Rr":
        return True, 0.0
    if a in "CcTt" and b in "Yy":
        return True, 0.0
    if (a, b) in (
        ("C", "T"), ("c", "t"), ("G", "A"), ("g", "a"),
        ("T", "C"), ("t", "c"), ("A", "G"), ("a", "g"),
    ):
        return False, 0.5
    return False, 3.0


def oracle_overlap(a, b, min_olen, min_score):
    """Literal transcription of get_overlap_length_and_score
    (src/assembly.cpp:523-610)."""
    best_len, best_score = 0, 0.0
    la, lb = len(a), len(b)
    for start in range(0, la - min_olen + 1):
        olen = min(lb, la - start)
        score = 0.0
        for i in range(olen):
            m, pen = oracle_bases_match(a[start + i], b[i])
            if not m:
                score -= pen
        for i in range(olen):
            score += oracle_calc_match_score(a[start + i], b[i])
        if score >= min_score and olen >= min_olen:
            if olen > best_len or (olen == best_len and score > best_score):
                best_len, best_score = olen, score
    return best_len, best_score


def oracle_is_ry_match(a, b):
    if a == b:
        return True
    if a in "AGag" and b in "AGag":
        return True
    if a in "CTct" and b in "CTct":
        return True
    if a == "-" or b == "-":
        return True
    return False


def oracle_is_subset(a_seq, a_ids, b_seq, b_ids, allowed):
    """Literal transcription of isSubset (src/assembly.cpp:1063-1097)."""
    if len(a_seq) > len(b_seq):
        return False
    if all(i in b_ids for i in a_ids):
        return True
    thresh = int(kl.SIMILARITY * len(a_seq))
    for i in range(len(b_seq) - len(a_seq) + 1):
        mc, mm = 0, 0
        for j in range(len(a_seq)):
            if oracle_is_ry_match(a_seq[j], b_seq[i + j]):
                mc += 1
            else:
                mm += 1
                if mm > allowed:
                    break
        if mc >= thresh:
            return True
    return False


# --------------------------------------------------------------- tests
def test_overlap_score_vs_oracle():
    rng = np.random.default_rng(7)
    alpha = np.array(list("ACGTRYN-"))
    for _ in range(40):
        la = int(rng.integers(8, 40))
        lb = int(rng.integers(5, 40))
        a = "".join(rng.choice(alpha, la))
        b = "".join(rng.choice(alpha, lb))
        got = kl.overlap_score(a, b, 3, 5.0)
        want = oracle_overlap(a, b, 3, 5.0)
        assert got[0] == want[0], (a, b)
        assert got[1] == pytest.approx(want[1]), (a, b)


def test_overlap_score_suffix_prefix():
    # perfect 10bp suffix/prefix overlap scores 30 (3 per base)
    a = "AAAATTTTCCGGCCGGAA"
    b = "CCGGCCGGAA" + "TTTT"
    olen, score = kl.overlap_score(a, b, 5, 15.0)
    # true suffix/prefix overlap at start=8: olen=min(14,10)=10, all
    # exact matches -> 30; this is the longest placement above score 15
    assert (olen, score) == (10, 30.0)
    assert oracle_overlap(a, b, 5, 15.0) == (olen, score)


def test_is_subset_vs_oracle():
    rng = np.random.default_rng(3)
    alpha = np.array(list("ACGT"))
    for _ in range(30):
        lb = int(rng.integers(20, 60))
        b = "".join(rng.choice(alpha, lb))
        start = int(rng.integers(0, lb - 10))
        a = b[start : start + 10]
        if rng.random() < 0.5:  # inject a mismatch
            pos = int(rng.integers(0, len(a)))
            a = a[:pos] + ("A" if a[pos] != "A" else "C") + a[pos + 1 :]
        for allowed in (0, 2):
            got = kl.is_subset(a, [999], b, [1, 2], allowed)
            want = oracle_is_subset(a, [999], b, [1, 2], allowed)
            assert got == want, (a, b, allowed)
    # node-id containment short-circuit
    assert kl.is_subset("AAAA", [1, 2], "TTTTTTTT", [1, 2, 3], 0)


def test_to_rymer():
    # first and last 5 bases converted; middle untouched
    assert kl.to_rymer("ACGTACGTACGT") == "RYRYRCGYRYRY"
    # reads under 10bp pass through unchanged
    assert kl.to_rymer("ACGTACGT") == "ACGTACGT"


def test_find_match_damage_tolerant():
    # C<->T and G<->A count as matches (basesMatchWithDamage)
    assert kl.find_match("TTGG", "CCGG", True) == 4  # T~C suffix match
    assert kl.find_match("ACGT", "ACAT", False) == 4  # G~A damage match
    assert kl.find_match("ACGT", "ACCT", False) == 2  # G vs C stops
    assert kl.find_match("ACGT", "TGCA", False) == 0


def _mk_contig(seq, node_ids, counts=None, cut=(False, 0)):
    L = len(seq)
    scoring = np.log(np.full((L, 5), 0.2))
    if counts is None:
        counts = np.zeros((L, 5), np.int64)
        for i, c in enumerate(seq):
            if c in kl._B5:
                counts[i, kl._B5[c]] = 1
    return kl.Contig(seq, kl.to_rymer(seq), scoring, counts,
                     list(node_ids), cut)


def test_merge_contigs_transition_majority_normal():
    # overlap base disagrees by a transition; counts 1 vs 3 -> 0.75
    # majority >= 0.65 so normal mode takes the majority base
    c1 = _mk_contig("AAAACCCCCCC", [1, 2])
    c2 = _mk_contig("CCCCCCCTTTT", [2, 3])
    # make c2's first overlap base a transition conflict: c1 tail base
    # at overlap pos0 is C, set c2 pos0 to T with count 3
    c2.seq = "TCCCCCCTTTT"
    c2.counts[0] = 0
    c2.counts[0, kl._B5["T"]] = 3
    merged = kl.merge_contigs(c1, c2, 7, True, "normal")
    # position 4 (= len(c1)-7) resolved to T (3 of 4 >= 0.65)
    assert merged.seq[4] == "T"
    assert len(merged.seq) == len(c1.seq) + len(c2.seq) - 7


def test_merge_contigs_transition_masked_when_ambiguous():
    c1 = _mk_contig("AAAACCCCCCC", [1, 2])
    c2 = _mk_contig("TCCCCCCTTTT", [2, 3])
    # counts 1 vs 1 -> 0.5 < 0.65 -> masked N in normal mode
    merged = kl.merge_contigs(c1, c2, 7, True, "normal")
    assert merged.seq[4] == "N"
    # strict mode also masks (0.5 < 0.9)
    merged_s = kl.merge_contigs(c1, c2, 7, True, "strict")
    assert merged_s.seq[4] == "N"
    # reckless keeps c1's base on ties (only replaces on strict <)
    merged_r = kl.merge_contigs(c1, c2, 7, True, "reckless")
    assert merged_r.seq[4] == "C"


def test_merge_contigs_strict_requires_90():
    c1 = _mk_contig("AAAACCCCCCC", [1, 2])
    c2 = _mk_contig("TCCCCCCTTTT", [2, 3])
    c2.counts[0] = 0
    c2.counts[0, kl._B5["T"]] = 3  # 3 vs 1 = 0.75 < 0.9
    merged = kl.merge_contigs(c1, c2, 7, True, "strict")
    assert merged.seq[4] == "N"
    c2.counts[0, kl._B5["T"]] = 20  # 20/21 > 0.9
    merged = kl.merge_contigs(c1, c2, 7, True, "strict")
    assert merged.seq[4] == "T"


def test_merge_cut_rules():
    # adjustFinalCut (src/assembly.cpp:1009-1034)
    assert kl._merge_cut((False, 0), (True, 2)) == (True, 2)
    assert kl._merge_cut((False, 0), (True, 1)) == (False, 0)
    assert kl._merge_cut((True, 2), (False, 0)) == (False, 0)
    assert kl._merge_cut((True, 3), (False, 0)) == (True, 1)
    assert kl._merge_cut((True, 1), (True, 2)) == (True, 3)
    assert kl._merge_cut((True, 2), (True, 1)) == (False, 0)
    assert kl._merge_cut((True, 1), (True, 1)) == (True, 1)


def test_majority_correct():
    counts = np.zeros((4, 5), np.int64)
    counts[0, kl._B5["A"]] = 2  # agrees
    counts[1, kl._B5["G"]] = 3  # disagrees with C -> corrected
    counts[2] = 0  # all-zero: keep original char
    counts[3, kl._B5["T"]] = 1
    counts[3, kl._B5["C"]] = 1  # tie includes C -> keep
    assert kl._majority_correct("ACNC", counts) == "AGNC"


def test_ry_gate():
    # middle of the overlap must match exactly; ends tolerate RY
    tail = "ACGTACGTACGTACGT"
    head_ok = "GCGTACGTACGTACGC"  # A->G, T->C at RY-tolerant ends...
    # positions 0-4 and 11-15 are RY-checked, 5-10 exact
    assert kl._ry_gate(tail, tail, 16)
    assert kl._ry_gate(tail, head_ok, 16)
    head_bad = tail[:8] + "C" + tail[9:]  # mid mismatch
    assert not kl._ry_gate(tail, head_bad, 16)


def test_assemble_two_overlapping_reads(synthetic_world):
    graph, frags = synthetic_world
    contigs = kl.assemble(graph, frags, len_min=5, score_min=10)
    assert len(contigs) >= 1
    total = sum(len(c.seq) for c in contigs)
    assert total >= 40


@pytest.fixture
def synthetic_world():
    """Tiny linear world: one node, one path, reads tiling it."""
    from vgan_tpu.graph.packed import PackedGraph
    from vgan_tpu.utils import dna
    from vgan_tpu.io.gam import Alignment, Path, Mapping, Position, Edit

    ref = (
        "ACGTTGCAATCGGATCCAATTGGCCAATCGTACGTAGCATCGATCGATTG"
        "GCCATGCATCGTAGCTAGCTAGCATCGATCGGATCGATCGTAGCTAGGAT"
    )
    pool = dna.encode(ref)
    graph = PackedGraph(
        min_id=1,
        node_seq_pool=pool,
        node_off=np.array([0, len(ref)], dtype=np.int64),
        edge_from=np.zeros(0, np.int32),
        edge_from_rev=np.zeros(0, bool),
        edge_to=np.zeros(0, np.int32),
        edge_to_rev=np.zeros(0, bool),
        path_names=["ref"],
        path_steps_node=[np.array([0], np.int32)],
        path_steps_rev=[np.array([False])],
        path_support=np.ones((1, 1), bool),
    )
    frags = []
    for k, start in enumerate(range(0, 60, 15)):
        seq = ref[start : start + 40]
        aln = Alignment(
            name=f"r{k}",
            sequence=seq,
            quality=bytes([30] * len(seq)),
            path=Path(
                mappings=[
                    Mapping(
                        position=Position(node_id=1, offset=start,
                                          is_reverse=False),
                        edits=[Edit(from_length=len(seq),
                                    to_length=len(seq), sequence="")],
                    )
                ]
            ),
            mapping_quality=60,
            identity=1.0,
        )
        frags.append(aln)
    return graph, kl.analyse_gam(graph, frags)


def test_subset_absorption_long_fragment():
    """ADVICE r4: ct_sub absorption of a fragment LONGER than the
    contig buffer capacity (cap starts at max(256, 4*len(f0.seq)))
    must grow the buffer before rebinding the live length — a 390bp
    fragment absorbing a 40bp starting contig used to raise a
    broadcast-shape ValueError inside _ensure. Drives merge_all_paths
    directly: the fragment sort would put the longer read first at
    equal (node, offset), hiding the branch."""
    rng = np.random.default_rng(7)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, size=400))

    def _frag(name, seq):
        L = len(seq)
        probs = np.full((L, 5), 0.01)
        counts = np.zeros((L, 5), np.int64)
        for i, c in enumerate(seq):
            j = "ACGT-".index(c)
            probs[i, j] = 0.96
            counts[i, j] = 1
        return kl.Frag(
            name=name, seq=seq, graph_seq=seq, node_ids=[1],
            offsets=[0], coverage=[1], probs=probs, counts=counts,
            cut=(False, 0), ry=kl.to_rymer(seq),
        )

    fa = _frag("short", ref[:40])   # contig start: cap = 256
    fb = _frag("long", ref[:390])   # absorbed fragment > cap
    g = kl.GraphAss(2)
    g.add_edge(0, 1, 40.0)
    contigs = kl.merge_all_paths(g, {(0, 1): (40, 40.0)}, [fa, fb],
                                 False, 10)
    assert any(c.seq == ref[:390] for c in contigs), (
        [len(c.seq) for c in contigs]
    )


def test_consensus_coverage_mask(synthetic_world):
    graph, frags = synthetic_world
    contigs = kl.assemble(graph, frags, len_min=5, score_min=10)
    fasta, scoring, counts, empty = kl.consensus(
        graph, contigs, min_coverage=1
    )
    # every called (non-N) base must agree with the reference world
    ref = graph.node_seq(1)
    called = sum(1 for c in fasta if c != "N")
    assert called >= 40
    # consensus walk is anchored at the path start; called bases match
    ok = sum(1 for a, b in zip(fasta, ref) if a == b or a == "N")
    assert ok >= 0.9 * min(len(fasta), len(ref))
    # high min_coverage masks everything (each base covered <= 3x)
    fasta_hi, *_ = kl.consensus(graph, contigs, min_coverage=50)
    assert set(fasta_hi) <= {"N"}


def test_analyse_gam_prob_rows(synthetic_world):
    """Rows sum to 1 - q/4: the reference assigns q/4 pre-damage mass
    to the gap slot and drops it in the 4x4 damage marginalization
    (src/assembly.cpp:3928-3957) — quirk preserved."""
    from vgan_tpu.models import phred

    graph, frags = synthetic_world
    assert len(frags) == 4
    q = phred.qscore_vec()[30]
    for f in frags:
        s = f.probs.sum(axis=1)
        np.testing.assert_allclose(s, 1.0 - q / 4, atol=1e-12)
        assert f.counts.sum(axis=1).max() == 1
        assert not f.cut[0]


def test_assemble_damage_mode_rymer_path(synthetic_world):
    """specified_deam=True routes overlap scoring through RYmer
    sequences (find_overlaps/mergeAllPaths use f.ry,
    src/assembly.cpp:677-683, 1217-1218) — C->T damaged read ends
    still assemble."""
    graph, frags = synthetic_world
    # simulate 5' C->T damage on the first 3 bases of each read
    import copy

    damaged = []
    for f in frags:
        f2 = copy.deepcopy(f)
        s = list(f2.seq)
        for i in range(3):
            if s[i] == "C":
                s[i] = "T"
        f2.seq = "".join(s)
        damaged.append(f2)
    contigs = kl.assemble(graph, damaged, len_min=5, score_min=10,
                          specified_deam=True)
    assert len(contigs) >= 1
    total = sum(len(c.seq) for c in contigs)
    assert total >= 40
    # ry strings were populated with the 5+5 conversion
    assert all(set(c.ry[:5]) <= set("RYN-S") for c in contigs if len(c.ry) >= 10)


def test_merge_overlapping_contigs_n_bridge():
    """Two contigs sharing exactly one node merge across it with an
    N-bridge sized by the unmatched node interior
    (tryMergeContigs single-common-node case, src/assembly.cpp:2763-2827)."""
    node_seq = "AAACCCGGGTTTACGTACGT"  # 20bp shared node
    # findMatch aligns full-length windows, so the bridge only fires
    # when the contig ends coincide with the node's prefix/suffix:
    # c1 = node prefix (6bp), c2 = node suffix (6bp) -> 20-12 = 8 Ns.
    # A high score gate (len_min=50) keeps the overlap path from
    # qualifying, which is what routes tryMergeContigs into the
    # single-common-node branch (src/assembly.cpp:2763-2827).
    c1 = _mk_contig(node_seq[:6], [1, 2])
    c2 = _mk_contig(node_seq[-6:], [2, 3])
    c1.ry = kl.to_rymer(c1.seq)
    c2.ry = kl.to_rymer(c2.seq)
    nmap = {2: (node_seq, len(node_seq), 1)}
    out = kl.merge_overlapping_contigs([c1, c2], 1, nmap, "normal", 50.0)
    assert len(out) == 1
    merged = out[0]
    assert merged.seq == node_seq[:6] + "N" * 8 + node_seq[-6:]
    # N rows are flagged empty and zero-count
    i0 = 6
    assert merged.empty[i0 : i0 + 8].all()
    assert (merged.counts[i0 : i0 + 8] == 0).all()
    # node ids concatenate WITHOUT dedup in the N-bridge merge
    # (reference quirk, src/assembly.cpp:3208-3209)
    assert merged.node_ids == [1, 2, 2, 3]


def test_device_overlap_scores_match_host():
    """The device batch scorer returns the exact (length, score) of the
    sequential host scorer for every pair (SURVEY §7.8 kernel)."""
    from vgan_tpu.pipelines.keelime_device import overlap_scores_batch

    rng = np.random.default_rng(13)
    alpha = np.array(list("ACGTRYN-"))
    pairs = []
    for _ in range(60):
        la = int(rng.integers(8, 50))
        lb = int(rng.integers(5, 50))
        pairs.append(
            ("".join(rng.choice(alpha, la)), "".join(rng.choice(alpha, lb)))
        )
    # add true suffix/prefix overlaps
    for _ in range(20):
        core = "".join(rng.choice(np.array(list("ACGT")), 20))
        pairs.append(
            ("".join(rng.choice(alpha, 10)) + core,
             core + "".join(rng.choice(alpha, 10)))
        )
    got = overlap_scores_batch(pairs, 3, 5.0, chunk=32)
    for (a, b), (gl, gs) in zip(pairs, got):
        wl, ws = kl.overlap_score(a, b, 3, 5.0)
        assert (gl, gs) == (wl, ws), (a, b)


def test_find_overlaps_device_path(synthetic_world, monkeypatch):
    """find_overlaps through the device-batch fallback (native batch
    scorer disabled) yields the same DAG as the native path."""
    from vgan_tpu.pipelines import keelime as klmod

    graph, frags = synthetic_world
    depths = kl.node_depths(graph, 1, 1)
    frags = kl.sort_frags(frags, depths)
    for f in frags:
        f.ry = kl.to_rymer(f.seq)
    density, _ = kl.initial_overlap(frags, depths)
    g_host, om_host = kl.find_overlaps(frags, 5, 10, density, False, 5)
    monkeypatch.setattr(
        klmod, "overlap_best_batch_native", lambda *a, **k: None
    )
    g_dev, om_dev = kl.find_overlaps(frags, 5, 10, density, False, 5)
    assert om_host == om_dev
    assert [dict(d) for d in g_host.adj] == [dict(d) for d in g_dev.adj]


def test_analyse_gam_table_matches_loop(ref):
    """Columnar analyse_gam_table == per-read/per-base loop on a
    mixed-strand mapper batch incl. damage: same Frag fields, probs
    within 1e-12, counts/cut exact (the 5-state probability math is
    identical, only vectorized)."""
    import numpy as np
    import pytest

    from vgan_tpu.graph.synth import build_haplotype_graph, sample_reads
    from vgan_tpu.io.fastx import read_fasta
    from vgan_tpu.mapper import batch_map
    from vgan_tpu.mapper.giraffe import BatchedMapper
    from vgan_tpu.models.damage import DamageModel
    from vgan_tpu.pipelines import keelime

    if batch_map.load_native() is None:
        pytest.skip("native lib unavailable")
    seqs, _ = read_fasta(str(ref / "test/input_files/rCRS.fa"))
    graph, _ = build_haplotype_graph(
        seqs[0][:5000], n_haplotypes=4, n_variants=40, seed=5
    )
    mapper = BatchedMapper(graph, k=20, w=10)
    reads = sample_reads(graph, 1, n_reads=150, seed=2)
    table = mapper.map_reads_table(reads)
    alignments = table.to_alignments()
    dfiles = ref / "share/vgan/damageProfiles"
    dm = (
        DamageModel.from_profiles(str(dfiles / "dhigh5p.prof"),
                                  str(dfiles / "dhigh3p.prof"))
        if (dfiles / "dhigh5p.prof").exists()
        else DamageModel.none()
    )
    want = keelime.analyse_gam(graph, alignments, damage=dm)
    got = keelime.analyse_gam_table(graph, table, damage=dm)
    assert len(got) == len(want)
    for w, g in zip(want, got):
        assert g.name == w.name
        assert g.seq == w.seq
        assert g.graph_seq == w.graph_seq
        assert g.node_ids == w.node_ids
        assert g.offsets == w.offsets
        assert g.coverage == w.coverage
        assert g.cut == w.cut
        np.testing.assert_array_equal(g.counts, w.counts)
        np.testing.assert_allclose(g.probs, w.probs, rtol=1e-12,
                                   atol=1e-18)


def test_native_window_scan_differential():
    """cpp/matchwin.cpp early-exit scan == the numpy sliding-matrix
    oracle (_match_count_windows thresholding) over random + planted
    near-copy cases across the full RY alphabet."""
    import numpy as np
    import pytest

    from vgan_tpu.mapper import batch_map
    from vgan_tpu.pipelines import keelime as kl

    if batch_map.load_native() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    chars = np.frombuffer(b"ACGTRYNS-", dtype=np.uint8)
    for trial in range(200):
        nh = int(rng.integers(30, 400))
        la = int(rng.integers(5, min(nh, 120)))
        hay = chars[rng.integers(0, len(chars), nh)]
        needle = chars[rng.integers(0, len(chars), la)]
        if trial % 3 == 0:
            s = int(rng.integers(0, nh - la + 1))
            hay[s : s + la] = needle
            if la > 4:
                hay[s + int(rng.integers(0, la))] = chars[
                    int(rng.integers(0, 4))
                ]
        allowed = int(rng.integers(0, 3))
        thresh = int(0.98 * la)
        mc = kl._match_count_windows(hay, needle, allowed)
        hits = np.flatnonzero(mc >= thresh)
        want = int(hits[0]) if len(hits) else -1
        got = kl._window_first_hit(hay, needle, allowed, thresh)
        assert got == want, (trial, got, want)


def test_native_overlap_best_matches_numpy_oracle():
    """cpp/overlapbest.cpp == the numpy sliding-window overlap_score
    on random adversarial strings (scores are multiples of 0.5, so the
    int accumulation must be bit-identical)."""
    import random

    from vgan_tpu.pipelines.keelime import (
        _overlap_best_native,
        _overlap_score_numpy,
        overlap_best_batch_native,
    )

    rng = random.Random(7)
    alph = "ACGTRYNS-acgtry"
    pairs = []
    for _ in range(500):
        a = "".join(rng.choice(alph) for _ in range(rng.randint(0, 50)))
        b = "".join(rng.choice(alph) for _ in range(rng.randint(0, 40)))
        mo = rng.randint(0, 10)
        ms = rng.uniform(-5.0, 20.0)
        want = _overlap_score_numpy(a, b, mo, ms)
        got = _overlap_best_native(a, b, mo, ms)
        assert got is not None, "native lib must be present in CI env"
        assert got == want, (a, b, mo, ms)
        pairs.append((a, b))
    # batched entry point agrees with per-pair calls
    batch = overlap_best_batch_native(pairs, 5, 3.0)
    for (a, b), r in zip(pairs, batch):
        assert r == _overlap_score_numpy(a, b, 5, 3.0)
