"""Multi-host skeleton test (VERDICT r1 #4): two separate processes
join via jax.distributed (loopback coordinator), shard the fixture
alignments by rank, and the cross-process psum of the haplocart
accumulator reproduces the single-process final_vec. Host 0 writes the
output file."""
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from vgan_tpu import cli
from vgan_tpu.pipelines.haplocart_runner import (
    HaplocartConfig,
    load_db,
    run_sample,
)

HERE = pathlib.Path(__file__).parent


def test_two_process_psum_matches_single(ref, tmp_path):
    d = tmp_path / "db"
    assert cli.main([
        "build-db", str(ref / "test/reconstructInputSeq/target_graph.gfa"),
        str(d),
    ]) == 0
    gam = str(ref / "test/reconstructInputSeq/test_reads.gam")

    # single-process reference result through the production runner
    db = load_db(str(d))
    _pred, _n, want = run_sample(
        HaplocartConfig(db_dir=str(d), gamfile=gam), db, None, "s"
    )

    out = tmp_path / "vec.npy"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 device per process
    env["PYTHONPATH"] = str(HERE.parent)
    port = "29883"
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "mh_worker.py"), str(i), "2",
             port, str(d), gam, str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=180)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    assert out.exists(), "host0 did not write output"
    got = np.load(out)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def _run_pair(cmd_args, port, tmp_path, timeout=300):
    """Launch the CLI twice (procid 0/1) joined via loopback; returns
    logs, asserts both exit 0."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(HERE.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "vgan_tpu.cli"] + cmd_args
            + ["--coordinator", f"127.0.0.1:{port}", "--nproc", "2",
               "--procid", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    return logs


def _run_single(cmd_args, tmp_path, timeout=300):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(HERE.parent)
    p = subprocess.run(
        [sys.executable, "-m", "vgan_tpu.cli"] + cmd_args,
        env=env, capture_output=True, timeout=timeout, cwd=str(tmp_path),
    )
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]


def test_haplocart_fastq_two_process(ref, tmp_path):
    """FASTQ-modality multihost (VERDICT r2 weak #5): two processes
    each map THEIR OWN read shard with a per-process mapper, psum the
    accumulators, and host 0's outputs equal the single-process run."""
    from vgan_tpu import cli

    d = tmp_path / "db"
    assert cli.main([
        "build-db", str(ref / "test/reconstructInputSeq/target_graph.gfa"),
        str(d),
    ]) == 0
    fq = str(ref / "test/reconstructInputSeq/test_reads.fq")
    # duplicate the fixture reads so both ranks hold mapped reads
    lines = open(fq).read()
    big = tmp_path / "reads.fq"
    big.write_text(lines * 6)
    base = ["haplocart", "--db", str(d), "-fq1", str(big)]
    _run_single(base + ["-o", "single.tsv", "-pf", "single_post.tsv"],
                tmp_path)
    _run_pair(base + ["-o", "multi.tsv", "-pf", "multi_post.tsv"],
              29891, tmp_path)
    assert (tmp_path / "multi.tsv").exists()
    s = (tmp_path / "single.tsv").read_text().replace("single", "X")
    m = (tmp_path / "multi.tsv").read_text().replace("multi", "X")
    # sample column embeds the fastq path (identical); prediction +
    # read count must match exactly
    assert s.split("\t")[1:] == m.split("\t")[1:]
    sp = (tmp_path / "single_post.tsv").read_text()
    mp = (tmp_path / "multi_post.tsv").read_text()
    assert sp == mp


def test_euka_two_process_matches_single(ref, tmp_path):
    """euka multihost: rank-sharded reads, psum'd clade counters / bin
    coverage / baseshift, re-run detection — all four TSVs equal the
    single-process run (VERDICT r2 #3)."""
    from vgan_tpu import cli

    d = tmp_path / "edb"
    d.mkdir()
    assert cli.main([
        "build-db", str(ref / "test/reconstructInputSeq/target_graph.gfa"),
        str(d),
    ]) == 0
    os.rename(d / "graph.npz", d / "toy_db.npz")
    (d / "toy_db.clade").write_text("0 ToyTaxon 0.03 5 1 28\n")
    bins = "ToyTaxon " + " ".join(
        f"{lo}.0 {hi}.0 1.5"
        for lo, hi in ((1, 7), (8, 14), (15, 21), (22, 28))
    )
    (d / "toy_db.bins").write_text(bins + "\n")
    fq = str(ref / "test/reconstructInputSeq/test_reads.fq")
    big = tmp_path / "reads.fq"
    big.write_text(open(fq).read() * 6)
    base = [
        "euka", "--euka_dir", str(d), "--dbprefix", "toy_db",
        "-fq1", str(big), "--minMQ", "0", "--minFrag", "2",
        "--minBins", "1",
    ]
    _run_single(base + ["-o", "eu_single"], tmp_path)
    _run_pair(base + ["-o", "eu_multi"], 29892, tmp_path)
    for suffix in ("_abundance.tsv", "_detected.tsv", "_coverage.tsv",
                   "_inSize.tsv"):
        s = (tmp_path / f"eu_single{suffix}").read_text()
        m = (tmp_path / f"eu_multi{suffix}").read_text()
        assert s == m, suffix


def test_soibean_two_process_matches_single(ref, tmp_path):
    """soibean multihost: chains distribute round-robin across
    processes with the shared seeds, summaries allgather, host 0's
    diagnostics/estimates equal the single-process run (VERDICT r2 #3)."""
    import numpy as np

    from vgan_tpu.graph.synth import build_haplotype_graph, sample_reads
    from vgan_tpu.io import fastx

    seqs, _ = fastx.read_fasta(str(ref / "test/input_files/rCRS.fa"))
    names = ["speciesA", "speciesB", "speciesC", "speciesD"]
    graph, _ = build_haplotype_graph(
        seqs[0][:3000], n_haplotypes=4, n_variants=30, seed=11,
        hap_names=names,
    )
    for proxy in ["speciesA", "speciesC", "speciesA"]:
        j = graph.path_names.index(proxy)
        graph.path_steps_node.append(graph.path_steps_node[j])
        graph.path_steps_rev.append(graph.path_steps_rev[j])
    graph.path_names.extend(["N1", "N2", "N3"])
    support = np.zeros((graph.n_nodes, len(graph.path_names)), dtype=bool)
    for j, sn in enumerate(graph.path_steps_node):
        support[sn, j] = True
    graph.path_support = support
    sbdir = tmp_path / "sbdir"
    (sbdir / "tree_dir").mkdir(parents=True)
    graph.save(str(sbdir / "mydb.npz"))
    (sbdir / "tree_dir" / "mydb.new.dnd").write_text(
        "((speciesA:0.2,speciesB:0.25)N1:0.3,"
        "(speciesC:0.22,speciesD:0.18)N2:0.28)N3;"
    )
    (sbdir / "soibean_db.baseFreq").write_text("mydb 0.25 0.25 0.25 0.25\n")
    reads = sample_reads(graph, 1, n_reads=60, seed=1)
    fq = tmp_path / "sb.fq"
    with open(fq, "w") as f:
        for r in reads:
            q = bytes(x + 33 for x in r.qual).decode()
            f.write(f"@{r.name}\n{r.seq}\n+\n{q}\n")
    base = [
        "soibean", "--sbdir", str(sbdir), "--dbprefix", "mydb",
        "-fq1", str(fq), "--iter", "1500", "--burnin", "300",
        "--chains", "4", "-k", "1",
    ]
    _run_single(base + ["-o", str(tmp_path / "sb_s")], tmp_path,
                timeout=600)
    _run_pair(base + ["-o", str(tmp_path / "sb_m")], 29893, tmp_path,
              timeout=600)
    for suffix in ("ProportionEstimates1.txt", "BranchEstimate1.txt",
                   "Diagnostics10.txt"):
        s = (tmp_path / f"sb_s{suffix}").read_text()
        m = (tmp_path / f"sb_m{suffix}").read_text()
        assert s == m, suffix


def test_keelime_two_process_matches_single(ref, tmp_path):
    """keelime multihost: rank-sharded mapping + per-read analysis,
    frags allgather in read order, host 0 assembles — all four output
    files byte-equal the single-process run."""
    from vgan_tpu import cli

    d = tmp_path / "db"
    assert cli.main([
        "build-db", str(ref / "test/reconstructInputSeq/target_graph.gfa"),
        str(d),
    ]) == 0
    fq = str(ref / "test/reconstructInputSeq/test_reads.fq")
    big = tmp_path / "reads.fq"
    big.write_text(open(fq).read() * 4)
    base = [
        "keelime", "--dbdir", str(d), "--dbprefix", "graph.npz",
        "-fq1", str(big),
    ]
    _run_single(base + ["-o", "kl_s_"], tmp_path)
    _run_pair(base + ["-o", "kl_m_"], 29894, tmp_path)
    import gzip

    for suffix in ("Consensus.fa.gz", "Contig.fa.gz"):
        s = gzip.open(tmp_path / f"kl_s_{suffix}").read()
        m = gzip.open(tmp_path / f"kl_m_{suffix}").read()
        assert s == m, suffix
    for suffix in ("ProbabilityMatrix.tsv", "CountMatrix.tsv"):
        s = (tmp_path / f"kl_s_{suffix}").read_text()
        m = (tmp_path / f"kl_m_{suffix}").read_text()
        assert s == m, suffix
