"""Golden-string tests for alignment reconstruction, mirroring the
reference's `reconstruction` Boost suite (`src/test.cpp:851-998`)
case-for-case against the same fixtures."""
import pytest

from vgan_tpu.graph.reconstruct import reconstruct_graph_sequence

GOLDENS = [
    # (read index, expected graph_seq, expected read_seq)
    (0, "CCCCATTTATACCGTGAGTAGGGTCGACCAAGAAC", "CCCCATTTATACCGTGAGTAGGGTCGACCAAGAAC"),
    (1, "CCCCATTTATACCGTGAGTAGGGTCGACCAAGAAC", "CCCCATTTATACCGTGAGTAGGGTCCACCAAGAAC"),
    (2, "CCCCATTTATA---CCGTGAGTAGGGTCGACCAAGAAC", "CCCCATTTATACCCCCGTGAGTAGGGTCGACCAAGAAC"),
    (
        3,
        "TGGGTGGAGCGCGCCCCATTTATACCGTGAGTAGGGTCGACCAAGAACCGCAAGA",
        "TGGGTGGAGCGCGCCCCAT--------TGAGTAGGGTCGACCAAGAACCGCAAGA",
    ),
    (
        4,
        "SSSSSSSSSSSSSSSSSSSSSSSSCGGATATAAACGCCAGGTTGAATCCGCATTT",
        "CGGCTGTCAGCTGCCGTCTGCGTACGGATATAAACGCCAGGTTGAATCCGCATTT",
    ),
    (
        5,
        "TCTTGCGGTTCTTGGTCGACCCTACTCACGGTATAAATGGGGCGCGCTCCAT",
        "TCTTGCGGTTCTTGGTCGACCCTACTCACGGTATAAATGGGGCGCGCTCCAT",
    ),
    (
        6,
        "TCTTGCGGTTCTTGGTCGACCCTACTCACGGTATAAATGGGGCGCGCTCCAT",
        "TCTTGCGGTTCTTGGTCGACCCTACTCACGGTATAAATGGCGCGCGCTCCAT",
    ),
    (
        7,
        "TCTTGCGGTTCTTGGTC------------GACCCTACTCACGGTATAAATGGGGCGCGCTCCAT",
        "TCTTGCGGTTCTTGGTCCAGTCAGTCAGTGACCCTACTCACGGTATAAATGGGGCGCGCTCCAT",
    ),
    (
        8,
        "TCTTGCGGTTCTTGGTCGACCCTACTCACGGTATAAATGGGGCGCGCTCCAT",
        "TCTTGCGGTTCTTGGTCGACCCTA---------TAAATGGGGCGCGCTCCAT",
    ),
    (
        9,
        "SSSSSSSSSSSSSSSSSSSSSSSSSSCACCGTAATCCATGCTTGATTGAGACCGCC",
        "CTAGCTGCAGTCGCGCTCGTCATGCACACCGTAATCCATGCTTGATTGAGACCGCC",
    ),
]


@pytest.mark.parametrize("idx,exp_graph,exp_read", GOLDENS)
def test_reconstruction_goldens(toy_graph, toy_reads, idx, exp_graph, exp_read):
    a = toy_reads[idx]
    graph_seq, read_seq, mppg_sizes = reconstruct_graph_sequence(
        toy_graph, a.path, a.sequence
    )
    assert graph_seq == exp_graph
    assert read_seq == exp_read
    assert sum(mppg_sizes) == len(graph_seq)
