"""Alignment reconstruction: expand a GAM path + edits into aligned
graph/read strings.

Faithful reimplementation of `reconstruct_graph_sequence`
(`src/vgan_utils.h:6-79`), the shared keystone of every vgan pipeline,
validated against the 10 golden string pairs in `src/test.cpp:851-998`.

Semantics (including reference quirks, preserved deliberately):

* graph side: match/sub edits copy the oriented node substring;
  insertions-in-read become ``-`` runs — except a softclip, which
  becomes an ``S`` run; deletions-in-read copy the node substring.
* read side starts as vg's ``path_string`` (the edit-projected read
  sequence along the path: matches copy node bases, subs/insertions copy
  ``edit.sequence``) and gets ``-`` runs spliced in at deletions.
* QUIRK: the softclip test (`vgan_utils.h:38-39`) checks
  ``edit_counter == 0`` for the first-mapping case but ``edit_counter``
  is never incremented in the reference loop, and the last-mapping case
  requires ``edit_counter == ed.size()`` which can then never hold.
  Net effect: only an insertion at the very start of mapping 0 (while
  the running offset is still 0) is annotated ``S``; end softclips
  remain ``-``. We reproduce exactly that.
* QUIRK: ``mppg_sizes`` gets one entry per *edit*, not per mapping
  (`vgan_utils.h:72` sits inside the edit loop), so its length exceeds
  the mapping count for multi-edit mappings. Downstream code indexes it
  by mapping (`src/update_likelihood.cpp:36`, `src/getLCAfromGAM.h:144`)
  — that misalignment is part of the behavioral contract.
"""
from __future__ import annotations

from typing import List, Tuple

from ..io.gam import Path
from .packed import PackedGraph


def path_string(graph: PackedGraph, path: Path) -> str:
    """vg::algorithms::path_string — the read sequence as described by
    the path's edits (used at `src/vgan_utils.h:18`)."""
    parts: List[str] = []
    for mppg in path.mappings:
        node_seq = graph.node_seq(mppg.position.node_id, mppg.position.is_reverse)
        offset = mppg.position.offset
        for edit in mppg.edits:
            if edit.is_match:
                parts.append(node_seq[offset : offset + edit.from_length])
            else:
                parts.append(edit.sequence)
            offset += edit.from_length
    return "".join(parts)


def reconstruct_graph_sequence(
    graph: PackedGraph, path: Path, read_seq: str
) -> Tuple[str, str, List[int]]:
    """Returns (graph_seq, read_seq_aligned, mppg_sizes) exactly as
    `src/vgan_utils.h:6-79` does."""
    graph_parts: List[str] = []
    mppg_sizes: List[int] = []
    ps = path_string(graph, path)  # mutated below exactly like the C++
    f = 0  # running from-length; '-' runs are spliced into ps at f

    mappings = path.mappings
    for mppg_counter, mppg in enumerate(mappings):
        node_seq = graph.node_seq(mppg.position.node_id, mppg.position.is_reverse)
        offset = mppg.position.offset
        edit_counter = 0  # frozen at 0, as in the reference (see module doc)
        for edit in mppg.edits:
            to_length = edit.to_length
            from_length = edit.from_length
            softclip = (
                mppg_counter == 0
                and offset == 0
                and edit_counter == 0
                and from_length == 0
                and to_length > 0
                and edit.is_insertion
            )
            if edit.is_match or edit.is_sub:
                seg = node_seq[offset : offset + from_length]
                graph_parts.append(seg)
                aligned_length = len(seg)
            elif edit.is_insertion:
                graph_parts.append(("S" if softclip else "-") * to_length)
                aligned_length = to_length
            elif edit.is_deletion:
                seg = node_seq[offset : offset + from_length]
                graph_parts.append(seg)
                aligned_length = len(seg)
                ps = ps[:f] + "-" * from_length + ps[f:]  # ps.insert(f, ...)
            else:  # zero-length edit
                aligned_length = 0
            offset += from_length
            f += from_length
            mppg_sizes.append(aligned_length)

    return "".join(graph_parts), ps, mppg_sizes
