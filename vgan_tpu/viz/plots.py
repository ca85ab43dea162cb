"""Output visualization (matplotlib twins of share/vgan/plottingScripts).

The reference ships R/ggplot + ete3 helpers that render euka/soibean
outputs; this module reproduces their plot content with matplotlib
(Agg), which is what this image provides (R, ete3, and network
taxonomy/GenBank lookups are unavailable):

  plot_taxon          plot_taxon.R — per-detected-taxon figure:
                      5'/3' substitution-rate panels (C->T and G->A
                      highlighted over the grey others), fragment
                      length histogram (binwidth 3), per-bin coverage
                      bars, fragment-count title.
  visualize_detected  visualize_detected_taxa.sh — plot_taxon for
                      every detected taxon of a euka run.
  plot_trace          soibeanPlotTrace.R — per-source log-likelihood /
                      proportion / branch-position traces with the
                      burn-in marked.
  plot_k              soibeanPlotk.R — max log-likelihood per k, one
                      line per chain, from <prefix>Result<k><chain>.mcmc.
  tree_from_output    make_tree_from_output.py — detection-annotated
                      ascii tree; the NCBI topology lookup is replaced
                      by a flat per-taxon annotation (ete3's taxonomy
                      database cannot be downloaded here).

Colors: Okabe-Ito colorblind-safe hues, fixed assignment; series are
legend- and label-identified, never color-alone. One y-axis per panel.
"""
from __future__ import annotations

import gzip
import os
import re
import sys
from typing import List, Optional

import numpy as np

# Okabe-Ito (colorblind-safe), fixed order
C_BLUE = "#0072B2"
C_VERMILLION = "#D55E00"
C_GREEN = "#009E73"
C_PURPLE = "#CC79A7"
C_GREY = "#B0B0B0"
_CHAIN_COLORS = [C_BLUE, C_VERMILLION, C_GREEN, C_PURPLE]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _read_prof(path: str):
    """<out>_<taxon>.prof -> (rates5 [ltp,12], rates3 [ltp,12],
    pos5, pos3, header columns)."""
    rows5, rows3, pos5, pos3 = [], [], [], []
    cols: List[str] = []
    section = 0
    with open(path) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if t[0] == "A>C":  # header (appears twice)
                cols = t[:-1]
                section += 1
                continue
            vals = [float(x) for x in t[:-1]]
            if section <= 1:
                rows5.append(vals)
                pos5.append(t[-1])
            else:
                rows3.append(vals)
                pos3.append(t[-1])
    return (np.array(rows5), np.array(rows3), pos5, pos3, cols)


def _rates_panel(ax, rates, pos, cols, end_label, y_right=False):
    for j, name in enumerate(cols):
        if name in ("C>T", "G>A"):
            continue
        ax.plot(range(len(pos)), rates[:, j], color=C_GREY, lw=1,
                alpha=0.6)
    for name, color in (("C>T", C_VERMILLION), ("G>A", C_BLUE)):
        j = cols.index(name)
        ax.plot(range(len(pos)), rates[:, j], color=color, lw=2,
                label=name.replace(">", "->"))
    ax.set_ylim(0, 1)
    ax.set_xticks(range(len(pos)))
    ax.set_xticklabels(pos)
    ax.set_xlabel(f"Positions from the {end_label} end")
    ax.set_ylabel("Substitution rates")
    if y_right:
        ax.yaxis.tick_right()
        ax.yaxis.set_label_position("right")
    ax.legend(loc="upper center", frameon=False, ncol=2)


def plot_taxon(prefix: str, taxon: str, out: Optional[str] = None) -> str:
    """plot_taxon.R equivalent; writes <prefix>_<taxon>.png."""
    plt = _plt()
    rates5, rates3, pos5, pos3, cols = _read_prof(
        f"{prefix}_{taxon}.prof"
    )

    sizes: List[int] = []
    with open(f"{prefix}_inSize.tsv") as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if t and t[0].strip() == taxon:
                sizes = [int(float(x)) for x in t[1:] if x]
                break

    coverage: List[float] = []
    if os.path.exists(f"{prefix}_coverage.tsv"):
        with open(f"{prefix}_coverage.tsv") as f:
            for line in f:
                t = line.rstrip("\n").split("\t")
                if t and t[0].strip() == taxon:
                    coverage = [float(x) for x in t[1::2] if x]
                    break

    n_frags = ""
    if os.path.exists(f"{prefix}_abundance.tsv"):
        with open(f"{prefix}_abundance.tsv") as f:
            for line in f:
                t = line.rstrip("\n").split("\t")
                if t and t[0] == taxon and len(t) > 2:
                    n_frags = t[2]
                    break

    fig, axes = plt.subplots(2, 2, figsize=(11, 9))
    _rates_panel(axes[0, 0], rates5, pos5, cols, "5'")
    _rates_panel(axes[0, 1], rates3, pos3, cols, "3'", y_right=True)

    ax = axes[1, 0]
    if sizes:
        lo, hi = min(sizes), max(sizes)
        bins = np.arange(lo, hi + 4, 3)  # binwidth 3 like the R script
        ax.hist(sizes, bins=bins, color=C_BLUE)
    ax.set_xlabel("Fragment Lengths")
    ax.set_title("Fragment Length Distribution")

    ax = axes[1, 1]
    if coverage:
        ax.bar(range(len(coverage)), coverage, color=C_VERMILLION)
        ax.set_xticks(range(len(coverage)))
        ax.set_xticklabels(
            [f"bin{b}" for b in range(len(coverage))], rotation=90,
            fontsize=7,
        )
    ax.set_xlabel("Bins")
    ax.set_ylabel("Count")
    ax.set_title("Coverage across the pan-genome graph")

    fig.suptitle(
        f"Total number of fragments for taxon {taxon}: {n_frags}"
    )
    fig.tight_layout()
    out = out or f"{prefix}_{taxon}.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def visualize_detected(prefix: str) -> List[str]:
    """visualize_detected_taxa.sh equivalent: plot every detected
    taxon of a euka run."""
    outs = []
    with open(f"{prefix}_detected.tsv") as f:
        next(f, None)
        for line in f:
            t = line.split("\t")
            if t:
                outs.append(plot_taxon(prefix, t[0].strip()))
    return outs


def _read_trace(path: str):
    """Result/Trace .mcmc (gzip or plain tsv) -> (names [it, k],
    loglike [it], theta [it, k], pos [it, k])."""
    op = gzip.open if path.endswith(".gz") or path.endswith(".mcmc") else open
    try:
        with op(path, "rt") as f:
            lines = f.read().splitlines()
    except (OSError, gzip.BadGzipFile):
        with open(path) as f:
            lines = f.read().splitlines()
    header = lines[0].rstrip("\t").split("\t")
    fields_per_source = 4 if "Move" not in header else 5
    k = max(len(header) // fields_per_source, 1)
    names, ll, theta, pos = [], [], [], []
    for line in lines[1:]:
        t = line.rstrip("\n").split("\t")
        if len(t) < 4:
            continue
        names.append([t[s * fields_per_source] for s in range(k)])
        ll.append(float(t[1]))
        theta.append(
            [float(t[s * fields_per_source + 2]) for s in range(k)]
        )
        pos.append(
            [float(t[s * fields_per_source + 3]) for s in range(k)]
        )
    return names, np.array(ll), np.array(theta), np.array(pos)


def plot_trace(trace_file: str, burnin: int = 0,
               out: Optional[str] = None) -> str:
    """soibeanPlotTrace.R equivalent; writes <trace_file>.png."""
    plt = _plt()
    _names, ll, theta, pos = _read_trace(trace_file)
    k = theta.shape[1] if theta.ndim == 2 else 1
    fig, axes = plt.subplots(3, 1, figsize=(10, 9), sharex=True)
    it = np.arange(len(ll))
    axes[0].plot(it, ll, color=C_BLUE, lw=1)
    axes[0].set_ylabel("Log-likelihood")
    for s in range(k):
        c = _CHAIN_COLORS[s % len(_CHAIN_COLORS)]
        axes[1].plot(it, theta[:, s], color=c, lw=1,
                     label=f"source {s + 1}")
        axes[2].plot(it, pos[:, s], color=c, lw=1,
                     label=f"source {s + 1}")
    axes[1].set_ylabel("Proportion")
    axes[2].set_ylabel("Branch position")
    axes[2].set_xlabel("Iteration")
    if k > 1:
        axes[1].legend(frameon=False, ncol=min(k, 4))
    if burnin:
        for ax in axes:
            ax.axvline(burnin, color=C_GREY, ls="--", lw=1)
        axes[0].annotate("burn-in", (burnin, ll.max()),
                         color="#555555", fontsize=8)
    fig.tight_layout()
    out = out or trace_file + ".png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_k(prefix: str, out: Optional[str] = None) -> str:
    """soibeanPlotk.R equivalent: max log-likelihood per k, one line
    per chain; writes <prefix>kCurve.png."""
    plt = _plt()
    pat = re.compile(
        re.escape(os.path.basename(prefix)) + r"Result(\d+)(\d)\.mcmc$"
    )
    d = os.path.dirname(prefix) or "."
    rows = []  # (k, chain, maxll)
    for fn in sorted(os.listdir(d)):
        m = pat.match(fn)
        if not m:
            continue
        _names, ll, _t, _p = _read_trace(os.path.join(d, fn))
        if len(ll):
            rows.append((int(m.group(1)), int(m.group(2)),
                         float(np.max(ll))))
    if not rows:
        raise FileNotFoundError(f"no {prefix}Result*.mcmc files")
    fig, ax = plt.subplots(figsize=(7, 5))
    chains = sorted({c for _k, c, _v in rows})
    for ci, chain in enumerate(chains):
        pts = sorted((k, v) for k, c, v in rows if c == chain)
        ax.plot(
            [p[0] for p in pts], [p[1] for p in pts],
            color=_CHAIN_COLORS[ci % len(_CHAIN_COLORS)], lw=2,
            marker="o", label=f"Chain {chain}",
        )
    ax.set_xlabel("k")
    ax.set_ylabel("Max Log-Likelihood")
    ax.set_title("Log-likelihood for each k and sequence")
    ax.set_xticks(sorted({k for k, _c, _v in rows}))
    ax.legend(frameon=False)
    fig.tight_layout()
    out = out or f"{prefix}kCurve.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def tree_from_output(abundance_tsv: str, out=None) -> str:
    """make_tree_from_output.py equivalent, offline: per-taxon
    detection annotation (the ete3 NCBI topology needs a downloaded
    taxonomy database; unavailable here, so the flat annotated list
    replaces the ascii tree — same information content)."""
    out = out or sys.stdout
    lines = []
    with open(abundance_tsv) as f:
        next(f, None)
        for line in f:
            t = line.rstrip("\n").split("\t")
            if not t or not t[0]:
                continue
            if t[1] == "yes":
                lines.append(
                    f"{t[0]} - detected - " + " - ".join(t[2:6])
                )
            else:
                lines.append(f"{t[0]} - not detected")
    for x in lines:
        out.write(x + "\n")
    return "\n".join(lines)


def _tree_layout(tree):
    """ggtree-style rectangular layout: leaves evenly spaced on y (in
    tip order), internal y = mean of children, x = cumulative branch
    length from the root. Returns (x [n], y [n])."""
    n = tree.n_nodes
    x = np.zeros(n)
    y = np.zeros(n)
    order = []  # post-order

    def walk(i, depth):
        x[i] = depth
        kids = [int(c) for c in tree.children[i][: tree.n_children[i]]]
        for c in kids:
            walk(c, depth + float(tree.dist[c]))
        order.append(i)

    walk(tree.root, 0.0)
    next_leaf = [0]
    for i in order:
        if tree.is_leaf(i):
            y[i] = next_leaf[0]
            next_leaf[0] += 1
    for i in order:
        if not tree.is_leaf(i):
            kids = tree.children[i][: tree.n_children[i]]
            y[i] = float(np.mean([y[int(c)] for c in kids]))
    return x, y


def plot_tree_posterior(trace_file: str, tree_file: str,
                        out: Optional[str] = None) -> str:
    """Offline twin of soibeanPlots.R's combo tree figure
    (`share/vgan/plottingScripts/soibeanPlots.R:54-230`): posterior
    samples from a Result<k><chain>.mcmc trace drawn on the Newick
    tree — each sample lands on its source's branch at
    x = parent_x + branch_position * branch_len, nudged vertically by
    its log-likelihood relative to the trace median (the R script's
    +/-0.2 jitter), colored by log-likelihood and sized by log1p of
    the (position, source) sample frequency. The R original resolves
    tip accessions to scientific names via GenBank (rentrez) — a
    network call replaced here by the raw tip labels (no egress).
    Writes <trace_file>.tree.png."""
    from ..utils.newick import read_newick

    plt = _plt()
    tree = read_newick(tree_file)
    idx = tree.name_to_index()
    x, y = _tree_layout(tree)
    names, ll, theta, pos = _read_trace(trace_file)
    k = theta.shape[1] if theta.ndim == 2 else 1

    fig, ax = plt.subplots(
        figsize=(10, max(4, 0.4 * tree.n_leaves + 2))
    )
    # tree edges (rectangular): vertical connector + horizontal branch
    for i in range(tree.n_nodes):
        p = int(tree.parent[i])
        if p < 0:
            continue
        ax.plot([x[p], x[p]], [y[p], y[i]], color=C_GREY, lw=1, zorder=1)
        ax.plot([x[p], x[i]], [y[i], y[i]], color=C_GREY, lw=1, zorder=1)
    for i in range(tree.n_nodes):
        if tree.is_leaf(i):
            ax.annotate(tree.names[i], (x[i], y[i]),
                        xytext=(4, 0), textcoords="offset points",
                        va="center", fontsize=8)
        elif tree.names[i]:
            ax.annotate(tree.names[i], (x[i], y[i]),
                        xytext=(2, 3), textcoords="offset points",
                        fontsize=6, color="#666666")

    # posterior sample points per source
    med = float(np.median(ll)) if len(ll) else 0.0
    max_diff = float(np.max(np.abs(ll - med))) if len(ll) else 1.0
    max_diff = max_diff or 1.0
    pts_x, pts_y, pts_ll = [], [], []
    freq: dict = {}
    for it in range(len(ll)):
        for s in range(k):
            nm = names[it][s]
            if nm not in idx:
                continue
            i = idx[nm]
            p = int(tree.parent[i])
            x0 = x[p] if p >= 0 else 0.0
            px = x0 + float(pos[it, s]) * (x[i] - x0)
            jitter = (abs(ll[it] - med) / max_diff) * 0.2
            py = y[i] - jitter if ll[it] < med else y[i] + jitter
            key = (s, round(float(pos[it, s]), 10), nm)
            freq[key] = freq.get(key, 0) + 1
            pts_x.append(px)
            pts_y.append(py)
            pts_ll.append((ll[it], key))
    if pts_x:
        sizes = np.array(
            [10 + 20 * np.log1p(freq[key]) for _l, key in pts_ll]
        )
        colors = np.array([l for l, _k in pts_ll])
        from matplotlib.colors import LinearSegmentedColormap

        cmap = LinearSegmentedColormap.from_list(
            "soibean", ["grey", "yellow", "orange", "red"]
        )
        sc = ax.scatter(pts_x, pts_y, c=colors, s=sizes, cmap=cmap,
                        alpha=0.5, zorder=3, linewidths=0)
        cb = fig.colorbar(sc, ax=ax, orientation="horizontal",
                          pad=0.08, fraction=0.05)
        cb.set_label("Log-likelihood")
    ax.set_yticks([])
    ax.set_xlabel("branch length")
    ax.spines[["left", "top", "right"]].set_visible(False)
    fig.tight_layout()
    out = out or trace_file + ".tree.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out
