"""Batched affine Smith-Waterman scoring as a Pallas TPU kernel.

The mapper's heavy phase: thousands of (read, candidate-window) pairs
are scored on device; only the per-read winners go through the exact
host-side graph alignment + traceback (mapper/graph_align.py). This is
the "graph-banded SW over unrolled windows" split of SURVEY.md §7.4:
candidate windows are haplotype-linearized, so the kernel DP is a
dense rectangle with no data-dependent control flow.

Layout: batch pairs ride the 128-wide lane axis, read positions ride
sublanes. The window-column recurrence is the sequential ("arbitrary")
grid dimension - each grid step processes one column for a 128-pair
tile, carrying (H, E, best) in VMEM scratch across steps (the standard
TPU accumulation pattern; an in-kernel fori_loop over 256 columns
explodes Mosaic compile time). The vertical affine recurrence F is
evaluated exactly per column with a log-depth doubling cummax.
Scoring matches mapper/align.py: match +1, mismatch -4, gap open 6,
gap extend 1, full-length bonus 5 at the read's first row (in-DP) and
last row (at the max reduction).

ROOFLINE (v5e; pinned protocol = bench.py best-of-3, the number the
round artifact BENCH_r{N}.json records). The recurrence costs ~46 VPU
f32 ops per DP cell: score 4, diag 5, E 3, H 3, exact-F prefix max
3*ceil(log2 R) = 21 (the dominant term), F-combine 6, masking 3,
best-reduce ~1. One v5e core's VPU peak is ~3.85e12 f32 ops/s
(4 SIMD subunits x (8x128) lanes x 940 MHz). BENCH_r04 pinned
35.3 GCUPS => 35.3e9 * 46 = 1.6e12 ops/s = 42% of VPU
speed-of-light (r3 pinned 37.0 / 44% — the spread was the tunnel's
dispatch regime; from r5 the bench runs this phase in a FRESH
subprocess at dispatch-count ~0, which pins the regime: r5 trials
measured 35.9-41.2 GCUPS / 0.43-0.49, the residual spread being
tunnel slow windows. Always quote the pinned bench artifact, not
one-off runs). The gap to peak is the serial column scan's
load/store of the [R+1, B] carry between unrolled blocks (HBM/VMEM
traffic XLA cannot fully fuse); unrolling 4 columns per scan step
already cut that traffic ~4x. A Pallas grid version would keep the
carry resident in VMEM — the axon remote compiler still cannot
compile gridded Pallas (re-tested round 4: the remote tpu_compile
helper exits 1 / HTTP 500 on this kernel), so the XLA scan twin below
remains the production path and the Pallas kernel is validated in
interpret mode.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import FULL_LENGTH_BONUS, GAP_EXT, GAP_OPEN, MATCH, MISMATCH

NEG = -1e9  # python scalar: jnp constants would be captured as tracers

# ops/cell of the scan recurrence and one v5e core's VPU f32 peak
# (see ROOFLINE in the module docstring)
OPS_PER_CELL = 46
V5E_VPU_PEAK = 3.85e12


def _cummax_rows(x, row_ids):
    """Inclusive cummax along axis 0 via log-depth doubling
    (roll + row masking; Mosaic cannot lower mixed concatenates)."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, jnp.int32(shift), 0)
        shifted = jnp.where(row_ids < shift, jnp.float32(NEG), rolled)
        x = jnp.maximum(x, shifted)
        shift *= 2
    return x


def _sw_col_kernel(read_ref, win_ref, wvalid_ref, rlen_ref, out_ref,
                   h_ref, e_ref, best_ref):
    """One grid step = one window column for a 128-pair tile.

    read_ref [R+1, B] (row 0 is a 255 sentinel so DP row i aligns with
    read base i), win_ref/wvalid_ref [1, B] (this column),
    rlen_ref [1, B]; out_ref [1, B] best score; scratch h/e [R+1, B],
    best [1, B] persists across the sequential column dimension."""
    c = pl.program_id(1)
    n_cols = pl.num_programs(1)
    R1 = read_ref.shape[0]
    B = read_ref.shape[1]
    CB = win_ref.shape[0]  # columns per grid step (8)

    @pl.when(c == 0)
    def _():
        h_ref[:, :] = jnp.zeros((R1, B), jnp.float32)
        e_ref[:, :] = jnp.full((R1, B), NEG, jnp.float32)
        best_ref[:, :] = jnp.zeros((1, B), jnp.float32)

    rcodes = read_ref[:, :]
    rlen = rlen_ref[0:1, :]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R1, B), 0)
    valid_rows = row_ids <= rlen
    ext_w = row_ids.astype(jnp.float32) * GAP_EXT

    for k in range(CB):
        _sw_one_col(
            rcodes, rlen, row_ids, valid_rows, ext_w,
            win_ref[k : k + 1, :], wvalid_ref[k : k + 1, :] > 0,
            h_ref, e_ref, best_ref,
        )

    @pl.when(c == n_cols - 1)
    def _():
        out_ref[0:1, :] = best_ref[0:1, :]


def _sw_one_col(rcodes, rlen, row_ids, valid_rows, ext_w, wcol, col_valid,
                h_ref, e_ref, best_ref):
    H = h_ref[:, :]
    E = e_ref[:, :]

    s = jnp.where(
        (rcodes == wcol) & (rcodes < 4),
        jnp.float32(MATCH),
        jnp.float32(MISMATCH),
    )  # [R1, B]; row 0 is sentinel (never matches)
    # diag[i] = H_prev[i-1] + s[i] (+ start bonus at row 1)
    h_shift = jnp.where(
        row_ids == 0, jnp.float32(0.0), pltpu.roll(H, jnp.int32(1), 0)
    )
    diag = h_shift + s + jnp.where(
        row_ids == 1, jnp.float32(FULL_LENGTH_BONUS), jnp.float32(0.0)
    )
    diag = jnp.where(row_ids == 0, jnp.float32(NEG), diag)
    e_new = jnp.maximum(H - GAP_OPEN, E - GAP_EXT)
    h_no_f = jnp.maximum(jnp.maximum(diag, e_new), 0.0)
    # exact F via prefix max of (H + i*ext)
    a = _cummax_rows(h_no_f + ext_w, row_ids)
    a_shift = jnp.where(
        row_ids == 0, jnp.float32(NEG), pltpu.roll(a, jnp.int32(1), 0)
    )
    f = a_shift - GAP_OPEN - ext_w + GAP_EXT
    h_new = jnp.maximum(h_no_f, f)
    # mask rows beyond read length and frozen (padded) columns
    h_new = jnp.where(valid_rows, h_new, 0.0)
    h_new = jnp.where(col_valid, h_new, H)
    e_new = jnp.where(col_valid, e_new, E)
    h_ref[:, :] = h_new
    e_ref[:, :] = e_new
    # best with end-row bonus
    bonus = jnp.where(
        row_ids == rlen, jnp.float32(FULL_LENGTH_BONUS), jnp.float32(0.0)
    )
    cell = jnp.where(col_valid, h_new + bonus, jnp.float32(NEG))
    best_ref[0:1, :] = jnp.maximum(
        best_ref[0:1, :], jnp.max(cell, axis=0, keepdims=True)
    )


@partial(jax.jit, static_argnames=("interpret",))
def sw_scores(read_codes, win_codes, read_len, win_len, interpret=False):
    """Score a batch of read/window pairs.

    read_codes: [B, R] int32 (255-padded), win_codes: [B, W] int32,
    read_len/win_len: [B] int32. Returns [B] float32 best scores
    (including full-length bonuses)."""
    B, R = read_codes.shape
    W = win_codes.shape[1]
    wpad = (-W) % 8
    if wpad:
        win_codes = jnp.pad(win_codes, ((0, 0), (0, wpad)), constant_values=255)
    W = W + wpad
    TILE = 128
    pad = (-B) % TILE
    if pad:
        read_codes = jnp.pad(read_codes, ((0, pad), (0, 0)), constant_values=255)
        win_codes = jnp.pad(win_codes, ((0, pad), (0, 0)), constant_values=255)
        read_len = jnp.pad(read_len, (0, pad))
        win_len = jnp.pad(win_len, (0, pad))
    Bp = B + pad

    # transpose so the batch rides lanes; sentinel row 0 aligns DP rows
    rT = jnp.concatenate(
        [jnp.full((1, Bp), 255, jnp.int32), read_codes.T.astype(jnp.int32)],
        axis=0,
    )  # [R+1, Bp]
    wT = win_codes.T.astype(jnp.int32)  # [W, Bp]
    wvalid = (
        jnp.arange(W, dtype=jnp.int32)[:, None] < win_len[None, :]
    ).astype(jnp.int32)  # [W, Bp]

    COLS = 8
    grid = (Bp // TILE, W // COLS)
    out = pl.pallas_call(
        _sw_col_kernel,
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R + 1, TILE), lambda b, c: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COLS, TILE), lambda b, c: (c, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COLS, TILE), lambda b, c: (c, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda b, c: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda b, c: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R + 1, TILE), jnp.float32),
            pltpu.VMEM((R + 1, TILE), jnp.float32),
            pltpu.VMEM((1, TILE), jnp.float32),
        ],
        interpret=interpret,
    )(rT, wT, wvalid, read_len[None, :].astype(jnp.int32))
    return out[0, :B]


def sw_scores_reference(read_codes, win_codes, read_len, win_len):
    """Pure-numpy oracle with identical semantics (for testing)."""
    from .align import smith_waterman

    out = np.zeros(len(read_codes), dtype=np.float32)
    for b in range(len(read_codes)):
        q = np.asarray(read_codes[b][: read_len[b]], dtype=np.uint8)
        w = np.asarray(win_codes[b][: win_len[b]], dtype=np.uint8)
        aln = smith_waterman(q, w)
        if aln is None:
            out[b] = 0.0
        else:
            out[b] = aln.score + (
                FULL_LENGTH_BONUS if aln.read_end == len(q) else 0
            )
    return out


def sw_scores_core(read_codes, win_codes, read_len, win_len):
    """XLA twin of the Pallas kernel: identical column recurrence as a
    `lax.scan` over window columns.

    This is the default production path: the axon toolchain in this
    environment cannot compile gridded Pallas kernels ("func.return"
    legalization failure) and takes minutes for grid-less ones, while
    XLA compiles this scan in seconds and emits the same VPU vector
    ops. The Pallas kernel above remains the reference kernel
    formulation (exercised in interpret mode by the test suite).
    Traceable core; `sw_scores_xla` is the jitted entry and
    `gather_score_hash` fuses it with the device-side window gather."""
    B, R = read_codes.shape
    W = win_codes.shape[1]
    rT = jnp.concatenate(
        [jnp.full((1, B), 255, jnp.int32), read_codes.T.astype(jnp.int32)],
        axis=0,
    )  # [R+1, B]
    wT = win_codes.T.astype(jnp.int32)  # [W, B]
    wvalid = jnp.arange(W, dtype=jnp.int32)[:, None] < win_len[None, :]
    rlen = read_len[None, :].astype(jnp.int32)  # [1, B]

    R1 = R + 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R1, B), 0)
    valid_rows = row_ids <= rlen
    ext_w = row_ids.astype(jnp.float32) * GAP_EXT
    neg = jnp.float32(NEG)
    bonus_row1 = jnp.where(row_ids == 1, jnp.float32(FULL_LENGTH_BONUS), 0.0)
    bonus_end = jnp.where(row_ids == rlen, jnp.float32(FULL_LENGTH_BONUS), 0.0)

    def cummax(x):
        n = x.shape[0]
        shift = 1
        while shift < n:
            shifted = jnp.where(
                row_ids < shift, neg, jnp.roll(x, shift, axis=0)
            )
            x = jnp.maximum(x, shifted)
            shift *= 2
        return x

    def one_col(H, E, best, wcol, cvalid):
        s = jnp.where(
            (rT == wcol[None, :]) & (rT < 4),
            jnp.float32(MATCH),
            jnp.float32(MISMATCH),
        )
        h_shift = jnp.where(row_ids == 0, 0.0, jnp.roll(H, 1, axis=0))
        diag = jnp.where(row_ids == 0, neg, h_shift + s + bonus_row1)
        e_new = jnp.maximum(H - GAP_OPEN, E - GAP_EXT)
        h_no_f = jnp.maximum(jnp.maximum(diag, e_new), 0.0)
        a = cummax(h_no_f + ext_w)
        a_shift = jnp.where(row_ids == 0, neg, jnp.roll(a, 1, axis=0))
        f = a_shift - GAP_OPEN - ext_w + GAP_EXT
        h_new = jnp.maximum(h_no_f, f)
        h_new = jnp.where(valid_rows, h_new, 0.0)
        h_new = jnp.where(cvalid[None, :], h_new, H)
        e_new = jnp.where(cvalid[None, :], e_new, E)
        cell = jnp.where(cvalid[None, :], h_new + bonus_end, neg)
        best = jnp.maximum(best, jnp.max(cell, axis=0))
        return h_new, e_new, best

    # CB columns per scan step: the unrolled step body fuses CB column
    # recurrences between carry load/stores, cutting the scan's
    # per-step overhead ~6x on the TPU (measured round 3; same trick
    # as the Pallas kernel's columns-per-grid-step). W is a multiple
    # of 64 by construction (batch_map rounds window widths), so CB
    # always divides it.
    CB = 4 if W % 4 == 0 else 1

    def step(carry, inp):
        H, E, best = carry
        wcols, cvalids = inp  # [CB, B]
        for kk in range(CB):
            H, E, best = one_col(H, E, best, wcols[kk], cvalids[kk])
        return (H, E, best), None

    H0 = jnp.zeros((R1, B), jnp.float32)
    E0 = jnp.full((R1, B), neg)
    best0 = jnp.zeros((B,), jnp.float32)
    (H, E, best), _ = jax.lax.scan(
        step,
        (H0, E0, best0),
        (wT.reshape(W // CB, CB, B), wvalid.reshape(W // CB, CB, B)),
    )
    return best


sw_scores_xla = jax.jit(sw_scores_core)

# complement LUT over the uint8 code alphabet (codes 0..7 complemented,
# everything else — incl. the 255 padding sentinel — identity)
_COMP256 = np.arange(256, dtype=np.uint8)


def _init_comp256():
    from ..utils import dna

    _COMP256[:8] = dna._COMP


_init_comp256()


@partial(jax.jit, static_argnames=("Wmax",))
def gather_score_hash(pc_buf, reads_mat, read_lens, aux, Wmax):
    """One-dispatch mapper device phase: window gather + oriented query
    build + content hash + batched SW scoring.

    Replaces the host-built (rows, Wmax)/(rows, Rmax) int32 uploads of
    the round-2 path with tiny index arrays — the path-code pool
    (`pc_buf`, device-cached across batches) and the packed read matrix
    (`reads_mat`, uint8) stay resident while per-candidate traffic is
    one packed [4, Mb] aux array (every separate argument costs a
    tunnel round trip on the axon backend). This is the "move candidate
    window gather onto device" step of the mapper plan (VERDICT r2
    #1b); the scoring math is byte-identical to `sw_scores_core`.

    Args (all device/committable):
      pc_buf    [P]        uint8  pooled per-path haplotype codes
      reads_mat [Nb, Rmax] uint8  row r = read r's codes, 255-padded
      read_lens [Nb]       int32
      aux       [4, Mb]    int32/int64: rows = candidate -> read row,
                           pc_buf offset of window start, window length
                           (0 = padding row), strand (1 = revcomp)
      Wmax      static     window width (hash ladders are compile-time
                           constants keyed by it)

    Returns [3, Mb] int32: row 0 = SW scores (f32 bitcast), rows 1-2 =
    window content hashes (the host dedups with these; two independent
    32-bit hashes + (read, strand, wlen) key the dedup groups).
    """
    c_read = aux[0].astype(jnp.int32)
    gbase = aux[1]
    wlen = aux[2].astype(jnp.int32)
    strand = aux[3].astype(jnp.int32)
    from .batch_map import _pows

    p1_np, p2_np = _pows(Wmax)
    p1 = jnp.asarray(np.ascontiguousarray(p1_np))
    p2 = jnp.asarray(np.ascontiguousarray(p2_np))
    Rmax = reads_mat.shape[1]
    jj = jnp.arange(Wmax, dtype=gbase.dtype)
    gpos = jnp.clip(gbase[:, None] + jj[None, :], 0,
                    max(pc_buf.shape[0] - 1, 0))
    wmask = jj[None, :].astype(jnp.int32) < wlen[:, None]
    w8 = jnp.where(wmask, pc_buf[gpos], jnp.uint8(255))
    wi = w8.astype(jnp.int32) + 1
    h1 = jnp.sum(wi * p1[None, :], axis=1, dtype=jnp.int32)
    h2 = jnp.sum(wi * p2[None, :], axis=1, dtype=jnp.int32)

    L = read_lens[c_read].astype(jnp.int32)
    jr = jnp.arange(Rmax, dtype=jnp.int32)
    flip = (strand > 0)[:, None]
    idx = jnp.where(flip, L[:, None] - 1 - jr[None, :], jr[None, :])
    idx = jnp.clip(idx, 0, Rmax - 1)
    rows = reads_mat[c_read]
    vals = jnp.take_along_axis(rows, idx, axis=1)
    vals = jnp.where(flip, jnp.asarray(_COMP256)[vals], vals)
    q8 = jnp.where(jr[None, :] < L[:, None], vals, jnp.uint8(255))

    scores = sw_scores_core(
        q8.astype(jnp.int32), w8.astype(jnp.int32), L, wlen
    )
    return jnp.stack(
        [jax.lax.bitcast_convert_type(scores, jnp.int32), h1, h2]
    )
