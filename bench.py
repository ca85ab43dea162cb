"""Benchmark: HaploCart-scale fused scoring throughput on TPU.

Workload: the flagship device step (per-base probability math over all
mappings + per-node accumulation + [n_nodes] x [n_nodes, n_paths]
support matvec) at the real HaploCart DB scale — 11,825 nodes x 5,179
paths (`src/load.cpp:284-292`), 100bp reads in ~12bp mappings.

Baseline: the same math executed by an optimized single-core numpy
float64 implementation on the host CPU (a conservative stand-in for
the reference C++ implementation, whose inner loop is a *scalar*
reads x mappings x 5,179-path walk, `src/HaploCart.cpp:408-421` —
the reference repo publishes no benchmark numbers, see BASELINE.md).

Prints one JSON line:
  {"metric": "haplocart_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": speedup_vs_cpu_numpy}
"""
import json
import time

import numpy as np

import vgan_tpu  # noqa: F401  (x64 config)
import jax
import jax.numpy as jnp

from vgan_tpu.pipelines.haplocart_device import (
    HcBatch,
    make_tables,
    score_batch,
    synth_batch,
    synth_support,
)

N_READS = 16384
M_PER_READ = 100 // 8


def bench_tpu(batch, tables, iters=20):
    out = score_batch(batch, tables)
    out.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = score_batch(batch, tables)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return N_READS / dt, np.asarray(out)


def bench_cpu(batch: HcBatch, support, iters=3):
    from vgan_tpu.models import mutation, phred

    g = np.asarray(batch.g)
    r = np.asarray(batch.r)
    q = np.asarray(batch.q)
    pang = np.asarray(batch.pang)
    mq = np.asarray(batch.mq)
    b = np.asarray(batch.b, dtype=np.float64)
    node = np.asarray(batch.node)
    match_tab = mutation.match_prob_table()
    qtab = phred.qscore_vec()
    imtab = phred.incorrect_mapping_vec()
    bg = np.concatenate([mutation.BACKGROUND_FREQ, [0.25, 0.25, 0.25]])
    sup = support.astype(np.float64)

    t0 = time.perf_counter()
    for _ in range(iters):
        qv = qtab[np.clip(q, 0, 99)]
        valid = (g < 4) & (r < 4)
        eps = np.where(g == r, qv, 1.0 - qv)
        p_obs = match_tab[pang][:, None] * (1.0 - eps)
        p_correct = (1.0 - imtab[np.clip(mq, 0, 99)]) * 1.0
        term = np.log(
            (1.0 - p_correct)[:, None] * bg[r] + p_correct[:, None] * p_obs
        )
        A = np.where(valid, term, 0.0).sum(axis=1)
        d = A - b
        c = np.zeros(sup.shape[0])
        np.add.at(c, node, d)
        final = b.sum() + c @ sup
    dt = (time.perf_counter() - t0) / iters
    return N_READS / dt, final


def main():
    support = synth_support()
    tables = make_tables(support)
    batch = synth_batch(n_reads=N_READS)

    tpu_rps, tpu_out = bench_tpu(batch, tables)
    cpu_rps, cpu_out = bench_cpu(batch, support)

    # sanity: same argmax
    agree = int(np.argmax(tpu_out)) == int(np.argmax(cpu_out))

    result = {
        "metric": "haplocart_reads_per_s",
        "value": round(tpu_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(tpu_rps / cpu_rps, 2),
        "cpu_baseline_reads_per_s": round(cpu_rps, 1),
        "argmax_agrees": agree,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
