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
