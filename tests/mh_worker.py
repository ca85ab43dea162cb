"""Worker for the 2-process multi-host test (spawned by
tests/test_multihost.py). Usage:
    python mh_worker.py <procid> <nproc> <port> <db_dir> <gam> <out.npy>
Each process scores ITS OWN slice of the fixture alignments; the
cross-process psum must reproduce the single-process final_vec."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

procid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
db_dir, gam_path, out_path = sys.argv[4], sys.argv[5], sys.argv[6]

from vgan_tpu.parallel import multihost

multihost.init_distributed(
    f"127.0.0.1:{port}", num_processes=nproc, process_id=procid
)

import numpy as np

from vgan_tpu.io import gam
from vgan_tpu.pipelines import haplocart as hc
from vgan_tpu.pipelines.haplocart_runner import gamsort, load_db

db = load_db(db_dir)
alignments = [a for a in gam.read_gam(gam_path) if a.identity != 0]
alignments = hc.remove_duplicates(gamsort(alignments))
local = multihost.shard_reads(alignments)
vec = multihost.score_alignments_multihost(db, local)
if multihost.is_host0():
    np.save(out_path, vec)
print(f"proc {procid}: done ({len(local)} local reads)", flush=True)
