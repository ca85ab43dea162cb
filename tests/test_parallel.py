"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §2.9 / §4): sharded programs must agree with their
single-device twins bit-for-bit (same reduction structure)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgan_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_euka_batch,
    shard_tables,
    sharded_euka_score_fn,
    sharded_score_fn,
)
from vgan_tpu.pipelines.haplocart_device import (
    make_tables,
    score_batch,
    synth_batch,
    synth_support,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(n_devices=8, dp=4, tp=2)


def test_sharded_haplocart_matches_single_device(mesh8):
    support = synth_support(n_nodes=256, n_paths=128)
    tables = make_tables(support)
    batch = synth_batch(n_reads=32, n_nodes=256)
    want = np.asarray(score_batch(batch, tables))
    step = sharded_score_fn(mesh8)
    got = np.asarray(
        step(shard_batch(batch, mesh8), shard_tables(tables, mesh8))
    )[: len(want)]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert int(np.argmax(got)) == int(np.argmax(want))


def test_sharded_euka_scorer_matches_single_device(mesh8):
    from vgan_tpu.models.damage import DamageModel
    from vgan_tpu.models import phred
    from vgan_tpu.pipelines.euka import (
        BASE_FREQ_LOG, T_T_RATIO, _score_batch,
    )

    rng = np.random.default_rng(11)
    B, L = 37, 64  # deliberately not divisible by 8 (tests padding)
    g = rng.integers(0, 4, size=(B, L)).astype(np.int32)
    r = np.where(rng.random((B, L)) < 0.9, g,
                 rng.integers(0, 4, size=(B, L))).astype(np.int32)
    q = rng.integers(20, 40, size=(B, L)).astype(np.int32)
    n_pos = np.tile(np.arange(L, dtype=np.int32), (B, 1))
    L_read = np.full(B, L, np.int32)
    pair_dist = np.full(B, 0.05)
    valid = np.ones((B, L), dtype=bool)

    dm = DamageModel.none()
    sub5p, sub3p = dm.tables(jnp.float64)
    qtab = jnp.asarray(phred.qscore_vec())
    bfreq = jnp.asarray(BASE_FREQ_LOG)
    ttr = jnp.asarray(T_T_RATIO)

    want1, want2 = _score_batch(
        g, r, q, n_pos, L_read, pair_dist, valid,
        sub5p, sub3p, qtab, bfreq, ttr,
    )
    step = sharded_euka_score_fn(mesh8)
    (gs, rs, qs, ns, Ls, ps, vs), B0 = shard_euka_batch(
        mesh8, g, r, q, n_pos, L_read, pair_dist, valid
    )
    got1, got2 = step(gs, rs, qs, ns, Ls, ps, vs, sub5p, sub3p,
                      qtab, bfreq, ttr)
    np.testing.assert_allclose(np.asarray(got1)[:B0], np.asarray(want1),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got2)[:B0], np.asarray(want2),
                               rtol=1e-12)


def test_sharded_euka_output_sharding(mesh8):
    """Outputs stay dp-sharded (no gather happens on device)."""
    from vgan_tpu.models.damage import DamageModel
    from vgan_tpu.models import phred
    from vgan_tpu.pipelines.euka import BASE_FREQ_LOG, T_T_RATIO

    rng = np.random.default_rng(1)
    B, L = 16, 32
    arrays = (
        rng.integers(0, 4, size=(B, L)).astype(np.int32),
        rng.integers(0, 4, size=(B, L)).astype(np.int32),
        rng.integers(20, 40, size=(B, L)).astype(np.int32),
        np.tile(np.arange(L, dtype=np.int32), (B, 1)),
        np.full(B, L, np.int32),
        np.full(B, 0.05),
        np.ones((B, L), dtype=bool),
    )
    dm = DamageModel.none()
    sub5p, sub3p = dm.tables(jnp.float64)
    step = sharded_euka_score_fn(mesh8)
    sharded, B0 = shard_euka_batch(mesh8, *arrays)
    out1, _ = step(*sharded, sub5p, sub3p,
                   jnp.asarray(phred.qscore_vec()),
                   jnp.asarray(BASE_FREQ_LOG), jnp.asarray(T_T_RATIO))
    assert len(out1.sharding.device_set) == 8


def test_production_runner_mesh_matches_single(toy_graph, ref, tmp_path):
    """VERDICT r1 #3: the production haplocart runner with the auto
    mesh (8 virtual devices) produces the same final_vec / prediction
    as with sharding disabled (--devices 1)."""
    from vgan_tpu.parallel.mesh import auto_mesh, set_device_limit
    from vgan_tpu.pipelines.haplocart_runner import (
        HaplocartConfig,
        load_db,
        run_sample,
    )
    from vgan_tpu import cli

    d = tmp_path / "db"
    rc = cli.main(
        ["build-db", str(ref / "test/reconstructInputSeq/target_graph.gfa"),
         str(d)]
    )
    assert rc == 0
    db = load_db(str(d))
    cfg = HaplocartConfig(
        db_dir=str(d),
        gamfile=str(ref / "test/reconstructInputSeq/test_reads.gam"),
    )
    try:
        set_device_limit(1)
        assert auto_mesh() is None
        pred1, n1, vec1 = run_sample(cfg, db, None, "s")
        db._sharded_cache = {}
        set_device_limit(None)
        assert auto_mesh() is not None and auto_mesh().size == 8
        pred8, n8, vec8 = run_sample(cfg, db, None, "s")
    finally:
        set_device_limit(None)
    assert (pred1, n1) == (pred8, n8)
    np.testing.assert_allclose(vec8, vec1, rtol=1e-12)


def test_auto_mesh_tp_selection():
    """auto_mesh engages tp when the support matrix would exceed the
    per-chip threshold (VERDICT r2 #4): big support -> dp*tp split,
    small support -> dp-only; tp never exceeds what halving brings
    under the threshold."""
    from vgan_tpu.parallel import mesh as M

    try:
        M.set_device_limit(None)
        small = M.auto_mesh(support_bytes=1024)
        assert small.shape["tp"] == 1 and small.shape["dp"] == 8
        big = M.auto_mesh(support_bytes=4 * M.TP_BYTES_THRESHOLD)
        assert big.shape["tp"] == 4 and big.shape["dp"] == 2
        mid = M.auto_mesh(support_bytes=2 * M.TP_BYTES_THRESHOLD)
        assert mid.shape["tp"] == 2 and mid.shape["dp"] == 4
    finally:
        M.set_device_limit(None)


def test_production_runner_tp_matches_single(toy_graph, ref, tmp_path):
    """Production haplocart with a forced dp=4 x tp=2 auto mesh (the
    path-axis sharding the real 5,179-path DB triggers) reproduces the
    unsharded final_vec bit-for-bit-close (rtol 1e-12)."""
    from vgan_tpu.parallel import mesh as M
    from vgan_tpu.pipelines.haplocart_runner import (
        HaplocartConfig,
        load_db,
        run_sample,
    )
    from vgan_tpu import cli

    d = tmp_path / "db"
    rc = cli.main(
        ["build-db", str(ref / "test/reconstructInputSeq/target_graph.gfa"),
         str(d)]
    )
    assert rc == 0
    db = load_db(str(d))
    cfg = HaplocartConfig(
        db_dir=str(d),
        gamfile=str(ref / "test/reconstructInputSeq/test_reads.gam"),
    )
    orig = M.TP_BYTES_THRESHOLD
    try:
        M.set_device_limit(1)
        pred1, n1, vec1 = run_sample(cfg, db, None, "s")
        db._sharded_cache = {}
        set_device_limit = M.set_device_limit
        set_device_limit(None)
        # force tp=2: threshold below this toy DB's support bytes
        sup = db.graph.path_support
        M.TP_BYTES_THRESHOLD = max(sup.shape[0] * sup.shape[1] * 8 // 2, 1)
        predt, nt, vect = run_sample(cfg, db, None, "s")
        used = M.auto_mesh(support_bytes=sup.shape[0] * sup.shape[1] * 8)
        assert used.shape["tp"] == 2 and used.shape["dp"] == 4
    finally:
        M.TP_BYTES_THRESHOLD = orig
        M.set_device_limit(None)
    assert (pred1, n1) == (predt, nt)
    np.testing.assert_allclose(vect, vec1, rtol=1e-12)
