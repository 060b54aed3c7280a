"""ShardedIndex on the virtual 8-device CPU mesh: parity with single-device."""

import numpy as np
import pytest

from modular_rag_system_tpu.index import DeviceIndex
from modular_rag_system_tpu.parallel.mesh import make_index_mesh
from modular_rag_system_tpu.parallel.sharded import ShardedIndex
from tests.conftest import cpu_mesh_devices


def normalized(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def mesh8():
    return make_index_mesh(8, devices=cpu_mesh_devices(8))


@pytest.fixture(scope="module")
def mesh1():
    return make_index_mesh(1, devices=cpu_mesh_devices(1))


def test_sharded_exact_matches_single(rng, mesh8):
    E = normalized(rng, 4000, 64)
    q = normalized(rng, 5, 64)
    single = DeviceIndex(dim=64, tier="exact")
    single.add(E)
    sharded = ShardedIndex(dim=64, mesh=mesh8, tier="exact", block_rows=256)
    sharded.add(E)
    sv, sr = single.search(q, 10)
    xv, xr = sharded.search(q, 10)
    np.testing.assert_allclose(xv, sv, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(xr, sr)


def test_sharded_one_device_degenerate(rng, mesh1):
    """Same code path on a 1-device mesh (SURVEY §7 step 6)."""
    E = normalized(rng, 1000, 64)
    q = normalized(rng, 3, 64)
    sharded = ShardedIndex(dim=64, mesh=mesh1, tier="exact", block_rows=256)
    sharded.add(E)
    single = DeviceIndex(dim=64, tier="exact")
    single.add(E)
    np.testing.assert_array_equal(sharded.search(q, 5)[1], single.search(q, 5)[1])


def test_sharded_fused_tier(rng, mesh8):
    E = normalized(rng, 4096, 128)
    q = normalized(rng, 4, 128)
    sharded = ShardedIndex(dim=128, mesh=mesh8, tier="fused", block_rows=256)
    sharded.add(E)
    single = DeviceIndex(dim=128, tier="exact")
    single.add(E)
    sv, sr = single.search(q, 10)
    xv, xr = sharded.search(q, 10)
    np.testing.assert_array_equal(xr, sr)
    np.testing.assert_allclose(xv, sv, rtol=1e-4, atol=1e-5)


def test_sharded_int8_tier_recall(rng, mesh8):
    E = normalized(rng, 8192, 128)
    q = normalized(rng, 8, 128)
    sharded = ShardedIndex(dim=128, mesh=mesh8, tier="int8", block_rows=256)
    sharded.add(E)
    single = DeviceIndex(dim=128, tier="exact")
    single.add(E)
    _, sr = single.search(q, 10)
    _, xr = sharded.search(q, 10)
    recall = np.mean([len(set(sr[i]) & set(xr[i])) / 10 for i in range(len(q))])
    assert recall >= 0.9, f"sharded int8 recall@10 = {recall}"


def test_sharded_incremental_append(rng, mesh8):
    sharded = ShardedIndex(dim=32, mesh=mesh8, tier="exact", block_rows=256)
    single = DeviceIndex(dim=32, tier="exact")
    chunks = [normalized(rng, n, 32) for n in (100, 57, 900)]
    for c in chunks:
        f1, n1 = sharded.add(c)
        f2, n2 = single.add(c)
        assert (f1, n1) == (f2, n2)
    assert sharded.count == single.count == 1057
    q = normalized(rng, 2, 32)
    np.testing.assert_array_equal(sharded.search(q, 7)[1], single.search(q, 7)[1])


def test_sharded_capacity_growth(rng, mesh8):
    sharded = ShardedIndex(dim=32, mesh=mesh8, capacity=2048, tier="exact", block_rows=256)
    cap0 = sharded.capacity
    E = normalized(rng, cap0 + 500, 32)
    sharded.add(E)
    assert sharded.capacity > cap0
    assert sharded.count == cap0 + 500
    q = normalized(rng, 1, 32)
    ref = DeviceIndex(dim=32)
    ref.add(E)
    np.testing.assert_array_equal(sharded.search(q, 5)[1], ref.search(q, 5)[1])


def test_sharded_delete_rows(rng, mesh8):
    E = normalized(rng, 800, 32)
    sharded = ShardedIndex(dim=32, mesh=mesh8, tier="exact", block_rows=256)
    sharded.add(E)
    _, r = sharded.search(E[13:14], 1)
    assert r[0, 0] == 13
    sharded.delete_rows(np.array([13]))
    _, r2 = sharded.search(E[13:14], 1)
    assert r2[0, 0] != 13


def test_sharded_empty(rng, mesh8):
    sharded = ShardedIndex(dim=32, mesh=mesh8)
    s, r = sharded.search(normalized(rng, 2, 32), 5)
    assert (r == -1).all()


def test_sharded_snapshot_roundtrip(rng, mesh8, tmp_path):
    E = normalized(rng, 300, 32)
    sharded = ShardedIndex(dim=32, mesh=mesh8, tier="exact", block_rows=256)
    sharded.add(E)
    p = str(tmp_path / "shard_snap.npz")
    sharded.snapshot(p)
    # snapshot is in GLOBAL row order -> loads into a plain DeviceIndex too
    single = DeviceIndex.load(p)
    assert single.count == 300
    q = normalized(rng, 2, 32)
    np.testing.assert_array_equal(single.search(q, 5)[1], sharded.search(q, 5)[1])


def test_tie_break_parity_across_mesh_sizes(rng, mesh8, mesh1):
    """Duplicate rows: 1-shard and 8-shard meshes agree exactly."""
    base = normalized(rng, 1, 64)
    E = np.tile(base, (512, 1)).astype(np.float32)
    a = ShardedIndex(dim=64, mesh=mesh1, tier="fused", block_rows=256)
    b = ShardedIndex(dim=64, mesh=mesh8, tier="fused", block_rows=64)
    a.add(E)
    b.add(E)
    _, ra = a.search(base, 5)
    _, rb = b.search(base, 5)
    np.testing.assert_array_equal(ra, rb)
    np.testing.assert_array_equal(ra[0], np.arange(5))


def test_sharded_bf16_tier(rng, mesh8):
    E = normalized(rng, 4096, 128)
    q = normalized(rng, 4, 128)
    sharded = ShardedIndex(dim=128, mesh=mesh8, tier="bf16", block_rows=256)
    sharded.add(E)
    single = DeviceIndex(dim=128, tier="exact")
    single.add(E)
    _, sr = single.search(q, 10)
    _, xr = sharded.search(q, 10)
    recall = np.mean([len(set(sr[i]) & set(xr[i])) / 10 for i in range(4)])
    assert recall >= 0.95, recall


@pytest.mark.slow
def test_sharded_fused_query_program(rng, mesh8, tmp_path):
    """Engine composes encode + sharded search + merge into one jit."""
    from modular_rag_system_tpu.config import RAGConfig
    from modular_rag_system_tpu.engine import RAGEngine
    from modular_rag_system_tpu.types import Document

    cfg = RAGConfig().merged({
        "embedding": {"model": "minilm", "dim": 64, "max_seq_len": 32,
                      "batch_size": 8, "num_layers": 2, "num_heads": 4,
                      "mlp_dim": 128, "vocab_size": 1000, "dtype": "float32"},
        "store": {"storage_path": str(tmp_path / "s")},
        "index": {"tier": "fused", "block_rows": 256},
        "mesh": {"index_shards": 8},
        "retrieval": {"similarity_threshold": 0.0},
    })
    eng = RAGEngine(cfg)
    eng.add_documents([Document(content=f"sharded fused doc {i} alpha") for i in range(50)])
    res = eng.query("sharded fused doc 7 alpha", max_results=3)
    assert res.documents
    assert any(key[4] for key in eng._fused_query_cache), "sharded fused program unused"
    # parity with explicit two-step path
    q_emb = np.asarray(eng.encoder.encode_queries(["sharded fused doc 7 alpha"]))
    _, rows2 = eng.index.search(q_emb, 6)
    fused = eng._device_query(["sharded fused doc 7 alpha"], 6)
    np.testing.assert_array_equal(fused[1][0], rows2[0])
    eng.shutdown()


def test_hierarchical_two_stage_merge(rng):
    """2-D (dcn, ici) mesh: per-slice ICI merge then DCN merge — results
    identical to the flat 8-shard and single-device paths."""
    from modular_rag_system_tpu.parallel.mesh import make_hierarchical_index_mesh

    E = normalized(rng, 4000, 64)
    q = normalized(rng, 5, 64)
    single = DeviceIndex(dim=64, tier="exact")
    single.add(E)
    _, ref = single.search(q, 10)
    for shape in ((2, 4), (4, 2)):
        mesh2d = make_hierarchical_index_mesh(*shape, devices=cpu_mesh_devices(8))
        idx = ShardedIndex(dim=64, mesh=mesh2d, tier="exact", block_rows=256)
        assert idx.axis == ("dcn", "ici")
        idx.add(E)
        _, got = idx.search(q, 10)
        np.testing.assert_array_equal(got, ref)


def test_hierarchical_fused_tier(rng):
    from modular_rag_system_tpu.parallel.mesh import make_hierarchical_index_mesh

    mesh2d = make_hierarchical_index_mesh(2, 4, devices=cpu_mesh_devices(8))
    E = normalized(rng, 4096, 128)
    q = normalized(rng, 4, 128)
    idx = ShardedIndex(dim=128, mesh=mesh2d, tier="fused", block_rows=128)
    idx.add(E)
    single = DeviceIndex(dim=128, tier="exact")
    single.add(E)
    _, ref = single.search(q, 10)
    _, got = idx.search(q, 10)
    np.testing.assert_array_equal(got, ref)


def test_sharded_bf16_store_dtype(rng, mesh8):
    E = normalized(rng, 2048, 64)
    q = normalized(rng, 4, 64)
    ref = DeviceIndex(dim=64, tier="exact")
    ref.add(E)
    _, rr = ref.search(q, 10)
    for tier in ("exact", "bf16", "int8"):
        idx = ShardedIndex(dim=64, mesh=mesh8, tier=tier, block_rows=64,
                           store_dtype="bfloat16")
        idx.add(E)
        _, got = idx.search(q, 10)
        recall = np.mean([len(set(rr[i]) & set(got[i])) / 10 for i in range(4)])
        assert recall >= 0.9, (tier, recall)
    assert idx.memory_bytes() < ref.memory_bytes() * 8  # bf16 phys halves


def test_non_pow2_block_rows_scans_all_rows(rng, mesh8):
    """ADVICE r1 (medium): a block_rows that doesn't divide the pow2 cap_s
    silently skipped the tail rows of every shard.  It now rounds down to
    a power of two, so results match the exact reference."""
    E = normalized(rng, 4096, 64)
    q = normalized(rng, 4, 64)
    single = DeviceIndex(dim=64, tier="exact")
    single.add(E)
    _, ref = single.search(q, 10)
    idx = ShardedIndex(dim=64, mesh=mesh8, tier="fused", block_rows=384)
    assert idx.block_rows == 256
    idx.add(E)
    _, got = idx.search(q, 10)
    np.testing.assert_array_equal(got, ref)


def test_sharded_bf16_snapshot_roundtrip(rng, mesh8, tmp_path):
    """ADVICE r1 (low): sharded snapshots now keep the stored dtype (bf16
    saved as a uint16 bit view) instead of upcasting to f32+zlib."""
    E = normalized(rng, 300, 32)
    sharded = ShardedIndex(dim=32, mesh=mesh8, tier="exact", block_rows=256,
                           store_dtype="bfloat16")
    sharded.add(E)
    p = str(tmp_path / "shard_snap_bf16.npz")
    sharded.snapshot(p)
    data = np.load(p)
    assert "embeddings_bf16" in data and data["embeddings_bf16"].dtype == np.uint16
    re_sharded = ShardedIndex.load(p, mesh=mesh8)
    assert re_sharded.store_dtype == "bfloat16"
    q = normalized(rng, 2, 32)
    np.testing.assert_array_equal(
        re_sharded.search(q, 5)[1], sharded.search(q, 5)[1]
    )


def test_sharded_derived_tiers_update_incrementally(rng, mesh8):
    """Sharded analog of the O(B) derived-tier maintenance."""
    E = normalized(rng, 600, 64)
    q = E[:4]
    for tier in ("int8", "bf16"):
        idx = ShardedIndex(dim=64, mesh=mesh8, capacity=8192, tier=tier,
                           block_rows=64)
        idx.add(E[:500])
        idx.search(q, 5)
        assert idx.derived_rebuilds == 1
        base = idx.derived_incremental_rows
        idx.add(E[500:])
        idx.delete_rows(np.array([3]))
        idx.set_rows(np.array([7]), E[7:8] * 0.5)
        assert idx.derived_rebuilds == 1
        assert 0 < idx.derived_incremental_rows - base <= 128 + 2

        fresh = ShardedIndex(dim=64, mesh=mesh8, capacity=8192, tier=tier,
                             block_rows=64)
        fresh.add(E)
        fresh.delete_rows(np.array([3]))
        fresh.set_rows(np.array([7]), E[7:8] * 0.5)
        sv, sr = fresh.search(q, 5)
        iv, ir = idx.search(q, 5)
        np.testing.assert_array_equal(ir, sr)
        np.testing.assert_allclose(iv, sv, atol=1e-6)


def test_sharded_ivf_recall_parity(rng, mesh8):
    """Sharded IVF2 (SPMD k-means + per-shard cluster-contiguous slabs +
    ICI merge) tracks single-device IVF2 recall on the same corpus."""
    # clustered corpus so IVF has real structure
    d, n_hubs = 64, 16
    hubs = normalized(rng, n_hubs, d)
    E = hubs[rng.integers(0, n_hubs, 4096)] + 0.05 * rng.standard_normal((4096, d))
    E = (E / np.linalg.norm(E, axis=1, keepdims=True)).astype(np.float32)
    q = E[:16]

    exact = DeviceIndex(dim=d, tier="exact")
    exact.add(E)
    _, ref = exact.search(q, 10)

    single = DeviceIndex(dim=d, tier="ivf", ivf_clusters=32, ivf_nprobe=8,
                         ivf_iters=8, ivf_rebuild_min=64,
                         ivf_fine_dtype="bf16")
    single.add(E)
    assert single._ivf2 is not None
    _, got_single = single.search(q, 10)
    recall_single = np.mean(
        [len(set(ref[i]) & set(got_single[i])) / 10 for i in range(16)]
    )

    sharded = ShardedIndex(dim=d, mesh=mesh8, tier="ivf", block_rows=64,
                           ivf_clusters=32, ivf_nprobe=8, ivf_iters=8,
                           ivf_rebuild_min=64, ivf_fine_dtype="bf16")
    sharded.add(E)
    assert sharded._ivf2 is not None
    _, got_sharded = sharded.search(q, 10)
    recall_sharded = np.mean(
        [len(set(ref[i]) & set(got_sharded[i])) / 10 for i in range(16)]
    )
    assert recall_sharded >= 0.8, (recall_sharded, recall_single)
    assert recall_sharded >= recall_single - 0.1, (recall_sharded, recall_single)
    # every live row is laid out exactly once across all shards
    perm = np.asarray(sharded._ivf2.perm)  # (S, nbp * SLAB) local rows
    gids = sorted(
        int(perm[s, i]) * 8 + s
        for s in range(8) for i in np.flatnonzero(perm[s] >= 0)
    )
    assert gids == list(range(4096))


@pytest.mark.slow
def test_sharded_ivf_incremental_write_serves_tail(rng, mesh8):
    """VERDICT r2 item 2 (sharded): writes do not invalidate the build;
    fresh rows are served from each shard's exact tail until a
    threshold rebuild from the write path."""
    E = normalized(rng, 1400, 32)
    idx = ShardedIndex(dim=32, mesh=mesh8, tier="ivf", block_rows=64,
                       ivf_clusters=8, ivf_nprobe=8, ivf_iters=4,
                       ivf_rebuild_min=256, ivf_fine_dtype="bf16")
    idx.add(E[:1000])
    assert idx.ivf_rebuilds == 1 and idx._ivf2.built == 1000
    _, r1 = idx.search(E[:2], 5)
    assert (r1[:, 0] == np.array([0, 1])).all()
    built_obj = idx._ivf2
    idx.add(E[1000:1100])  # below threshold: tail, no rebuild
    assert idx._ivf2 is built_obj and idx.ivf_rebuilds == 1
    _, r2 = idx.search(E[1020:1022], 5)
    assert (r2[:, 0] == np.array([1020, 1021])).all()
    # deletes sync the fine copy in O(batch)
    idx.delete_rows(np.asarray([0]))
    sc, r3 = idx.search(E[:1], 5)
    assert r3[0, 0] != 0 or sc[0, 0] < 0.5
    # crossing the threshold rebuilds from the write path
    idx.add(E[1100:])
    assert idx.ivf_rebuilds == 2 and idx._ivf2.built == idx.count


def test_sharded_ivf_hierarchical_mesh(rng):
    from modular_rag_system_tpu.parallel.mesh import make_hierarchical_index_mesh

    mesh2d = make_hierarchical_index_mesh(2, 4, devices=cpu_mesh_devices(8))
    E = normalized(rng, 2048, 32)
    idx = ShardedIndex(dim=32, mesh=mesh2d, tier="ivf", block_rows=64,
                       ivf_clusters=16, ivf_nprobe=16, ivf_iters=4,
                       ivf_rebuild_min=64, ivf_fine_dtype="bf16")
    idx.add(E)
    assert idx._ivf2 is not None
    _, got = idx.search(E[:4], 5)
    assert (got[:, 0] == np.arange(4)).all()


def test_sharded_load_preserves_tier_config(rng, mesh8, tmp_path):
    """VERDICT r2 item 7: ShardedIndex.load forwards fused_bin_width and
    ivf_* instead of silently reverting them to defaults."""
    idx = ShardedIndex(dim=32, mesh=mesh8, tier="exact", block_rows=256)
    idx.add(rng.standard_normal((100, 32)).astype(np.float32))
    p = str(tmp_path / "cfg.npz")
    idx.snapshot(p)
    back = ShardedIndex.load(p, mesh=mesh8, tier="ivf", fused_bin_width=128,
                             ivf_clusters=4, ivf_nprobe=2, ivf_iters=3)
    assert back.fused_bin_width == 128
    assert back.ivf_clusters == 4
    assert back.ivf_nprobe == 2
    assert back.ivf_iters == 3
    assert back.count == 100


def test_search_deep_matches_exact_beyond_cap_s(rng, mesh8):
    """search_deep returns exact any-k results with k > cap_s (weakness 8:
    the normal path clamps k to cap_s)."""
    d = 32
    idx = ShardedIndex(dim=d, mesh=mesh8, capacity=2048, tier="bf16",
                       block_rows=256, store_dtype="bfloat16")
    E = rng.standard_normal((1500, d)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    idx.add(E)
    assert idx.cap_s == 256  # 8 shards x 256 = 2048
    q = rng.standard_normal((3, d)).astype(np.float32)
    k = 1200  # far past cap_s
    vals, gids = idx.search_deep(q, k)
    assert vals.shape == (3, k) and gids.shape == (3, k)
    # reference: host matmul in bf16-rounded space
    import ml_dtypes

    Eb = E.astype(ml_dtypes.bfloat16).astype(np.float32)
    ref = q @ Eb.T
    for i in range(3):
        order = np.lexsort((np.arange(1500), -ref[i]))[:k]
        np.testing.assert_allclose(
            vals[i], np.sort(ref[i])[::-1][:k], rtol=1e-5, atol=1e-5
        )
        assert set(gids[i]) == set(order)


def test_sharded_update_only_drift_triggers_rebuild(rng, mesh8):
    """Mirror of the DeviceIndex drift test: set_rows-only workloads on a
    sharded ivf index must re-fire the rebuild threshold (round-3 review
    finding — stale_rows grew unbounded with no rebuild)."""
    idx = ShardedIndex(dim=32, mesh=mesh8, tier="ivf", block_rows=64,
                       ivf_clusters=8, ivf_nprobe=1, ivf_iters=4,
                       ivf_rebuild_min=64, ivf_tail_frac=0.1,
                       ivf_fine_dtype="bf16")
    E = normalized(rng, 1024, 32)
    idx.add(E)
    assert idx._ivf2 is not None
    builds0 = idx.ivf_rebuilds
    moved = normalized(rng, 384, 32)
    for lo in range(0, 384, 48):
        rows = np.arange(lo, lo + 48)
        idx.set_rows(rows, moved[lo:lo + 48])
    assert idx.ivf_rebuilds > builds0, "update-only drift never rebuilt"
    _, got = idx.search(moved[:8], 1)
    np.testing.assert_array_equal(got[:, 0], np.arange(8))


@pytest.mark.slow
def test_sharded_auto_tier_promotion(rng, mesh8, monkeypatch):
    """tier="auto" on a mesh: int8 below the crossover, write-path
    promotion to sharded ivf at/above — results stay correct."""
    monkeypatch.setattr(DeviceIndex, "_AUTO_IVF_ROWS", 1000)
    E = normalized(rng, 1600, 32)
    q = normalized(rng, 4, 32)
    exact = DeviceIndex(dim=32, tier="exact")
    exact.add(E)
    ev, er = exact.search(q, 10)
    prefix = DeviceIndex(dim=32, tier="exact")
    prefix.add(E[:900])
    pv, pr = prefix.search(q, 10)
    sharded = ShardedIndex(dim=32, mesh=mesh8, tier="auto", block_rows=256,
                           ivf_clusters=8, ivf_nprobe=8, ivf_rebuild_min=64)
    sharded.add(E[:900])
    assert sharded._resolved_tier() == "int8"
    assert sharded._ivf2 is None  # no ANN build below the crossover
    v1, r1 = sharded.search(q, 10)
    np.testing.assert_array_equal(r1, pr)  # int8 mixed is master-exact
    np.testing.assert_allclose(v1, pv, rtol=1e-4, atol=1e-5)
    sharded.add(E[900:])  # crosses the threshold
    assert sharded._resolved_tier() == "ivf"
    assert sharded._ivf2 is not None  # built from the write path
    assert sharded.search_token(10)[0] == "ivf"
    v2, r2 = sharded.search(q, 10)
    # nprobe == n_clusters: every cluster probed -> exact results
    np.testing.assert_array_equal(r2, er)
    np.testing.assert_allclose(v2, ev, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("tier", ["exact", "int8"])
def test_search_core_deep_k_beyond_cap_s(rng, mesh8, tier):
    """cap_s < k <= the engine's kernel max must route to the any-k deep
    program instead of raising from the per-shard ``lax.top_k`` (round-3
    review finding 1), on every tier — the deep route is tier-agnostic."""
    import jax.numpy as jnp

    d = 16
    idx = ShardedIndex(dim=d, mesh=mesh8, capacity=512, tier=tier,
                       block_rows=32)
    E = normalized(rng, 400, d)
    idx.add(E)
    assert idx.cap_s == 64
    k = 300  # > cap_s, <= S * cap_s
    assert idx._effective_tier(k) == "deep"
    q = normalized(rng, 8, d)
    fn = idx.search_core(8, k)  # previously: ValueError from top_k
    with idx._lock:
        ops = idx.search_ops(idx._effective_tier(k))
        vals, gids = fn(ops, idx.count_device(), jnp.asarray(q))
    vals, gids = np.asarray(vals), np.asarray(gids)
    assert vals.shape == (8, k) and gids.shape == (8, k)
    ref = q @ E.T
    for i in range(3):
        order = np.lexsort((np.arange(400), -ref[i]))[:k]
        np.testing.assert_array_equal(gids[i], order)
        np.testing.assert_allclose(vals[i], ref[i][order], rtol=1e-5,
                                   atol=1e-5)


def test_search_public_no_longer_clamps_k_to_cap_s(rng, mesh8):
    """VERDICT r2 weakness 8: ``search(q, k)`` with cap_s < k <= S*cap_s
    serves the any-k deep program instead of silently returning cap_s
    candidates padded with -inf."""
    d = 16
    idx = ShardedIndex(dim=d, mesh=mesh8, capacity=512, tier="exact",
                       block_rows=32)
    E = normalized(rng, 400, d)
    idx.add(E)
    q = normalized(rng, 2, d)
    k = 300
    vals, gids = idx.search(q, k)
    assert vals.shape == (2, k)
    assert np.isfinite(vals).all()  # real candidates, not -inf padding
    ref = q @ E.T
    for i in range(2):
        order = np.lexsort((np.arange(400), -ref[i]))[:k]
        np.testing.assert_array_equal(gids[i], order)


def test_sharded_load_full_knob_passthrough(rng, mesh8, tmp_path):
    """load() forwards EVERY constructor knob (round-3 review finding 4:
    ivf_fine_dtype/ivf_tail_frac/ivf_rebuild_min were dropped)."""
    idx = ShardedIndex(dim=32, mesh=mesh8, tier="exact", block_rows=256)
    idx.add(normalized(rng, 60, 32))
    p = str(tmp_path / "knobs.npz")
    idx.snapshot(p)
    back = ShardedIndex.load(
        p, mesh=mesh8, tier="ivf", block_rows=128, fused_bin_width=128,
        ivf_clusters=4, ivf_nprobe=2, ivf_iters=3, ivf_fine_dtype="int8",
        ivf_tail_frac=0.5, ivf_rebuild_min=7, ivf_balance=1.25,
    )
    assert back.ivf_fine_dtype == "int8"
    assert back.ivf_tail_frac == 0.5
    assert back.ivf_rebuild_min == 7
    assert back.ivf_balance == 1.25
    assert back.block_rows == 128
    assert back.count == 60


def test_build_programs_cached_across_rebuilds(rng, mesh8):
    """Write-path re-clusters reuse the jitted fill/order-counts programs
    (round-3 review finding 3: fresh closures re-paid XLA compilation of
    the fill pipeline inside the index lock on every rebuild)."""
    idx = ShardedIndex(dim=16, mesh=mesh8, tier="ivf", block_rows=256,
                       ivf_clusters=4, ivf_nprobe=4, ivf_rebuild_min=1,
                       ivf_tail_frac=0.0, ivf_balance=0.0)
    E = normalized(rng, 600, 16)
    idx.add(E[:300])
    assert idx._ivf2 is not None
    progs_after_first = dict(idx._build_prog_cache)
    assert any(k[0] == "fill" for k in progs_after_first)
    idx.add(E[300:])  # re-fires the rebuild threshold
    assert idx.ivf_rebuilds >= 2
    for key, fn in progs_after_first.items():
        assert idx._build_prog_cache.get(key) is fn, (
            f"program {key} was rebuilt instead of reused")
    _, got = idx.search(E[:4], 1)
    np.testing.assert_array_equal(got[:, 0], np.arange(4))


@pytest.mark.slow
def test_sharded_queries_serve_during_rebuild(rng, monkeypatch):
    """Sharded twin of test_queries_serve_during_rebuild: the heavy
    SPMD k-means+fill runs under the write gate but outside the state
    lock, so searches keep serving the old structure + exact tail while
    a threshold-crossing write re-clusters; a second writer is gated."""
    import threading

    from modular_rag_system_tpu.ops import kmeans as km_mod
    from modular_rag_system_tpu.parallel.mesh import make_index_mesh
    from modular_rag_system_tpu.parallel.sharded import ShardedIndex
    from tests.conftest import cpu_mesh_devices

    mesh = make_index_mesh(4, devices=cpu_mesh_devices(4))
    idx = ShardedIndex(dim=32, mesh=mesh, tier="ivf", block_rows=64,
                       ivf_clusters=8, ivf_nprobe=8, ivf_iters=3,
                       ivf_rebuild_min=64, ivf_fine_dtype="bf16")
    E = normalized(rng, 400, 32)
    idx.add(E)
    assert idx._ivf2 is not None and idx.ivf_rebuilds == 1

    build_started = threading.Event()
    release = threading.Event()
    orig = km_mod.kmeans_fit_sharded

    def slow_kmeans(*a, **k):
        build_started.set()
        assert release.wait(30), "test deadlock: release never set"
        return orig(*a, **k)

    monkeypatch.setattr(km_mod, "kmeans_fit_sharded", slow_kmeans)
    fresh = normalized(rng, 400, 32)
    writer = threading.Thread(target=idx.add, args=(fresh,), daemon=True)
    writer.start()
    assert build_started.wait(30), "rebuild never started"

    got = {}

    def reader():
        got["res"] = idx.search(E[:2], 3)

    r = threading.Thread(target=reader, daemon=True)
    r.start()
    r.join(30)
    assert not r.is_alive(), "search blocked behind an in-flight rebuild"
    _, rows = got["res"]
    assert rows[0, 0] == 0 and rows[1, 0] == 1

    w2_done = threading.Event()
    w2 = threading.Thread(
        target=lambda: (idx.delete_rows(np.asarray([5])), w2_done.set()),
        daemon=True)
    w2.start()
    assert not w2_done.wait(0.8), "writer ran during an in-flight rebuild"

    release.set()
    writer.join(120)
    w2.join(120)
    assert not writer.is_alive() and w2_done.is_set()
    assert idx.ivf_rebuilds == 2 and idx._ivf2.built == idx.count
    _, rows = idx.search(fresh[:1], 1)
    assert rows[0, 0] == 400
