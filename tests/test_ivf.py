"""k-means + IVF tier: build correctness and recall/nprobe behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from modular_rag_system_tpu.index import DeviceIndex
from modular_rag_system_tpu.ops.kmeans import init_centroids_from_rows, kmeans_fit


def normalized(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def clustered_corpus(rng, n_clusters=16, per=200, d=64, spread=0.15):
    """Ground-truth clustered data: centers + small noise."""
    centers = normalized(rng, n_clusters, d)
    rows = []
    for c in centers:
        pts = c[None, :] + spread * rng.standard_normal((per, d)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        rows.append(pts)
    return np.concatenate(rows), centers


def test_kmeans_recovers_clusters(rng):
    E, centers = clustered_corpus(rng)
    n = E.shape[0]
    init = init_centroids_from_rows(E, n, 16)
    cents, labels = kmeans_fit(jnp.asarray(E), jnp.int32(n), jnp.asarray(init), iters=10, batch=1024)
    cents, labels = np.asarray(cents), np.asarray(labels)
    # every learned centroid should be close to one true center
    sims = cents @ centers.T
    assert (sims.max(axis=1) > 0.9).mean() > 0.7
    # labels are contiguous within ground-truth clusters most of the time
    assert labels.min() >= 0
    # same ground-truth cluster -> mostly same label
    agree = [np.bincount(labels[i * 200 : (i + 1) * 200]).max() / 200 for i in range(16)]
    assert np.mean(agree) > 0.8


def test_kmeans_masks_dead_rows(rng):
    E = np.zeros((512, 32), np.float32)
    live = normalized(rng, 100, 32)
    E[:100] = live
    init = init_centroids_from_rows(live, 100, 8)
    cents, labels = kmeans_fit(jnp.asarray(E), jnp.int32(100), jnp.asarray(init), iters=5, batch=128)
    labels = np.asarray(labels)
    assert (labels[100:] == -1).all()
    assert (labels[:100] >= 0).all()


def _ivf2_search(ivf, E_master, q, k, nprobe):
    """Direct IVF2 core search helper for tests."""
    import functools

    import jax

    from modular_rag_system_tpu.ops.ivf2 import ivf2_search_core

    U = 4
    L = ivf.slots_for_nprobe(nprobe)
    L = ((L + U - 1) // U) * U
    sc3 = (ivf.scales3 if ivf.scales3 is not None
           else jnp.zeros((1, 1), jnp.float32))
    core = jax.jit(functools.partial(
        ivf2_search_core, k=k, nprobe=nprobe, L=L, tail_max=0, U=U,
        interpret=True))
    cnt = jnp.int32(ivf.built)
    return core(E_master, ivf.E_c3, sc3, ivf.perm, ivf.centroids,
                ivf.blk_start, ivf.nblk, ivf.counts, cnt, cnt,
                jnp.asarray(q))


def test_ivf2_full_probe_equals_exact(rng):
    """nprobe == n_clusters must give exact results (master-rescored)."""
    from modular_rag_system_tpu.ops.ivf2 import IVF2

    E = normalized(rng, 1000, 64)
    q = normalized(rng, 5, 64)
    Ej = jnp.asarray(E)
    ivf = IVF2.build(Ej, 1000, n_clusters=8, iters=5, fine_dtype="bf16")
    vals, rows = _ivf2_search(ivf, Ej, q, 10, 8)
    scores = q @ E.T
    ref_rows = np.argsort(-scores, axis=1)[:, :10]
    ref_vals = np.take_along_axis(scores, ref_rows, axis=1)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-4, atol=1e-5)
    # same set (order can differ only on exact ties)
    for i in range(5):
        assert set(np.asarray(rows)[i]) == set(ref_rows[i])


def test_ivf2_recall_grows_with_nprobe(rng):
    from modular_rag_system_tpu.ops.ivf2 import IVF2

    E, _ = clustered_corpus(rng, n_clusters=32, per=100, d=64)
    n = E.shape[0]
    q = normalized(rng, 20, 64)
    Ej = jnp.asarray(E)
    ivf = IVF2.build(Ej, n, n_clusters=32, iters=8, fine_dtype="bf16")
    scores = q @ E.T
    ref = np.argsort(-scores, axis=1)[:, :10]
    _, got = _ivf2_search(ivf, Ej, q, 10, 4)
    got = np.asarray(got)
    recall = np.mean([len(set(ref[i]) & set(got[i])) / 10 for i in range(20)])
    assert recall >= 0.6, f"ivf2 recall@10 nprobe=4: {recall}"
    _, got16 = _ivf2_search(ivf, Ej, q, 10, 16)
    got16 = np.asarray(got16)
    recall16 = np.mean([len(set(ref[i]) & set(got16[i])) / 10 for i in range(20)])
    assert recall16 >= recall


def test_ivf_device_index_tier(rng):
    E = normalized(rng, 2000, 64)
    idx = DeviceIndex(dim=64, tier="ivf", ivf_clusters=16, ivf_nprobe=16,
                      ivf_rebuild_min=64, ivf_fine_dtype="bf16")
    idx.add(E)
    assert idx._ivf2 is not None  # built from the write path
    q = normalized(rng, 3, 64)
    scores, rows = idx.search(q, 5)
    assert rows.shape == (3, 5)
    assert (rows >= 0).all() and (rows < 2000).all()
    # full nprobe -> matches exact tier (refine stage rescores against
    # the master, so scores are master-exact too)
    exact = DeviceIndex(dim=64, tier="exact")
    exact.add(E)
    ref_scores, ref_rows = exact.search(q, 5)
    for i in range(3):
        assert set(rows[i]) == set(ref_rows[i])
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5, atol=1e-5)


def test_ivf_below_threshold_is_exact(rng):
    """Small corpora never build: the ivf tier serves the exact stream."""
    E = normalized(rng, 500, 32)
    idx = DeviceIndex(dim=32, tier="ivf", ivf_clusters=8)
    idx.add(E)
    assert idx._ivf2 is None and idx.ivf_rebuilds == 0
    q = normalized(rng, 2, 32)
    _, rows = idx.search(q, 5)
    exact = DeviceIndex(dim=32, tier="exact")
    exact.add(E)
    _, ref = exact.search(q, 5)
    np.testing.assert_array_equal(rows, ref)


def test_ivf_incremental_append_serves_tail_exactly(rng):
    """VERDICT r2 item 2: a write must NOT invalidate the build — fresh
    rows are served from the exact tail until a threshold rebuild."""
    idx = DeviceIndex(dim=32, tier="ivf", ivf_clusters=8, ivf_nprobe=8,
                      ivf_rebuild_min=256, ivf_fine_dtype="bf16")
    idx.add(normalized(rng, 500, 32))
    assert idx.ivf_rebuilds == 1
    built_obj = idx._ivf2
    # many small appends below the threshold: O(batch) work, no rebuild
    fresh = normalized(rng, 40, 32)
    for i in range(4):
        idx.add(fresh[i * 10 : (i + 1) * 10])
    assert idx._ivf2 is built_obj and idx.ivf_rebuilds == 1
    assert idx._ivf2.built == 500  # tail = [500, 540)
    # a tail row is retrieved exactly (self-retrieval at rank 1)
    q = fresh[:3]
    scores, rows = idx.search(q, 3)
    for i in range(3):
        assert rows[i, 0] == 500 + i
        assert scores[i, 0] > 0.99
    # crossing the threshold triggers a rebuild from the write path
    idx.add(normalized(rng, 300, 32))
    assert idx.ivf_rebuilds == 2
    assert idx._ivf2.built == idx.count


def test_ivf_delete_and_resurrect_sync_fine_copy(rng):
    idx = DeviceIndex(dim=32, tier="ivf", ivf_clusters=8, ivf_nprobe=8,
                      ivf_rebuild_min=128, ivf_fine_dtype="bf16")
    E = normalized(rng, 400, 32)
    idx.add(E)
    assert idx._ivf2 is not None
    q = E[:2]
    _, rows = idx.search(q, 1)
    assert rows[0, 0] == 0 and rows[1, 0] == 1
    # delete row 0: its fine-copy slot must be zeroed (O(batch) scatter)
    idx.delete_rows(np.asarray([0]))
    scores, rows = idx.search(q[:1], 1)
    assert rows[0, 0] != 0 or scores[0, 0] < 0.5
    # resurrect with new content
    idx.set_rows(np.asarray([0]), q[:1])
    _, rows = idx.search(q[:1], 1)
    assert rows[0, 0] == 0
    assert idx._ivf2.stale_rows >= 2


def test_ivf2_perm_covers_every_row_once(rng):
    """Skewed data: the contiguous layout stores every row exactly once
    in its TRUE cluster (no overflow displacement — the r2 recall
    ceiling is structurally gone)."""
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops.ivf2 import IVF2

    d = 32
    hot = normalized(rng, 1, d)
    rest = normalized(rng, 8, d)
    E = np.concatenate([
        (hot + 0.01 * rng.standard_normal((900, d))).astype(np.float32),
        (rest[rng.integers(0, 8, 100)] + 0.01 * rng.standard_normal((100, d))).astype(np.float32),
    ])
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    ivf = IVF2.build(jnp.asarray(E), 1000, n_clusters=16, iters=6,
                     fine_dtype="bf16")
    perm = np.asarray(ivf.perm)
    live = perm[perm >= 0]
    assert sorted(live.tolist()) == list(range(1000))
    inv = np.asarray(ivf.inv_perm)
    assert (perm[inv[:1000]] == np.arange(1000)).all()
    # hot-cluster rows keep their true assignment: self-retrieval exact
    idx = DeviceIndex(dim=d, tier="ivf", ivf_clusters=16, ivf_nprobe=16,
                      ivf_rebuild_min=64, ivf_fine_dtype="bf16")
    idx.add(E)
    _, got = idx.search(E[:5], 5)
    for i in range(5):
        assert i in got[i]




def test_ivf_refine_extra_knob(rng):
    """ivf_refine_extra=0 (throughput point: fine top-k = k, no
    over-selection) searches correctly; the knob keys the program cache
    so a live change recompiles instead of serving the stale width."""
    E = normalized(rng, 2000, 64)
    idx = DeviceIndex(dim=64, tier="ivf", ivf_clusters=16, ivf_nprobe=16,
                      ivf_rebuild_min=64, ivf_fine_dtype="bf16",
                      ivf_refine_extra=0)
    idx.add(E)
    q = normalized(rng, 3, 64)
    scores, rows = idx.search(q, 5)
    assert rows.shape == (3, 5) and (rows >= 0).all()
    # full-nprobe coverage with extra=0 still finds the true top rows on
    # this small corpus (candidates = fine top-5 of every probed cluster)
    exact = DeviceIndex(dim=64, tier="exact")
    exact.add(E)
    _, ref_rows = exact.search(q, 5)
    hits = np.mean([len(set(rows[i]) & set(ref_rows[i])) / 5
                    for i in range(3)])
    assert hits >= 0.6
    tok0 = idx.search_token()
    idx.ivf_refine_extra = 10
    assert idx.search_token() != tok0


def test_ivf_update_only_drift_triggers_rebuild(rng):
    """set_rows/delete_rows count as drift and re-fire the rebuild
    threshold even with NO appends: a re-embedding workload must not
    leave rows in clusters chosen for their old values forever."""
    E = normalized(rng, 1024, 32)
    idx = DeviceIndex(dim=32, tier="ivf", ivf_clusters=8, ivf_nprobe=1,
                      ivf_rebuild_min=64, ivf_tail_frac=0.1,
                      ivf_fine_dtype="bf16")
    idx.add(E)
    assert idx._ivf2 is not None
    builds0 = idx.ivf_rebuilds
    # overwrite a third of the corpus in place, batch by batch — drift
    # alone (no adds) must eventually cross max(64, 0.1 * 1024) = 103
    moved = normalized(rng, 384, 32)
    for lo in range(0, 384, 48):
        rows = np.arange(lo, lo + 48)
        idx.set_rows(rows, moved[lo:lo + 48])
    assert idx.ivf_rebuilds > builds0, "update-only drift never rebuilt"
    # after the rebuild the moved rows live in their TRUE clusters:
    # nprobe=1 retrieval of a moved row's new value finds it
    _, got = idx.search(moved[:8], 1)
    np.testing.assert_array_equal(got[:, 0], np.arange(8))


def test_ivf2_build_padding_is_bounded(rng):
    """The chunked fill pads the fine copy to a chunk multiple, but the
    chunk clamps to the corpus size: a small build must not allocate the
    1024-block (200 MB at d=384) maximum."""
    from modular_rag_system_tpu.ops.ivf2 import SLAB, IVF2

    E = jnp.asarray(normalized(rng, 3000, 32))
    iv = IVF2.build(E, 3000, n_clusters=8, iters=2, nprobe=8)
    nblocks = iv.E_c3.shape[0]
    # 3000 rows over 8 clusters need ~8-20 SLAB-row blocks; padding may
    # at most double that — nowhere near the 1024-block ceiling
    assert nblocks <= 64, f"fine copy over-padded: {nblocks} blocks"
    assert iv.E_c3.shape[1] == SLAB


@pytest.mark.slow
def test_fine_dump_matches_selecting_kernel(rng):
    """r3.5 score-dump fine stage (raw scores streamed to HBM + one
    positional ``lax.top_k``) must return identical candidate ids to
    the selecting kernel, including the lowest-slot-id tie order."""
    import jax

    from modular_rag_system_tpu.ops.ivf2 import (
        IVF2,
        block_lists,
        fine_call,
        fine_call_auto,
    )

    d, N, C = 64, 6144, 6
    E = jnp.asarray(normalized(rng, N, d))
    for fdt in ("bf16", "int8", "int4"):
        iv = IVF2.build(E, N, n_clusters=C, iters=3, nprobe=C,
                        fine_dtype=fdt)
        q = jnp.asarray(normalized(rng, 8, d))
        _, probes = jax.lax.top_k(jnp.dot(q, iv.centroids.T), C)
        L = ((int(np.asarray(iv.nblk).sum()) + 3) // 4) * 4
        blk, vcnt = block_lists(probes, iv.blk_start, iv.nblk, iv.counts, L)
        kf = 8
        kb = ((kf + 2 + 3) // 4) * 4
        assert L - kb >= 8, "corpus too small to exercise the two-pass path"
        v1, s1 = fine_call(iv.E_c3, iv.scales3, q, blk, vcnt, kf, 4, True)
        v2, s2 = fine_call_auto(iv.E_c3, iv.scales3, q, blk, vcnt, kf, 4,
                                True)
        # candidate IDS are identical; values may differ by accumulation
        # order between the in-kernel dot and the XLA einsum (<= 1 ulp —
        # harmless: the search core rescores candidates on the master)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=0, atol=1e-6)


def test_ivf_balance_splits_oversized_clusters(rng):
    """ivf_balance > 0: clusters past balance*avg rows are LBG-split
    (jittered centroid copies + short Lloyd re-run), shrinking the fine
    stage's worst-case block budget without hurting retrieval."""
    d, N = 32, 4096
    centers = normalized(rng, 16, d)
    w = np.ones(16); w[:2] = 12.0; w /= w.sum()
    assign = rng.choice(16, N, p=w)
    E = centers[assign] + 0.05 * rng.standard_normal((N, d)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    plain = DeviceIndex(dim=d, tier="ivf", ivf_clusters=8, ivf_nprobe=2,
                        ivf_rebuild_min=64, ivf_fine_dtype="bf16")
    plain.add(E)
    bal = DeviceIndex(dim=d, tier="ivf", ivf_clusters=8, ivf_nprobe=2,
                      ivf_rebuild_min=64, ivf_fine_dtype="bf16",
                      ivf_balance=1.5)
    bal.add(E)
    assert bal._ivf2.n_clusters > plain._ivf2.n_clusters
    assert int(np.asarray(bal._ivf2.counts).max()) < int(
        np.asarray(plain._ivf2.counts).max())
    # self-retrieval still exact at modest nprobe
    _, got = bal.search(E[:16], 1)
    np.testing.assert_array_equal(got[:, 0], np.arange(16))


def test_sharded_ivf_balance(rng):
    from modular_rag_system_tpu.parallel.mesh import make_index_mesh
    from modular_rag_system_tpu.parallel.sharded import ShardedIndex
    from tests.conftest import cpu_mesh_devices

    d, N = 32, 4096
    centers = normalized(rng, 16, d)
    w = np.ones(16); w[:2] = 12.0; w /= w.sum()
    assign = rng.choice(16, N, p=w)
    E = centers[assign] + 0.05 * rng.standard_normal((N, d)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    mesh = make_index_mesh(4, devices=cpu_mesh_devices(4))
    idx = ShardedIndex(dim=d, mesh=mesh, tier="ivf", block_rows=64,
                       ivf_clusters=8, ivf_nprobe=2, ivf_iters=4,
                       ivf_rebuild_min=64, ivf_fine_dtype="bf16",
                       ivf_balance=1.5)
    idx.add(E)
    assert idx._ivf2 is not None
    assert idx._ivf2.centroids.shape[0] > 8  # splits happened
    _, got = idx.search(E[:16], 1)
    np.testing.assert_array_equal(got[:, 0], np.arange(16))


def test_ivf_large_query_batch(rng):
    """Q past the kernels' 256-query chunk boundary: the score-dump fine
    stage's grid and score buffer scale with Q directly; results must
    match a small-batch search row for row."""
    E = normalized(rng, 2048, 32)
    idx = DeviceIndex(dim=32, tier="ivf", ivf_clusters=8, ivf_nprobe=8,
                      ivf_rebuild_min=64, ivf_fine_dtype="bf16")
    idx.add(E)
    q = E[:300]  # pads past 256; queries ARE corpus rows
    s_big, r_big = idx.search(q, 5)
    s_small, r_small = idx.search(q[:37], 5)
    np.testing.assert_array_equal(r_big[:37], r_small)
    np.testing.assert_allclose(s_big[:37], s_small, rtol=1e-6, atol=1e-6)
    # self-retrieval across the whole batch
    np.testing.assert_array_equal(r_big[:, 0], np.arange(300))


def test_dump_path_guard_bounds_per_query_vmem():
    """fine_call_auto must reject configs whose PER-QUERY score row
    exceeds the VMEM budget even when the total buffer is tiny (round-3
    review finding 2: a deep-nprobe single-query config passed the
    total-bytes cap but failed Mosaic lowering)."""
    from modular_rag_system_tpu.ops.ivf2 import (
        _DUMP_VMEM_BYTES,
        SLAB,
        _use_dump,
    )

    ok_L = _DUMP_VMEM_BYTES // (SLAB * 4)
    assert _use_dump(1, ok_L)
    assert not _use_dump(1, ok_L * 2)  # tiny total, oversized per-query row
    assert not _use_dump(4096, 8192)  # oversized total


def test_int4_pack_roundtrip(rng):
    """quantize_int4_blocks/unpack_int4_blocks invert each other to
    4-bit precision; zero rows stay exactly dead (scale 0)."""
    from modular_rag_system_tpu.ops.quantize import (
        quantize_int4_blocks,
        unpack_int4_blocks,
    )

    x = rng.standard_normal((4 * 8, 6)).astype(np.float32)
    x[3] = 0.0
    p, s = quantize_int4_blocks(jnp.asarray(x), 4, 8)
    assert p.shape == (4, 4, 6) and p.dtype == jnp.int8
    y = np.asarray(unpack_int4_blocks(p, s)).reshape(32, 6)
    scale = np.abs(x).max(1, keepdims=True) / 7.0
    safe = np.where(scale > 0, scale, 1.0)
    ref = np.clip(np.round(x / safe), -7, 7) * scale
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-6)
    assert (y[3] == 0).all()


def test_ivf_int4_tier_full_probe_matches_exact(rng):
    """int4 fine copy: 4-bit scores only rank candidates — at full
    probe with the default over-selection on clustered data the master
    rescore returns the exact tier's rows and scores."""
    E, _ = clustered_corpus(rng, n_clusters=8, per=250, d=64)
    n = E.shape[0]
    idx = DeviceIndex(dim=64, tier="ivf", ivf_clusters=8, ivf_nprobe=8,
                      ivf_rebuild_min=64, ivf_fine_dtype="int4")
    idx.add(E)
    assert idx._ivf2 is not None and idx._ivf2.fine_dtype == "int4"
    # packed storage: half the sublanes of the int8 copy
    from modular_rag_system_tpu.ops.ivf2 import SLAB

    assert idx._ivf2.E_c3.shape[1] == SLAB // 2
    assert idx._ivf2.E_c3.dtype == jnp.int8
    q = normalized(rng, 4, 64) * 0.3 + E[:4] * 0.7
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scores, rows = idx.search(q, 5)
    exact = DeviceIndex(dim=64, tier="exact")
    exact.add(E)
    ref_scores, ref_rows = exact.search(q, 5)
    for i in range(4):
        assert set(rows[i]) == set(ref_rows[i])
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5, atol=1e-5)


def test_ivf_int4_delete_and_resurrect_sync_fine_copy(rng):
    """The two-phase nibble RMW scatter: deletes zero ONE nibble without
    clobbering the packed partner row; resurrection restores it."""
    idx = DeviceIndex(dim=32, tier="ivf", ivf_clusters=8, ivf_nprobe=8,
                      ivf_rebuild_min=128, ivf_fine_dtype="int4")
    E = normalized(rng, 400, 32)
    idx.add(E)
    assert idx._ivf2 is not None
    q = E[:2]
    _, rows = idx.search(q, 1)
    assert rows[0, 0] == 0 and rows[1, 0] == 1
    idx.delete_rows(np.asarray([0]))
    scores, rows = idx.search(q[:1], 1)
    assert rows[0, 0] != 0 or scores[0, 0] < 0.5
    # the packed PARTNER of row 0's slot must still be retrievable: the
    # nibble RMW may not zero the whole byte.  Find the partner row via
    # the inverse perm (slot +- SLAB//2 within the same block).
    from modular_rag_system_tpu.ops.ivf2 import SLAB

    iv = idx._ivf2
    slot0 = int(np.asarray(iv.inv_perm)[0])
    partner_slot = slot0 + (SLAB // 2 if slot0 % SLAB < SLAB // 2
                            else -(SLAB // 2))
    partner = int(np.asarray(iv.perm)[partner_slot])
    if partner >= 0:
        _, prow = idx.search(E[partner : partner + 1], 1)
        assert prow[0, 0] == partner
    # resurrect with new content
    idx.set_rows(np.asarray([0]), q[:1])
    _, rows = idx.search(q[:1], 1)
    assert rows[0, 0] == 0


def test_sharded_ivf_int4(rng):
    from modular_rag_system_tpu.parallel.mesh import make_index_mesh
    from modular_rag_system_tpu.parallel.sharded import ShardedIndex
    from tests.conftest import cpu_mesh_devices

    E, _ = clustered_corpus(rng, n_clusters=16, per=256, d=32)
    mesh = make_index_mesh(4, devices=cpu_mesh_devices(4))
    idx = ShardedIndex(dim=32, mesh=mesh, tier="ivf", block_rows=64,
                       ivf_clusters=8, ivf_nprobe=8, ivf_iters=4,
                       ivf_rebuild_min=64, ivf_fine_dtype="int4")
    idx.add(E)
    assert idx._ivf2 is not None and idx._ivf2.fine_dtype == "int4"
    _, got = idx.search(E[:16], 1)
    np.testing.assert_array_equal(got[:, 0], np.arange(16))
    # sharded nibble scatter: delete + resurrect
    idx.delete_rows(np.asarray([3]))
    s, got = idx.search(E[3:4], 1)
    assert got[0, 0] != 3 or s[0, 0] < 0.5
    idx.set_rows(np.asarray([3]), E[3:4])
    _, got = idx.search(E[3:4], 1)
    assert got[0, 0] == 3


def test_ivf_snapshot_warmstart_skips_kmeans(rng, tmp_path, monkeypatch):
    """snapshot() persists centroids + labels; load() rebuilds the ivf
    structure WITHOUT re-running k-means, and the restored index returns
    the exact same results."""
    import modular_rag_system_tpu.ops.ivf2 as ivf2_mod

    E, _ = clustered_corpus(rng, n_clusters=8, per=200, d=32)
    kw = dict(ivf_clusters=8, ivf_nprobe=8, ivf_rebuild_min=64,
              ivf_fine_dtype="int8")
    idx = DeviceIndex(dim=32, tier="ivf", **kw)
    idx.add(E)
    assert idx._ivf2 is not None
    q = normalized(rng, 4, 32)
    ref_s, ref_r = idx.search(q, 5)
    path = str(tmp_path / "snap.npz")
    idx.snapshot(path)

    def boom(*a, **k):
        raise AssertionError("k-means must not run on warm-start restore")

    monkeypatch.setattr(ivf2_mod, "kmeans_fit", boom)
    idx2 = DeviceIndex.load(path, tier="ivf", **kw)
    assert idx2._ivf2 is not None and idx2._ivf2.built == idx._ivf2.built
    np.testing.assert_array_equal(np.asarray(idx2._ivf2.centroids),
                                  np.asarray(idx._ivf2.centroids))
    s2, r2 = idx2.search(q, 5)
    np.testing.assert_array_equal(r2, ref_r)
    np.testing.assert_allclose(s2, ref_s, rtol=1e-5, atol=1e-6)
    # warm start is single-use: a later threshold rebuild re-clusters
    assert idx2.ivf_warmstart is None


def test_ivf_labels_host_roundtrip(rng):
    """labels_host() inverts the contiguous layout: rebuilding from the
    reconstructed labels reproduces the structure bit-for-bit."""
    from modular_rag_system_tpu.ops.ivf2 import IVF2

    E, _ = clustered_corpus(rng, n_clusters=8, per=100, d=32)
    n = E.shape[0]
    Ej = jnp.asarray(E)
    iv = IVF2.build(Ej, n, n_clusters=8, iters=5, fine_dtype="int4")
    labels = iv.labels_host()
    assert labels.shape == (n,) and (labels >= 0).all()
    iv2 = IVF2.build(Ej, n, fine_dtype="int4",
                     warm_start=(np.asarray(iv.centroids), labels))
    np.testing.assert_array_equal(np.asarray(iv2.perm), np.asarray(iv.perm))
    np.testing.assert_array_equal(np.asarray(iv2.E_c3),
                                  np.asarray(iv.E_c3))
    np.testing.assert_array_equal(np.asarray(iv2.counts),
                                  np.asarray(iv.counts))


def test_sharded_ivf_snapshot_warmstart(rng, tmp_path, monkeypatch):
    import modular_rag_system_tpu.parallel.sharded as sh_mod
    from modular_rag_system_tpu.ops import kmeans as km_mod
    from modular_rag_system_tpu.parallel.mesh import make_index_mesh
    from modular_rag_system_tpu.parallel.sharded import ShardedIndex
    from tests.conftest import cpu_mesh_devices

    E, _ = clustered_corpus(rng, n_clusters=16, per=256, d=32)
    kw = dict(block_rows=64, ivf_clusters=8, ivf_nprobe=8, ivf_iters=4,
              ivf_rebuild_min=64, ivf_fine_dtype="int8")
    mesh = make_index_mesh(4, devices=cpu_mesh_devices(4))
    idx = ShardedIndex(dim=32, mesh=mesh, tier="ivf", **kw)
    idx.add(E)
    assert idx._ivf2 is not None
    q = normalized(rng, 4, 32)
    ref_s, ref_r = idx.search(q, 5)
    path = str(tmp_path / "snap.npz")
    idx.snapshot(path)

    def boom(*a, **k):
        raise AssertionError("k-means must not run on warm-start restore")

    monkeypatch.setattr(km_mod, "kmeans_fit_sharded", boom)
    monkeypatch.setattr(sh_mod, "kmeans_fit_sharded", boom, raising=False)
    idx2 = ShardedIndex.load(path, mesh=mesh, tier="ivf", **kw)
    assert idx2._ivf2 is not None and idx2._ivf2.built == idx._ivf2.built
    s2, r2 = idx2.search(q, 5)
    np.testing.assert_array_equal(r2, ref_r)
    np.testing.assert_allclose(s2, ref_s, rtol=1e-5, atol=1e-6)


def test_queries_serve_during_rebuild(rng, monkeypatch):
    """The write-path rebuild must NOT block readers (review r3.9): the
    heavy k-means+fill runs under the write gate but outside the state
    lock, so searches keep serving the old structure + exact tail while
    a threshold-crossing write re-clusters (~60 s at 10M on chip).
    Writers ARE gated for the duration (E donation safety)."""
    import threading

    import modular_rag_system_tpu.ops.ivf2 as ivf2_mod

    idx = DeviceIndex(dim=32, tier="ivf", ivf_clusters=8, ivf_nprobe=8,
                      ivf_rebuild_min=64, ivf_fine_dtype="bf16")
    E = normalized(rng, 400, 32)
    idx.add(E)
    assert idx._ivf2 is not None and idx.ivf_rebuilds == 1

    build_started = threading.Event()
    release = threading.Event()
    orig = ivf2_mod.kmeans_fit

    def slow_kmeans(*a, **k):
        build_started.set()
        assert release.wait(30), "test deadlock: release never set"
        return orig(*a, **k)

    monkeypatch.setattr(ivf2_mod, "kmeans_fit", slow_kmeans)
    fresh = normalized(rng, 400, 32)
    writer = threading.Thread(target=idx.add, args=(fresh,), daemon=True)
    writer.start()
    assert build_started.wait(30), "rebuild never started"

    # a reader must complete WHILE the rebuild is blocked in k-means
    got = {}

    def reader():
        got["res"] = idx.search(E[:2], 3)

    r = threading.Thread(target=reader, daemon=True)
    r.start()
    r.join(20)
    assert not r.is_alive(), "search blocked behind an in-flight rebuild"
    _, rows = got["res"]
    assert rows[0, 0] == 0 and rows[1, 0] == 1  # old structure still serves

    # a second writer must be GATED until the build finishes
    w2_done = threading.Event()
    w2 = threading.Thread(
        target=lambda: (idx.delete_rows(np.asarray([5])), w2_done.set()),
        daemon=True)
    w2.start()
    assert not w2_done.wait(0.8), "writer ran during an in-flight rebuild"

    release.set()
    writer.join(60)
    w2.join(60)
    assert not writer.is_alive() and w2_done.is_set()
    assert idx.ivf_rebuilds == 2 and idx._ivf2.built == idx.count
    s, rows = idx.search(fresh[:1], 1)
    assert rows[0, 0] == 400


def test_iter_topk_matches_lax_topk_with_ties():
    """r3.10 iterative-argmax selection must reproduce ``lax.top_k``
    exactly — descending values, ties by lowest index, -inf exhaustion
    — on a buffer crafted to hit every edge: duplicate values inside
    and across block boundaries, a row with fewer finite lanes than k,
    and an all--inf row."""
    import jax

    from modular_rag_system_tpu.ops.ivf2 import _iter_topk

    n, kk = 96, 12
    rows = []
    rng_l = np.random.default_rng(7)
    base = rng_l.standard_normal(n).astype(np.float32)
    rows.append(base)  # generic
    tied = base.copy()
    tied[10:30] = 1.5  # 20-way tie straddling kk
    rows.append(tied)
    sparse = np.full(n, -np.inf, np.float32)
    sparse[[3, 40, 77]] = [0.5, 0.9, 0.1]  # fewer finite than kk
    rows.append(sparse)
    rows.append(np.full(n, -np.inf, np.float32))  # exhausted
    flat = jnp.asarray(np.stack(rows))

    rv, rp = jax.jit(lambda f: jax.lax.top_k(f, kk))(flat)
    iv_, ip_ = jax.jit(lambda f: _iter_topk(f, kk))(flat)
    rv, rp, iv_, ip_ = map(np.asarray, (rv, rp, iv_, ip_))
    np.testing.assert_array_equal(iv_, rv)
    # positions must agree wherever the value is finite (top_k's own
    # -inf tail order is unspecified; the caller maps non-finite to -1)
    finite = np.isfinite(rv)
    np.testing.assert_array_equal(ip_[finite], rp[finite])


def test_auto_u_padding_rule():
    """auto_u prefers 8 tiles/step only when rounding L up to 8 adds no
    padding DMAs over rounding to 4."""
    from modular_rag_system_tpu.ops.ivf2 import auto_u

    for L, want in ((8, 8), (16, 8), (13, 8), (15, 8), (5, 8), (6, 8),
                    (7, 8), (9, 4), (10, 4), (12, 4), (17, 4), (20, 4),
                    (1, 4), (4, 4)):
        got = auto_u(L)
        assert got == want, (L, got, want)
        # the rule's invariant, not just the table: equal padded L
        if got == 8:
            assert -(-L // 8) * 8 == -(-L // 4) * 4


def test_dump_selection_dispatch_boundary(rng):
    """fine_call_xla must return identical (vals, slots) on both sides
    of the _ITER_SELECT_MAX dispatch boundary for the same inputs."""
    import jax

    import modular_rag_system_tpu.ops.ivf2 as iv2
    from modular_rag_system_tpu.ops.ivf2 import (
        IVF2, block_lists, fine_call_xla)

    d, N, C = 64, 4096, 4
    E = jnp.asarray(normalized(rng, N, d))
    iv = IVF2.build(E, N, n_clusters=C, iters=3, nprobe=C,
                    fine_dtype="int8")
    q = jnp.asarray(normalized(rng, 4, d))
    _, probes = jax.lax.top_k(jnp.dot(q, iv.centroids.T), C)
    L = ((int(np.asarray(iv.nblk).sum()) + 3) // 4) * 4
    blk, vcnt = block_lists(probes, iv.blk_start, iv.nblk, iv.counts, L)
    kf = 24
    v_iter, s_iter = fine_call_xla(iv.E_c3, iv.scales3, q, blk, vcnt,
                                   kf, 4, True)
    orig = iv2._ITER_SELECT_MAX
    try:
        iv2._ITER_SELECT_MAX = 0  # force the top_k branch
        v_tk, s_tk = fine_call_xla(iv.E_c3, iv.scales3, q, blk, vcnt,
                                   kf, 4, True)
    finally:
        iv2._ITER_SELECT_MAX = orig
    np.testing.assert_array_equal(np.asarray(s_iter), np.asarray(s_tk))
    np.testing.assert_allclose(np.asarray(v_iter), np.asarray(v_tk),
                               rtol=0, atol=0)


def test_warmstart_rejects_out_of_range_labels(rng, caplog):
    """Corrupt snapshot labels (values outside [0, C)) must NOT produce a
    silently wrong clustering — build falls back to cold k-means
    (ADVICE r3)."""
    import logging

    from modular_rag_system_tpu.ops.ivf2 import IVF2

    E, _ = clustered_corpus(rng, n_clusters=8, per=100, d=32)
    n = E.shape[0]
    Ej = jnp.asarray(E)
    iv = IVF2.build(Ej, n, n_clusters=8, iters=5, fine_dtype="bf16")
    bad = iv.labels_host()
    bad[0] = iv.n_clusters + 7  # out of range
    with caplog.at_level(logging.WARNING):
        iv2 = IVF2.build(Ej, n, n_clusters=8, iters=5, fine_dtype="bf16",
                         warm_start=(np.asarray(iv.centroids), bad))
    assert "out of range" in caplog.text
    # the cold rebuild is still a valid structure over every row
    perm = np.asarray(iv2.perm)
    got = np.sort(perm[perm >= 0])
    np.testing.assert_array_equal(got, np.arange(n))


def test_int4_update_rows_requires_block_cluster(rng):
    """A bare-constructed int4 IVF2 (no block_cluster) must fail loudly
    in update_rows, not with an opaque TypeError inside the jitted
    scatter (ADVICE r3)."""
    import pytest

    from modular_rag_system_tpu.ops.ivf2 import IVF2

    E = jnp.asarray(normalized(rng, 512, 32))
    iv = IVF2.build(E, 512, n_clusters=4, iters=3, fine_dtype="int4")
    bare = IVF2(iv.centroids, iv.E_c3, iv.scales3, iv.perm, iv.inv_perm,
                iv.blk_start, iv.nblk, iv.counts, iv.built, iv.nprobe,
                "int4")  # block_cluster defaults to None
    with pytest.raises(ValueError, match="block_cluster"):
        bare.update_rows(np.asarray([0]), normalized(rng, 1, 32))


def test_int4_default_refine_budget_guard(rng, monkeypatch):
    """The pool-proportional int4 over-selection must refuse configs
    whose master rescore gather exceeds the budget instead of silently
    OOMing (ADVICE r3, medium)."""
    import pytest

    import modular_rag_system_tpu.ops.ivf2 as iv2
    from modular_rag_system_tpu.ops.ivf2 import IVF2, ivf2_search_core

    E = jnp.asarray(normalized(rng, 1024, 32))
    iv = IVF2.build(E, 1024, n_clusters=4, iters=3, fine_dtype="int4")
    q = jnp.asarray(normalized(rng, 4, 32))
    L = iv.slots_for_nprobe(4)
    L = ((L + 3) // 4) * 4
    monkeypatch.setattr(iv2, "_RESCORE_MAX_BYTES", 1024)
    with pytest.raises(ValueError, match="master rescore"):
        ivf2_search_core(
            E, iv.E_c3, iv.scales3, iv.perm, iv.centroids, iv.blk_start,
            iv.nblk, iv.counts, jnp.int32(1024), jnp.int32(1024), q,
            k=10, nprobe=4, L=L, tail_max=0, interpret=True)
    # an EXPLICIT refine_extra overrides the default's budget check
    vals, rows = ivf2_search_core(
        E, iv.E_c3, iv.scales3, iv.perm, iv.centroids, iv.blk_start,
        iv.nblk, iv.counts, jnp.int32(1024), jnp.int32(1024), q,
        k=10, nprobe=4, L=L, tail_max=0, interpret=True,
        refine_extra=100)
    assert np.asarray(rows).shape == (4, 10)
