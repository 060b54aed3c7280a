"""DeviceIndex exact tier vs numpy brute force."""

import numpy as np
import pytest

from modular_rag_system_tpu.index import DeviceIndex


def normalized(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def brute_topk(E, q, k):
    scores = q @ E.T
    idx = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_exact_matches_numpy(rng):
    E = normalized(rng, 500, 64)
    q = normalized(rng, 7, 64)
    idx = DeviceIndex(dim=64, capacity=512)
    idx.add(E)
    scores, rows = idx.search(q, 10)
    ref_scores, ref_rows = brute_topk(E, q, 10)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(rows, ref_rows)


def test_append_growth(rng):
    idx = DeviceIndex(dim=32, capacity=1024)
    total = 0
    all_rows = []
    for n in (100, 900, 1500):  # forces capacity doubling
        mat = normalized(rng, n, 32)
        first, added = idx.add(mat)
        assert first == total and added == n
        total += n
        all_rows.append(mat)
    assert idx.count == 2500
    assert idx.capacity >= 2500
    E = np.concatenate(all_rows)
    q = normalized(rng, 3, 32)
    scores, rows = idx.search(q, 5)
    ref_scores, ref_rows = brute_topk(E, q, 5)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(rows, ref_rows)


def test_mask_beyond_count(rng):
    idx = DeviceIndex(dim=16, capacity=1024)
    idx.add(normalized(rng, 3, 16))
    scores, rows = idx.search(normalized(rng, 1, 16), 3)
    assert (rows < 3).all() and (rows >= 0).all()


def test_k_larger_than_count_pads(rng):
    idx = DeviceIndex(dim=16)
    idx.add(normalized(rng, 4, 16))
    scores, rows = idx.search(normalized(rng, 2, 16), 10)
    assert scores.shape == (2, 10)
    assert (rows[:, 4:] == -1).all()
    assert np.isneginf(scores[:, 4:]).all()


def test_empty_index(rng):
    idx = DeviceIndex(dim=16)
    scores, rows = idx.search(normalized(rng, 2, 16), 5)
    assert (rows == -1).all()


def test_delete_rows_zeroed(rng):
    E = normalized(rng, 10, 16)
    idx = DeviceIndex(dim=16)
    idx.add(E)
    # query exactly equal to row 4 -> top hit is row 4
    _, rows = idx.search(E[4:5], 1)
    assert rows[0, 0] == 4
    idx.delete_rows(np.array([4]))
    scores, rows = idx.search(E[4:5], 1)
    assert rows[0, 0] != 4


def test_snapshot_roundtrip(rng, tmp_path):
    E = normalized(rng, 50, 24)
    idx = DeviceIndex(dim=24)
    idx.add(E)
    p = str(tmp_path / "snap.npz")
    idx.snapshot(p)
    idx2 = DeviceIndex.load(p)
    assert idx2.count == 50
    q = normalized(rng, 2, 24)
    np.testing.assert_allclose(idx.search(q, 5)[0], idx2.search(q, 5)[0], rtol=1e-5)


def test_dim_mismatch_raises(rng):
    idx = DeviceIndex(dim=16)
    with pytest.raises(ValueError):
        idx.add(normalized(rng, 3, 8))


def test_bf16_store_dtype(rng):
    """bf16 master matrix: half memory, all tiers work, near-exact recall."""
    E = normalized(rng, 2000, 64)
    q = normalized(rng, 8, 64)
    f32 = DeviceIndex(dim=64, tier="exact")
    f32.add(E)
    _, ref = f32.search(q, 10)
    for tier in ("exact", "fused", "bf16", "int8"):
        idx = DeviceIndex(dim=64, tier=tier, block_rows=256,
                          store_dtype="bfloat16")
        idx.add(E)
        _, got = idx.search(q, 10)
        recall = np.mean([len(set(ref[i]) & set(got[i])) / 10 for i in range(8)])
        assert recall >= 0.9, (tier, recall)
    assert idx.memory_bytes() < f32.memory_bytes()
    # snapshot interchange: bf16 store loads back into an f32 index
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "s.npz")
    idx.snapshot(p)
    back = DeviceIndex.load(p)
    assert back.count == 2000


def test_bad_store_dtype_rejected():
    with pytest.raises(ValueError, match="store_dtype"):
        DeviceIndex(dim=16, store_dtype="int4")


def test_derived_tiers_update_incrementally(rng):
    """VERDICT r1 item 7: after the first build, an add of B rows costs
    O(B) derived-tier work (no full requantization), and results match a
    freshly-built index exactly."""
    from modular_rag_system_tpu.index import DeviceIndex

    E = rng.standard_normal((600, 32)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    q = E[:4]

    for tier in ("int8", "bf16"):
        idx = DeviceIndex(dim=32, capacity=4096, tier=tier)
        idx.add(E[:500])
        idx.search(q, 5)  # triggers the one full build
        assert idx.derived_rebuilds == 1
        base_incr = idx.derived_incremental_rows
        idx.add(E[500:])  # 100 rows -> pads to 128
        assert idx.derived_rebuilds == 1  # no rebuild
        assert 0 < idx.derived_incremental_rows - base_incr <= 128
        idx.delete_rows(np.array([3]))
        idx.set_rows(np.array([7]), E[7:8] * 0.5)
        assert idx.derived_rebuilds == 1

        fresh = DeviceIndex(dim=32, capacity=4096, tier=tier)
        fresh.add(E)
        fresh.delete_rows(np.array([3]))
        fresh.set_rows(np.array([7]), E[7:8] * 0.5)
        sv, sr = fresh.search(q, 5)
        iv, ir = idx.search(q, 5)
        np.testing.assert_array_equal(ir, sr)
        np.testing.assert_allclose(iv, sv, atol=1e-6)
        # capacity growth drops the copies for a lazy rebuild
        idx.add(rng.standard_normal((8000, 32)).astype(np.float32))
        idx.search(q, 5)
        assert idx.derived_rebuilds == 2


def test_int8_tier_returns_master_exact_scores(rng):
    """The int8 tier over-selects by quantized score then rescores the
    candidates against the master matrix: returned similarities match
    the exact tier's on the same rows, and recall@10 improves over the
    raw int8 ranking."""
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops.binmax_topk import twopass_topk_int8
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    n, d, k = 20000, 64, 10
    E = rng.standard_normal((n, d)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    q = rng.standard_normal((16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    exact = DeviceIndex(dim=d, tier="exact")
    exact.add(E)
    ev, er = exact.search(q, k)

    idx = DeviceIndex(dim=d, tier="int8")
    idx.add(E)
    iv, ir = idx.search(q, k)

    # raw (un-refined) int8 kernel ranking for comparison
    E_q, scales = quantize_rows(jnp.asarray(E[:idx.capacity]))
    rv, rr = twopass_topk_int8(idx._E_q, idx._scales, jnp.int32(n),
                               jnp.asarray(q), k, block_rows=4096)
    rr = np.asarray(rr)

    def recall(rows):
        return np.mean([len(set(er[i]) & set(rows[i])) / k
                        for i in range(len(q))])

    assert recall(ir) >= recall(rr) - 1e-9
    # scores are master-exact: wherever refined rows coincide with the
    # exact tier's rows, scores must agree to f32-accumulation tolerance
    for i in range(len(q)):
        common = set(er[i]) & set(ir[i])
        for r in common:
            a = ev[i][list(er[i]).index(r)]
            b = iv[i][list(ir[i]).index(r)]
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------------ auto tier
def test_auto_tier_serves_int8_below_crossover(rng):
    E = normalized(rng, 600, 64)
    q = normalized(rng, 5, 64)
    idx = DeviceIndex(dim=64, capacity=1024, tier="auto")
    idx.add(E)
    assert idx.effective_tier() == "int8"
    assert idx._ivf2 is None  # no ANN build below the crossover
    scores, rows = idx.search(q, 10)
    ref_scores, ref_rows = brute_topk(E, q, 10)
    np.testing.assert_array_equal(rows, ref_rows)  # int8 mixed is master-exact
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-5)


def test_auto_tier_promotes_to_ivf_at_crossover(rng):
    """Crossing _AUTO_IVF_ROWS on the write path must build the ANN
    structure and serve ivf — searches stay correct through the switch."""
    E = normalized(rng, 1500, 32)
    q = normalized(rng, 4, 32)
    idx = DeviceIndex(dim=32, capacity=2048, tier="auto",
                      ivf_clusters=8, ivf_nprobe=8, ivf_rebuild_min=64)
    idx._AUTO_IVF_ROWS = 1000  # instance override for a testable scale
    idx.add(E[:900])
    assert idx.effective_tier() == "int8"
    s1, r1 = idx.search(q, 10)
    np.testing.assert_array_equal(r1, brute_topk(E[:900], q, 10)[1])
    idx.add(E[900:])  # crosses the threshold -> write-path promotion
    assert idx.effective_tier() == "ivf"
    assert idx._ivf2 is not None  # built from add(), not from a query
    s2, r2 = idx.search(q, 10)
    # nprobe == n_clusters: every cluster probed -> exact results
    np.testing.assert_array_equal(r2, brute_topk(E, q, 10)[1])
    tok = idx.search_token()
    assert tok[0] == "ivf"  # promotion mints new search programs


def test_device_load_full_knob_passthrough(rng, tmp_path):
    """DeviceIndex.load forwards EVERY constructor knob (round-3 review
    finding 4: ivf_fine_dtype/ivf_tail_frac/ivf_rebuild_min dropped)."""
    idx = DeviceIndex(dim=24)
    idx.add(normalized(rng, 40, 24))
    p = str(tmp_path / "knobs.npz")
    idx.snapshot(p)
    back = DeviceIndex.load(
        p, tier="ivf", block_rows=128, fused_bin_width=128,
        ivf_clusters=4, ivf_nprobe=2, ivf_iters=3, ivf_fine_dtype="int8",
        ivf_tail_frac=0.5, ivf_rebuild_min=9, ivf_balance=1.25,
    )
    assert back.ivf_fine_dtype == "int8"
    assert back.ivf_tail_frac == 0.5
    assert back.ivf_rebuild_min == 9
    assert back.ivf_balance == 1.25
    assert back.block_rows == 128
    assert back.count == 40
