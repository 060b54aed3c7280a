"""Two-pass binmax exact top-k: exactness vs the brute-force reference.

Replaces the reference search loop's correctness surface
(``ollama_rag_system.py:454-525``) for the redesigned kernel; everything
runs in interpret mode on the CPU mesh (conftest)."""

import jax.numpy as jnp
import numpy as np
import pytest

from modular_rag_system_tpu.ops.binmax_topk import twopass_topk, twopass_topk_raw
from modular_rag_system_tpu.ops.exact import exact_topk


def _mat(rng, n, d=384):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_twopass_matches_exact(rng, dtype):
    E = _mat(rng, 8192)
    Ej = jnp.asarray(E).astype(dtype)
    q = jnp.asarray(_mat(rng, 5))
    v2, i2 = twopass_topk(Ej, 8192, q, 10)
    ve, ie = exact_topk(Ej.astype(jnp.float32), jnp.int32(8192), q, 10)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(ve), atol=2e-3)


def test_twopass_partial_count_and_ties(rng):
    """Duplicate rows force score ties; smallest-id tie-break must hold,
    and rows past count (incl. inside the straddling bin) are invisible."""
    E = _mat(rng, 8192)
    E[100] = E[7]
    E[4000] = E[7]
    E[5001] = E[7]  # past count: must never appear
    count = 5001
    Ej = jnp.asarray(E).astype(jnp.bfloat16)
    q = jnp.asarray(E[7:8])
    v2, i2 = twopass_topk(Ej, count, q, 10)
    ve, ie = exact_topk(Ej.astype(jnp.float32), jnp.int32(count), q, 10)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ie))
    assert list(np.asarray(i2)[0][:3]) == [7, 100, 4000]
    assert 5001 not in np.asarray(i2)


def test_twopass_count_smaller_than_k(rng):
    """count < k: finite results only for live rows, -1 ids elsewhere."""
    E = _mat(rng, 8192)
    Ej = jnp.asarray(E)
    q = jnp.asarray(_mat(rng, 3))
    v2, i2 = twopass_topk(Ej, 4, q, 10)
    v2, i2 = np.asarray(v2), np.asarray(i2)
    assert np.all(np.isfinite(v2[:, :4]))
    assert np.all(i2[:, :4] < 4) and np.all(i2[:, :4] >= 0)
    assert np.all(~np.isfinite(v2[:, 4:]))
    assert np.all(i2[:, 4:] == -1)


def test_twopass_small_cap_falls_back(rng):
    """Below the two-pass threshold the wrapper delegates to the
    single-pass kernel with identical results."""
    E = _mat(rng, 2048)
    Ej = jnp.asarray(E)
    q = jnp.asarray(_mat(rng, 2))
    v2, i2 = twopass_topk(Ej, 2048, q, 5)
    ve, ie = exact_topk(Ej, jnp.int32(2048), q, 5)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ie))


def test_twopass_odd_query_count(rng):
    """Q not a multiple of the 128-lane pad: padded rows never leak."""
    E = _mat(rng, 8192)
    Ej = jnp.asarray(E).astype(jnp.bfloat16)
    q = jnp.asarray(_mat(rng, 7))
    v2, i2 = twopass_topk(Ej, 8192, q, 4)
    assert v2.shape == (7, 4) and i2.shape == (7, 4)
    ve, ie = exact_topk(Ej.astype(jnp.float32), jnp.int32(8192), q, 4)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ie))


def test_twopass_param_validation():
    E = jnp.zeros((8192, 64), jnp.float32)
    q = jnp.zeros((1, 64), jnp.float32)
    with pytest.raises(ValueError):
        twopass_topk_raw(E, jnp.int32(10), q, 5, 3000, 32, True)
    with pytest.raises(ValueError):
        twopass_topk_raw(E, jnp.int32(10), q, 5, 2048, 100, True)


def test_device_index_routes_twopass(rng):
    """tier='bf16' with no fused_bin_width uses the two-pass kernel and
    matches brute force at cap >= the routing threshold."""
    from modular_rag_system_tpu.index import DeviceIndex

    E = _mat(rng, 8192, 128)
    idx = DeviceIndex(dim=128, capacity=8192, tier="bf16",
                      store_dtype="bfloat16")
    idx.add(E)
    q = _mat(rng, 3, 128)
    sv, sr = idx.search(q, 10)
    Ej = jnp.asarray(E).astype(jnp.bfloat16).astype(jnp.float32)
    ve, ie = exact_topk(Ej, jnp.int32(8192), jnp.asarray(q), 10)
    np.testing.assert_array_equal(sr, np.asarray(ie))


def test_sharded_twopass_parity(rng):
    """Shards big enough for the two-pass path merge to the same results
    as a single exact index (ICI merge unchanged)."""
    from modular_rag_system_tpu.index import DeviceIndex
    from modular_rag_system_tpu.parallel.mesh import make_index_mesh
    from modular_rag_system_tpu.parallel.sharded import ShardedIndex
    from tests.conftest import cpu_mesh_devices

    mesh = make_index_mesh(2, devices=cpu_mesh_devices(2))
    E = _mat(rng, 16384, 64)
    sharded = ShardedIndex(dim=64, mesh=mesh, tier="bf16",
                           store_dtype="bfloat16")
    sharded.add(E)
    assert sharded.cap_s >= 8192  # actually exercises the two-pass branch
    single = DeviceIndex(dim=64, capacity=16384, tier="bf16",
                         store_dtype="bfloat16")
    single.add(E)
    q = _mat(rng, 4, 64)
    xv, xr = sharded.search(q, 10)
    sv, sr = single.search(q, 10)
    np.testing.assert_array_equal(xr, sr)
    np.testing.assert_allclose(xv, sv, rtol=1e-3, atol=2e-3)


def test_twopass_int8_matches_singlepass(rng):
    """int8 two-pass selects the same rows as the single-pass int8 kernel
    (identical quantized operands + tie-break)."""
    from modular_rag_system_tpu.ops.binmax_topk import twopass_topk_int8
    from modular_rag_system_tpu.ops.fused_topk import fused_topk_int8
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    E = _mat(rng, 8192)
    Ej = jnp.asarray(E)
    E_q, scales = quantize_rows(Ej)
    q = jnp.asarray(_mat(rng, 5))
    for count in (8192, 5001):
        v2, i2 = twopass_topk_int8(E_q, scales, count, q, 10)
        v1, i1 = fused_topk_int8(E_q, scales, count, q, 10, block_rows=1024)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                                   rtol=1e-3, atol=2e-3)


def test_twopass_int8_recall_vs_exact(rng):
    """Quantization-limited recall: top-10 of the int8 two-pass overlaps
    the exact f32 top-10 almost entirely."""
    from modular_rag_system_tpu.ops.binmax_topk import twopass_topk_int8
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    E = _mat(rng, 8192)
    Ej = jnp.asarray(E)
    E_q, scales = quantize_rows(Ej)
    q = jnp.asarray(_mat(rng, 8))
    v2, i2 = twopass_topk_int8(E_q, scales, 8192, q, 10)
    ve, ie = exact_topk(Ej, jnp.int32(8192), q, 10)
    i2n, ien = np.asarray(i2), np.asarray(ie)
    recall = np.mean([len(set(i2n[r]) & set(ien[r])) / 10
                      for r in range(i2n.shape[0])])
    assert recall >= 0.9


def test_device_index_int8_twopass_routing(rng):
    from modular_rag_system_tpu.index import DeviceIndex

    E = _mat(rng, 8192, 128)
    idx = DeviceIndex(dim=128, capacity=8192, tier="int8")
    idx.add(E)
    q = _mat(rng, 3, 128)
    sv, sr = idx.search(q, 10)
    Ej = jnp.asarray(E)
    ve, ie = exact_topk(Ej, jnp.int32(8192), jnp.asarray(q), 10)
    ien = np.asarray(ie)
    recall = np.mean([len(set(sr[r]) & set(ien[r])) / 10 for r in range(3)])
    assert recall >= 0.9


def test_sharded_int8_twopass_parity(rng):
    """Sharded int8 two-pass merges to the same rows as the single-device
    int8 two-pass (per-shard quantization is row-local, so shards agree)."""
    from modular_rag_system_tpu.index import DeviceIndex
    from modular_rag_system_tpu.parallel.mesh import make_index_mesh
    from modular_rag_system_tpu.parallel.sharded import ShardedIndex
    from tests.conftest import cpu_mesh_devices

    mesh = make_index_mesh(2, devices=cpu_mesh_devices(2))
    E = _mat(rng, 16384, 64)
    sharded = ShardedIndex(dim=64, mesh=mesh, tier="int8")
    sharded.add(E)
    assert sharded.cap_s >= 8192
    single = DeviceIndex(dim=64, capacity=16384, tier="int8")
    single.add(E)
    q = _mat(rng, 4, 64)
    xv, xr = sharded.search(q, 10)
    sv, sr = single.search(q, 10)
    np.testing.assert_array_equal(xr, sr)


def test_kernel_rescan_matches_slab_gather(rng):
    """The optional Pallas pass-2 returns the same ids as the default
    XLA slab gather (both exact, same tie-break)."""
    E = _mat(rng, 8192)
    E[100] = E[7]
    Ej = jnp.asarray(E).astype(jnp.bfloat16)
    q = jnp.asarray(_mat(rng, 4))
    import functools

    import jax

    from modular_rag_system_tpu.ops.binmax_topk import twopass_topk_raw

    mk = lambda kr: jax.jit(functools.partial(
        twopass_topk_raw, k=10, block_rows=2048, bin_width=32,
        interpret=True, kernel_rescan=kr))
    vk, ik = mk(True)(Ej, jnp.int32(5001), q)
    vs, is_ = mk(False)(Ej, jnp.int32(5001), q)
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(is_))
    np.testing.assert_allclose(np.asarray(vk), np.asarray(vs),
                               rtol=1e-3, atol=2e-3)


def test_select_bins_group_path_matches_direct(rng):
    """The three-level group/subgroup-pruned bin selection (taken when
    nb/_GROUP > kb+2) must reproduce direct lax.top_k's result including
    the lowest-bin-id tie order, even under mass ties that straddle the
    kb-th boundary across many groups/subgroups.  nb=16*_GROUP barely
    prunes at the group level; nb=80*_GROUP prunes hard at both levels."""
    import jax
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops.binmax_topk import _GROUP, select_bins

    for mult in (16, 80):
        Qp, nb, kb = 8, mult * _GROUP, 12
        bm = rng.standard_normal((Qp, nb)).astype(np.float32)
        # mass ties: quantize to a few levels so boundary ties are common
        bm = np.round(bm * 2) / 2
        got = np.asarray(select_bins(jnp.asarray(bm), kb))
        # direct reference with id tie-break: sort by (-value, id)
        for q in range(Qp):
            order = np.lexsort((np.arange(nb), -bm[q]))[:kb]
            np.testing.assert_array_equal(np.sort(got[q]), np.sort(order),
                                          err_msg=f"nb={nb} q={q}")


def test_twopass_group_selection_end_to_end(rng):
    """End-to-end twopass with a corpus large enough to take the group
    bin-selection path (nb = 8192 at bin_width=8) on duplicated rows."""
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops.binmax_topk import twopass_topk_raw
    from modular_rag_system_tpu.ops.fused_topk import _use_interpret

    cap, d, k = 65536, 32, 10
    base = rng.standard_normal((cap // 4, d)).astype(np.float32)
    E = np.tile(base, (4, 1))  # exact duplicates -> score ties
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    q = rng.standard_normal((4, d)).astype(np.float32)
    vals, ids = twopass_topk_raw(
        jnp.asarray(E, jnp.float32), jnp.int32(cap), jnp.asarray(q), k,
        2048, 8, _use_interpret())
    vals, ids = np.asarray(vals), np.asarray(ids)
    ref = q @ E.T
    for i in range(4):
        order = np.lexsort((np.arange(cap), -ref[i]))[:k]
        np.testing.assert_array_equal(ids[i], order)
        np.testing.assert_allclose(vals[i], ref[i][order], rtol=1e-5)


def test_twopass_int8_master_scores_exact(rng):
    """Mixed path (r3.2): int8 pass-1 selects bins, pass-2 rescans the
    MASTER — returned scores must be bit-identical to the exact kernel's
    for every hit, and recall near-exact on well-separated data."""
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops.binmax_topk import (
        twopass_topk_int8_master_raw,
    )
    from modular_rag_system_tpu.ops.fused_topk import _use_interpret
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    E = _mat(rng, 8192)
    Ej = jnp.asarray(E)
    E_q, scales = quantize_rows(Ej)
    q = jnp.asarray(_mat(rng, 5))
    for count in (8192, 5001):
        v, i = twopass_topk_int8_master_raw(
            E_q, scales.reshape(-1), Ej, jnp.int32(count), q, 10, 2048,
            32, _use_interpret())
        ve, ie = exact_topk(Ej, jnp.int32(count), q, 10)
        vn, inn = np.asarray(v), np.asarray(i)
        ven, ien = np.asarray(ve), np.asarray(ie)
        for r in range(5):
            hits = set(inn[r]) & set(ien[r])
            assert len(hits) >= 9  # coverage-bound, near-exact here
            # master-exact similarity for every returned row
            ref = {int(ien[r][j]): ven[r][j] for j in range(10)}
            for j in range(10):
                if int(inn[r][j]) in ref:
                    np.testing.assert_allclose(
                        vn[r][j], ref[int(inn[r][j])], rtol=0, atol=0)


def test_device_index_int8_uses_master_scores(rng):
    """The int8 TIER returns master-precision similarities (not int8
    approximations): scores of returned rows match the exact tier's."""
    from modular_rag_system_tpu.index import DeviceIndex

    E = _mat(rng, 8192, 128)
    idx = DeviceIndex(dim=128, capacity=8192, tier="int8")
    idx.add(E)
    q = _mat(rng, 3, 128)
    sv, sr = idx.search(q, 5)
    ref = q @ E.T
    for r in range(3):
        np.testing.assert_allclose(
            sv[r], ref[r][sr[r]], rtol=1e-5, atol=1e-5)


def test_twopass_chunked_large_batch_matches_exact(rng):
    """Q > _CHUNK_Q batches split into in-trace lax.map chunks
    (r3.3); results must equal the exact reference row for row, and a
    Q whose 128-lane pad does NOT divide into chunks must take the
    unchunked path with identical results."""
    from modular_rag_system_tpu.ops.binmax_topk import _CHUNK_Q

    E = _mat(rng, 8192, 64)
    E[77] = E[7]  # a tie crossing chunk boundaries must stay stable
    Ej = jnp.asarray(E).astype(jnp.bfloat16)
    count = 8000
    ve, ie = exact_topk(Ej.astype(jnp.float32), jnp.int32(count),
                        jnp.asarray(_mat(rng, 1, 64)), 10)  # warm shapes

    for Q in (2 * _CHUNK_Q, 300):  # 512 chunks; 300 pads to 384 (no)
        q = _mat(rng, Q, 64)
        q[Q - 1] = E[7]  # tie query in the LAST chunk
        qj = jnp.asarray(q)
        v2, i2 = twopass_topk_raw(Ej, jnp.int32(count), qj, 10, 2048, 32,
                                  True)
        # reference must score the same bf16-rounded query pass-2 uses
        qr = qj.astype(jnp.bfloat16).astype(jnp.float32)
        ve, ie = exact_topk(Ej.astype(jnp.float32), jnp.int32(count),
                            qr, 10)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ie),
                                      err_msg=f"Q={Q}")
        assert list(np.asarray(i2)[Q - 1][:2]) == [7, 77]


def test_twopass_int8_master_chunked_matches_unchunked(rng):
    """The int8 mixed (master-rescore) path agrees chunked vs unchunked:
    Q=512 run whole must equal the two Q=256 halves stacked."""
    from modular_rag_system_tpu.ops.binmax_topk import (
        _CHUNK_Q,
        twopass_topk_int8_master_raw,
    )
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    E = _mat(rng, 8192, 64)
    Em = jnp.asarray(E).astype(jnp.bfloat16)
    E_q, scales = quantize_rows(jnp.asarray(E))
    q = _mat(rng, 2 * _CHUNK_Q, 64)
    qj = jnp.asarray(q)
    run = lambda qq: twopass_topk_int8_master_raw(
        E_q, scales, Em, jnp.int32(8192), qq, 10, 2048, 32, True)
    v_all, i_all = run(qj)
    for h in range(2):
        vh, ih = run(qj[h * _CHUNK_Q:(h + 1) * _CHUNK_Q])
        np.testing.assert_array_equal(
            np.asarray(i_all)[h * _CHUNK_Q:(h + 1) * _CHUNK_Q],
            np.asarray(ih), err_msg=f"half={h}")


def test_select_bins_distinct_when_live_bins_scarce(rng):
    """r3.10: with fewer live bins than kb, every selection stage must
    still return DISTINCT bin ids (the dead-bin ramp in _mask_bins) —
    a duplicated live bin would duplicate real rows in pass 2.  Covers
    both the grouped path (nb//_GROUP > kb+2) and the flat fallback."""
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops import binmax_topk as bt

    kb = 14
    for nb in (4096, 512):  # grouped (32 groups > kb+2) and fallback
        binmax = jnp.asarray(
            rng.standard_normal((8, nb)).astype(np.float32))
        for count in (1, 33, 64 * 3 + 7):  # 1..3 live bins at bw=64
            bm = bt._mask_bins(binmax, jnp.int32(count), nb, 64)
            bins = np.asarray(bt.select_bins(bm, kb))
            for r in range(bins.shape[0]):
                assert len(set(bins[r].tolist())) == kb, (nb, count)
            # the straddle/live bins must always be selected
            live = set(range((count + 63) // 64))
            for r in range(bins.shape[0]):
                assert live <= set(bins[r].tolist()), (nb, count)


def test_refine_masks_padded_candidates(rng):
    """kf > live-count: the fused int8 kernel pads its candidate tail
    with id 0 at -inf.  refine_against_master(cand_vals=...) must mask
    those slots instead of rescoring them to row 0's REAL master score
    (which duplicated row 0 in the output — caught by the round-5
    hybrid fused-parity run at count == k)."""
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops.binmax_topk import refine_against_master

    E = rng.standard_normal((8, 32)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    q = jnp.asarray(E[:1])
    # candidate list as the kernel emits it at count=4, kf=8: live ids
    # then id-0 padding at -inf
    rows = jnp.asarray([[0, 3, 1, 2, 0, 0, 0, 0]], jnp.int32)
    vals = jnp.asarray([[0.9, 0.2, 0.1, 0.05,
                         -np.inf, -np.inf, -np.inf, -np.inf]], jnp.float32)
    out_vals, out_rows = refine_against_master(
        jnp.asarray(E), q, rows, 6, cand_vals=vals)
    got = np.asarray(out_rows)[0]
    live = got[got >= 0]
    assert len(set(live.tolist())) == len(live), got
    assert set(live.tolist()) == {0, 1, 2, 3}
    # without the mask the bug reproduces: row 0 appears twice
    bad_vals, bad_rows = refine_against_master(jnp.asarray(E), q, rows, 6)
    assert len(set(np.asarray(bad_rows)[0].tolist())) < 6


def test_device_index_int8_no_duplicates_at_k_equals_count(rng):
    """End-to-end regression: int8 tier at k == count must return each
    live row at most once (both the host search and the fused core)."""
    import jax
    import jax.numpy as jnp

    from modular_rag_system_tpu.index import DeviceIndex

    for dim in (64, 448):
        E = rng.standard_normal((6, dim)).astype(np.float32)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        idx = DeviceIndex(dim=dim, capacity=64, tier="int8")
        idx.add(E)
        q = E[:1]
        s, r = idx.search(q, 6)
        live = np.asarray(r)[0]
        live = live[live >= 0]
        assert len(set(live.tolist())) == len(live), live
        core = idx.search_core(6)
        vals, rid = jax.jit(core)(idx.search_ops(), idx.count_device(),
                                  jnp.asarray(q))
        live = np.asarray(rid)[0]
        live = live[live >= 0]
        assert len(set(live.tolist())) == len(live), live
