"""k-means + IVF tier: build correctness and recall/nprobe behavior."""

import jax.numpy as jnp
import numpy as np

from modular_rag_system_tpu.index import DeviceIndex
from modular_rag_system_tpu.ops.ivf import IVFIndex
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


def test_ivf_full_probe_equals_exact(rng):
    """nprobe == n_clusters must give exact results."""
    E = normalized(rng, 1000, 64)
    q = normalized(rng, 5, 64)
    ivf = IVFIndex.build(jnp.asarray(E), 1000, n_clusters=8, iters=5)
    vals, rows = ivf.search(jnp.asarray(q), 10, nprobe=8)
    scores = q @ E.T
    ref_rows = np.argsort(-scores, axis=1)[:, :10]
    ref_vals = np.take_along_axis(scores, ref_rows, axis=1)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-4, atol=1e-5)
    # same set (order can differ only on exact ties)
    for i in range(5):
        assert set(np.asarray(rows)[i]) == set(ref_rows[i])


def test_ivf_recall_reasonable_at_low_nprobe(rng):
    E, _ = clustered_corpus(rng, n_clusters=32, per=100, d=64)
    n = E.shape[0]
    q = normalized(rng, 20, 64)
    ivf = IVFIndex.build(jnp.asarray(E), n, n_clusters=32, iters=8)
    scores = q @ E.T
    ref = np.argsort(-scores, axis=1)[:, :10]
    _, got = ivf.search(jnp.asarray(q), 10, nprobe=4)
    got = np.asarray(got)
    recall = np.mean([len(set(ref[i]) & set(got[i])) / 10 for i in range(20)])
    assert recall >= 0.6, f"ivf recall@10 nprobe=4: {recall}"
    # recall grows with nprobe
    _, got16 = ivf.search(jnp.asarray(q), 10, nprobe=16)
    got16 = np.asarray(got16)
    recall16 = np.mean([len(set(ref[i]) & set(got16[i])) / 10 for i in range(20)])
    assert recall16 >= recall


def test_ivf_device_index_tier(rng):
    E = normalized(rng, 2000, 64)
    idx = DeviceIndex(dim=64, tier="ivf", ivf_clusters=16, ivf_nprobe=16)
    idx.add(E)
    q = normalized(rng, 3, 64)
    scores, rows = idx.search(q, 5)
    assert rows.shape == (3, 5)
    assert (rows >= 0).all() and (rows < 2000).all()
    # full nprobe -> matches exact tier
    exact = DeviceIndex(dim=64, tier="exact")
    exact.add(E)
    _, ref_rows = exact.search(q, 5)
    for i in range(3):
        assert set(rows[i]) == set(ref_rows[i])


def test_ivf_rebuild_after_append(rng):
    idx = DeviceIndex(dim=32, tier="ivf", ivf_clusters=8, ivf_nprobe=8)
    idx.add(normalized(rng, 500, 32))
    q = normalized(rng, 1, 32)
    idx.search(q, 5)
    assert idx._ivf is not None
    idx.add(normalized(rng, 100, 32))
    assert idx._ivf is None  # invalidated
    _, rows = idx.search(q, 5)
    assert (rows < 600).all()


def test_ivf_bucket_padding(rng):
    E = normalized(rng, 100, 32)
    ivf = IVFIndex.build(jnp.asarray(E), 100, n_clusters=4, iters=4)
    b = np.asarray(ivf.bucket_ids)
    # all live rows appear exactly once; padding is -1
    members = b[b >= 0]
    assert sorted(members.tolist()) == list(range(100))


def test_ivf_bucket_cap_bounds_skew(rng):
    """Adversarial skew: most rows near one center. The padded table must
    stay bounded and every row must appear exactly once."""
    import jax.numpy as jnp

    d = 32
    hot = normalized(rng, 1, d)
    rest = normalized(rng, 8, d)
    E = np.concatenate([
        (hot + 0.01 * rng.standard_normal((900, d))).astype(np.float32),
        (rest[rng.integers(0, 8, 100)] + 0.01 * rng.standard_normal((100, d))).astype(np.float32),
    ])
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    ivf = IVFIndex.build(jnp.asarray(E), 1000, n_clusters=16, iters=6)
    b = np.asarray(ivf.bucket_ids)
    # cap = pow2(ceil(4 * 1000 / 16)) = 256, NOT the 900-row hot cluster
    assert ivf.bucket_cap <= 256
    members = b[b >= 0]
    assert sorted(members.tolist()) == list(range(1000))
    # displaced rows are still findable with a broad probe
    q = jnp.asarray(E[:5])
    _, got = ivf.search(q, 5, nprobe=16)
    got = np.asarray(got)
    for i in range(5):
        assert i in got[i]  # self-retrieval survives rebalancing
