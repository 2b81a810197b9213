"""Clustering tests: recover known blob structure; FINCH partitions sane."""

import numpy as np
import jax.numpy as jnp
from sklearn.metrics import normalized_mutual_info_score

from video_similarity_search_tpu.cluster import FINCH, fit_cluster, kmeans

RNG = np.random.default_rng(3)


def _blobs(n_per=30, n_blobs=4, d=8, spread=0.05):
    # centers on the unit sphere so cosine methods (and the reference's
    # L2-normalize-then-kmeans preprocessing) see well-separated blobs
    centers = RNG.normal(size=(n_blobs, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts, labels = [], []
    for i, c in enumerate(centers):
        pts.append(c + RNG.normal(size=(n_per, d)) * spread)
        labels += [i] * n_per
    idx = RNG.permutation(n_per * n_blobs)
    return np.concatenate(pts)[idx].astype(np.float32), np.array(labels)[idx]


def test_kmeans_recovers_blobs():
    import jax
    x, y = _blobs()
    labels, inertia = kmeans(x, k=4, key=jax.random.key(0), n_init=4,
                             max_iter=25)
    assert normalized_mutual_info_score(y, np.asarray(labels)) > 0.99
    assert float(inertia) >= 0


def test_spherical_kmeans_runs():
    import jax
    x, y = _blobs()
    labels, _ = kmeans(x, k=4, key=jax.random.key(0), n_init=2, max_iter=20,
                       spherical=True)
    assert normalized_mutual_info_score(y, np.asarray(labels)) > 0.9


def test_finch_partitions():
    x, y = _blobs(n_per=25, n_blobs=4)
    c, num_clust, req_c = FINCH(x, distance="cosine", verbose=False)
    assert c.shape[0] == x.shape[0]
    assert len(num_clust) == c.shape[1]
    # partitions strictly coarsen
    assert all(a > b for a, b in zip(num_clust, num_clust[1:]))
    # some partition should recover the blobs well
    scores = [normalized_mutual_info_score(y, c[:, p])
              for p in range(c.shape[1])]
    assert max(scores) > 0.9


def test_finch_req_clust():
    x, y = _blobs(n_per=20, n_blobs=5)
    c, num_clust, req_c = FINCH(x, req_clust=3, distance="cosine",
                                verbose=False)
    assert req_c is not None
    assert len(np.unique(req_c)) == 3


def test_fit_cluster_dispatch():
    x, y = _blobs(n_per=20, n_blobs=3)
    for method in ("kmeans", "finch", "Agglomerative", "DBSCAN"):
        labels = fit_cluster(x, method=method, k=3, verbose=False)
        assert labels.shape == (x.shape[0],)
        if method == "kmeans":
            assert normalized_mutual_info_score(y, labels) > 0.95
        elif method == "finch":
            # partition 0 is the finest first-neighbor partition (~N/3
            # clusters); require purity, not coarse agreement
            from sklearn.metrics import homogeneity_score
            assert homogeneity_score(y, labels) > 0.95


def test_finch_sparse_level0_matches_dense(monkeypatch):
    """The large-first-level path (Pallas/tiled 1-NN + ops/cc pointer-
    jumping CC) must produce the same level-0 PARTITION as the dense
    adjacency path — shared-first-neighbor edges are implied by the CC of
    the directed 1-NN graph (i—nn(i)—j connects i,j with nn(i)==nn(j)).
    Exercised at 240k x 128 on the real chip (PERF.md round-4: FINCH full
    hierarchy 4.4 s warm, 3.4x past the reference's 70k exact-search cap,
    clustering/finch.py:19); here the threshold is patched down so the
    sparse path runs in the CPU suite and is checked against dense."""
    from video_similarity_search_tpu.cluster import finch as finch_mod

    x, y = _blobs(n_per=120, n_blobs=6)  # 720 points > patched threshold
    labels_dense = np.asarray(
        finch_mod._dense_level(jnp.asarray(x), 0.0, metric="cosine",
                               use_min_sim=False)[0])
    monkeypatch.setattr(finch_mod, "DENSE_THRESHOLD", 100)
    labels_sparse = np.asarray(
        finch_mod._sparse_level0(jnp.asarray(x), "cosine")[0])
    # identical partitions up to relabeling
    from sklearn.metrics import normalized_mutual_info_score as nmi
    assert nmi(labels_dense, labels_sparse) == 1.0
    # the full FINCH through the sparse level-0 still recovers the blobs
    c, num_clust, _ = finch_mod.FINCH(x, verbose=False)
    scores = [normalized_mutual_info_score(y, c[:, p])
              for p in range(c.shape[1])]
    assert max(scores) > 0.9
