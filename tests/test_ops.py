"""ops kernels vs numpy/scipy oracles."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import connected_components as scipy_cc
from sklearn.metrics.pairwise import cosine_distances, euclidean_distances

from video_similarity_search_tpu.ops import (
    connected_components, nearest_neighbor, pairwise_distance, segment_mean,
    topk_neighbors,
)

RNG = np.random.default_rng(0)


def test_pairwise_cosine_matches_sklearn():
    x = RNG.normal(size=(37, 16)).astype(np.float32)
    y = RNG.normal(size=(23, 16)).astype(np.float32)
    got = np.asarray(pairwise_distance(x, y, "cosine"))
    np.testing.assert_allclose(got, cosine_distances(x, y), atol=1e-5)


def test_pairwise_euclidean_matches_sklearn():
    x = RNG.normal(size=(17, 8)).astype(np.float32)
    got = np.asarray(pairwise_distance(x, x, "euclidean"))
    # dot-product formulation: fp32 cancellation ~1e-3 at this scale
    np.testing.assert_allclose(got, euclidean_distances(x, x), atol=2e-3)


def test_self_mask_diag_inf():
    x = RNG.normal(size=(9, 4)).astype(np.float32)
    d = np.asarray(pairwise_distance(x, metric="cosine", self_mask=True))
    assert np.all(np.isinf(np.diag(d)))


def test_nearest_neighbor_matches_bruteforce():
    x = RNG.normal(size=(300, 12)).astype(np.float32)
    idx, dist = nearest_neighbor(x, metric="cosine", tile=64)
    d = cosine_distances(x, x)
    np.fill_diagonal(d, np.inf)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))
    np.testing.assert_allclose(np.asarray(dist), d.min(1), atol=1e-5)


def test_nearest_neighbor_euclidean_cross():
    x = RNG.normal(size=(50, 6)).astype(np.float32)
    y = RNG.normal(size=(80, 6)).astype(np.float32)
    idx, _ = nearest_neighbor(x, y, metric="euclidean", tile=16)
    d = euclidean_distances(x, y)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))


def test_topk_matches_argsort():
    q = RNG.normal(size=(40, 10)).astype(np.float32)
    bank = RNG.normal(size=(200, 10)).astype(np.float32)
    idx, vals = topk_neighbors(q, bank, k=5, metric="cosine", tile=16)
    d = cosine_distances(q, bank)
    expect = np.argsort(d, axis=1, kind="stable")[:, :5]
    # compare by distance value (ties can reorder indices)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(d, expect, 1), atol=1e-5
    )
    assert np.mean(np.asarray(idx) == expect) > 0.99


def test_topk_exclude_self():
    x = RNG.normal(size=(30, 8)).astype(np.float32)
    idx, _ = topk_neighbors(x, x, k=3, metric="cosine", exclude_self=True,
                            tile=16)
    assert not np.any(np.asarray(idx) == np.arange(30)[:, None])


def test_segment_mean_matches_numpy():
    data = RNG.normal(size=(100, 7)).astype(np.float32)
    labels = RNG.integers(0, 10, size=100)
    got = np.asarray(segment_mean(data, labels, 10))
    for s in range(10):
        m = labels == s
        if m.any():
            np.testing.assert_allclose(got[s], data[m].mean(0), atol=1e-5)


def test_connected_components_matches_scipy():
    # random first-neighbor graph like FINCH builds
    for n in (10, 257):
        nn_idx = RNG.integers(0, n, size=n)
        nn_idx[nn_idx == np.arange(n)] = (nn_idx[nn_idx == np.arange(n)] + 1) % n
        labels = np.asarray(connected_components(nn_idx.astype(np.int32)))
        rows = np.arange(n)
        a = sp.coo_matrix((np.ones(n), (rows, nn_idx)), shape=(n, n))
        a = a + a.T
        n_comp, expect = scipy_cc(a, directed=False)
        # same partition (ids may differ)
        assert len(np.unique(labels)) == n_comp
        for comp in range(n_comp):
            ours = labels[expect == comp]
            assert len(np.unique(ours)) == 1


def test_pallas_nn_matches_jnp_interpret():
    """The Pallas fused 1-NN kernel (interpret mode on CPU) matches the
    jnp tiled nearest_neighbor on cosine metric, including self-exclusion
    and non-multiple-of-tile sizes."""
    import jax
    import numpy as np

    from video_similarity_search_tpu.ops.pallas_knn import \
        nearest_neighbor_fused
    from video_similarity_search_tpu.ops.pdist import nearest_neighbor

    rng = np.random.default_rng(0)
    x = rng.normal(size=(37, 16)).astype(np.float32)
    idx_ref, d_ref = nearest_neighbor(jax.numpy.asarray(x), metric="cosine",
                                      exclude_self=True)
    idx_p, d_p = nearest_neighbor_fused(x, exclude_self=True, tile_m=8,
                                        tile_n=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref), atol=1e-5)

    # cross-bank query (no self-exclusion)
    y = rng.normal(size=(53, 16)).astype(np.float32)
    idx_ref, _ = nearest_neighbor(jax.numpy.asarray(x), jax.numpy.asarray(y),
                                  metric="cosine", exclude_self=False)
    idx_p, _ = nearest_neighbor_fused(x, y, exclude_self=False, tile_m=8,
                                      tile_n=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_ref))


def test_topk_neighbors_wide_bank_exact_and_approx():
    """Wide-bank retrieval: the exact path must match the numpy oracle
    exactly (as a set; ties may reorder), and the ``approx=True`` path
    (TPU approx_min_k, 8.5x at 240k rows on v5e — PERF.md round 4) must
    return near-identical neighbor sets (exact on the CPU backend, which
    lowers approx_min_k to a full sort)."""
    rng = np.random.default_rng(0)
    q = rng.normal(size=(9, 8)).astype(np.float32)
    bank = rng.normal(size=(8323, 8)).astype(np.float32)
    idx, vals = topk_neighbors(jnp.asarray(q), jnp.asarray(bank), 17,
                               metric="cosine")
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    bn = bank / np.linalg.norm(bank, axis=1, keepdims=True)
    d = 1 - qn @ bn.T
    ref = np.argsort(d, axis=1)[:, :17]
    for r in range(q.shape[0]):
        assert set(np.asarray(idx)[r]) == set(ref[r])
        np.testing.assert_allclose(np.sort(d[r, ref[r]]),
                                   np.sort(np.asarray(vals)[r]),
                                   rtol=2e-4, atol=2e-4)

    aidx, _ = topk_neighbors(jnp.asarray(q), jnp.asarray(bank), 17,
                             metric="cosine", approx=True)
    recall = np.mean([len(set(np.asarray(aidx)[r]) & set(ref[r])) / 17
                      for r in range(q.shape[0])])
    assert recall >= 0.9


def test_compact_labels_sparse_components():
    """Regression: with C < N/2 components the old -1 pad left
    jnp.unique's output unsorted (pads append AFTER the sorted prefix)
    and searchsorted mapped EVERY label to N."""
    from video_similarity_search_tpu.ops import compact_labels

    labels = jnp.asarray([5, 5, 2, 2, 2, 5, 2, 2], jnp.int32)
    dense, num = compact_labels(labels)
    assert int(num) == 2
    np.testing.assert_array_equal(np.asarray(dense),
                                  [1, 1, 0, 0, 0, 1, 0, 0])
    # dense relabeling preserves the partition
    big = jnp.asarray(RNG.integers(0, 7, size=257) * 1000, jnp.int32)
    dense, num = compact_labels(big)
    assert int(num) == len(np.unique(np.asarray(big)))
    assert int(jnp.max(dense)) == int(num) - 1
    for c in np.unique(np.asarray(big)):
        vals = np.asarray(dense)[np.asarray(big) == c]
        assert len(set(vals.tolist())) == 1


def test_connected_components_property_vs_scipy():
    """Hypothesis sweep of the pointer-jumping CC kernel (ops/cc — the
    FINCH level-0 engine at 240k scale) over adversarial first-neighbor
    graphs: long chains, 2-cycles, stars, self-pointing-fixed nodes —
    partition must equal scipy's on the symmetrized graph every time."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(min_value=2, max_value=400), st.integers(0, 2 ** 31))
    def check(n, seed):
        rng = np.random.default_rng(seed)
        nn_idx = rng.integers(0, n, size=n)
        self_pt = nn_idx == np.arange(n)
        nn_idx[self_pt] = (nn_idx[self_pt] + 1) % n
        labels = np.asarray(connected_components(nn_idx.astype(np.int32)))
        rows = np.arange(n)
        a = sp.coo_matrix((np.ones(n), (rows, nn_idx)), shape=(n, n))
        n_comp, expect = scipy_cc(a + a.T, directed=False)
        assert len(np.unique(labels)) == n_comp
        # identical partition: our label is constant on every scipy
        # component, and distinct across components
        seen = {}
        for comp in range(n_comp):
            ours = np.unique(labels[expect == comp])
            assert len(ours) == 1, (n, seed, comp)
            assert ours[0] not in seen, (n, seed, comp)
            seen[ours[0]] = comp

    check()
