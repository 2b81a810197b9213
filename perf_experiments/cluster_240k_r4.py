"""Kinetics-scale clustering + retrieval measurements (round-3 Next #3/#8).

The K400 flagship config implies ~240k embeddings per iterative-clustering
interval (reference clustering/finch.py caps exact search at 70k and falls
back to FLANN approximate 1-NN; this design claims to remove the cap with
the Pallas streaming 1-NN). Proves it 3.4x past the cap, on the real chip:

  finch_240k      full FINCH hierarchy over 240k x 128 (sparse level-0 path:
                  Pallas 1-NN + ops/cc pointer-jumping CC)
  kmeans_240k     device k-means K=1000 (the other shipped cluster method)
  parity_20k      sparse level-0 vs dense level-0 partition equality on a
                  20k subsample (the regime where both paths run)
  topk_240k       retrieval top-50 over a 240k-row bank for 9537 queries
                  (the UCF test-set size), ms + roofline fraction

Usage: JAX_PLATFORMS=axon python perf_experiments/cluster_240k_r4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

N, D, K_CLASSES = 240_000, 128, 400


def make_embeddings(n=N, d=D, classes=K_CLASSES, seed=0) -> np.ndarray:
    """Mixture of ``classes`` anisotropic Gaussians with overlap — realistic
    cluster structure (not trivially separable)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(classes, d)).astype(np.float32)
    lbl = rng.integers(0, classes, n)
    x = centers[lbl] + 0.8 * rng.normal(size=(n, d)).astype(np.float32)
    return x.astype(np.float32), lbl


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def main():
    from video_similarity_search_tpu.cluster.finch import (FINCH,
                                                           _dense_level,
                                                           _sparse_level0)
    from video_similarity_search_tpu.cluster.kmeans import kmeans
    from video_similarity_search_tpu.ops.pdist import topk_neighbors

    x_np, _ = make_embeddings()
    x = jnp.asarray(x_np)
    sync(x[:8])

    # ---- FINCH full hierarchy at 240k -----------------------------------
    t0 = time.perf_counter()
    c, num_clust, _ = FINCH(x, verbose=True)
    # FINCH returns numpy (host) labels — already materialized
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    c, num_clust, _ = FINCH(x, verbose=False)
    warm = time.perf_counter() - t0
    print(json.dumps({"exp": "finch_240k", "n": N,
                      "cold_s": round(cold, 2), "warm_s": round(warm, 2),
                      "partitions": num_clust}), flush=True)

    # ---- k-means K=1000 at 240k -----------------------------------------
    t0 = time.perf_counter()
    labels, inertia = kmeans(x, k=1000, key=jax.random.key(0), n_init=10,
                             l2normalize=True)
    sync(labels)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    labels, inertia = kmeans(x, k=1000, key=jax.random.key(1), n_init=10,
                             l2normalize=True)
    sync(labels)
    warm = time.perf_counter() - t0
    print(json.dumps({"exp": "kmeans_240k", "n": N, "k": 1000,
                      "cold_s": round(cold, 2), "warm_s": round(warm, 2)}),
          flush=True)

    # ---- sparse vs dense level-0 parity on 20k --------------------------
    sub = x[:20_000]
    l_sparse, _, _ = _sparse_level0(sub, "cosine")
    l_dense, _, _ = _dense_level(sub, 0.0, metric="cosine",
                                 use_min_sim=False)
    ls, ld = np.asarray(l_sparse), np.asarray(l_dense)
    # same partition up to relabeling: bijection between label sets
    import collections
    pair = collections.defaultdict(set)
    for a, b in zip(ls, ld):
        pair[a].add(b)
    ok = all(len(v) == 1 for v in pair.values())
    rev = collections.defaultdict(set)
    for a, b in zip(ld, ls):
        rev[a].add(b)
    ok = ok and all(len(v) == 1 for v in rev.values())
    print(json.dumps({"exp": "parity_20k",
                      "sparse_clusters": int(len(np.unique(ls))),
                      "dense_clusters": int(len(np.unique(ld))),
                      "partitions_equal": bool(ok)}), flush=True)

    # ---- retrieval top-50 over the 240k bank ----------------------------
    q_np, _ = make_embeddings(n=9537, seed=7)
    q = jnp.asarray(q_np)
    k = 50

    results = {}
    for mode in (False, True):
        t0 = time.perf_counter()
        idx, val = topk_neighbors(q, x, k, metric="cosine", approx=mode)
        sync(idx)
        cold = time.perf_counter() - t0
        best = float("inf")
        for i in range(3):
            qq = q + jnp.float32(i) * 1e-6
            t0 = time.perf_counter()
            idx, val = topk_neighbors(qq, x, k, metric="cosine", approx=mode)
            sync(idx)
            best = min(best, time.perf_counter() - t0)
        results["approx" if mode else "exact"] = (cold, best, idx)
    cold, best, idx = results["exact"]
    a_cold, a_best, a_idx = results["approx"]
    ex, ap = np.asarray(idx), np.asarray(a_idx)
    recall = float(np.mean([len(set(ex[i]) & set(ap[i])) / k
                            for i in range(0, ex.shape[0], 97)]))
    # rooflines: matmul flops vs HBM traffic of the score pass
    flops = 2.0 * q.shape[0] * N * D
    compute_bound_s = flops / (197e12)
    # scores are produced tile-by-tile; the unavoidable HBM traffic is the
    # bank read per query tile: (n_query/tile) * N * D * 4 bytes
    tile = 512
    bank_bytes = (q.shape[0] / tile) * N * D * 4
    bw_bound_s = bank_bytes / 819e9  # v5e HBM ~819 GB/s
    bound = max(compute_bound_s, bw_bound_s)
    print(json.dumps({
        "exp": "topk_240k", "queries": int(q.shape[0]), "bank": N, "k": k,
        "exact_ms": round(best * 1e3, 1),
        "approx_ms": round(a_best * 1e3, 1),
        "approx_recall": round(recall, 4),
        "compute_bound_ms": round(compute_bound_s * 1e3, 1),
        "bw_bound_ms": round(bw_bound_s * 1e3, 1),
        "exact_roofline_frac": round(bound / best, 3),
        "approx_roofline_frac": round(bound / a_best, 3)}), flush=True)


if __name__ == "__main__":
    main()
