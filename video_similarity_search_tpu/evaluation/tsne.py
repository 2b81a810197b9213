"""t-SNE embedding visualization (reference tsne.py:24-220).

PCA-50 -> t-SNE-2D of a random subset of classes, scatter plot saved to
PNG. (The reference imports a nonexistent ``coclr_utils.classifier`` —
SURVEY §7.4; this module works against any embedding matrix.)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def tsne_plot(embeddings: np.ndarray, labels: np.ndarray,
              out_path: str = "tsne.png", n_classes: int = 20,
              pca_dim: int = 50, perplexity: float = 30.0,
              seed: int = 0, idx_to_class: Optional[dict] = None) -> str:
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE

    rng = np.random.default_rng(seed)
    uniq = np.unique(labels)
    chosen = rng.choice(uniq, size=min(n_classes, len(uniq)), replace=False)
    mask = np.isin(labels, chosen)
    emb, lab = embeddings[mask], labels[mask]

    if emb.shape[1] > pca_dim:
        emb = PCA(n_components=min(pca_dim, emb.shape[0])).fit_transform(emb)
    pts = TSNE(n_components=2, perplexity=min(perplexity, len(emb) - 1),
               init="pca", random_state=seed).fit_transform(emb)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 8))
    cmap = plt.get_cmap("tab20")
    for i, cls in enumerate(chosen):
        m = lab == cls
        name = idx_to_class.get(int(cls), str(cls)) if idx_to_class else \
            str(cls)
        ax.scatter(pts[m, 0], pts[m, 1], s=8, color=cmap(i % 20), label=name)
    ax.legend(fontsize=6, markerscale=2, ncol=2)
    ax.set_title("t-SNE of clip embeddings")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
