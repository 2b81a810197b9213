"""Auxiliary margin-ranking losses combined with the triplet loss.

The reference assembles these inline in ``triplet_train_epoch``
(online_train.py:286-360): relative-speed perception (margin 0.1, lambda
1.0), local-local contrast (margin/weight from cfg), and intra-negative
(margin 0.04, lambda 0.4). torch ``MarginRankingLoss(x1, x2, target=-1)``
== mean(relu(x1 - x2 + margin)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.triplet_net import pairwise_dist

Array = jnp.ndarray

RSP_MARGIN = 0.1      # ref online_train.py:297
RSP_LAMBDA = 1.0      # ref :303
INTRA_NEG_MARGIN = 0.04  # ref :351
INTRA_NEG_LAMBDA = 0.4   # ref :358


def margin_ranking_loss(x1: Array, x2: Array, margin: float) -> Array:
    """MarginRankingLoss with target=-1: mean(relu(x1 - x2 + margin))."""
    return jnp.mean(jax.nn.relu(x1 - x2 + margin))


def rsp_loss(out_anc: Array, out_pos: Array, out_fast_pos: Array,
             dist_metric: str = "cosine") -> Array:
    """Relative-speed: d(anchor, positive) should beat d(anchor, 2x-speed
    positive) by the margin (ref online_train.py:286-304)."""
    d_ap = pairwise_dist(out_anc, out_pos, dist_metric)
    d_an = pairwise_dist(out_anc, out_fast_pos, dist_metric)
    return margin_ranking_loss(d_ap, d_an, RSP_MARGIN)


def llc_loss(out_anc: Array, out_pos: Array, out_anc2: Array,
             margin: float = 0.04, dist_metric: str = "cosine") -> Array:
    """Local-local contrast: a second clip of the anchor video should be
    closer than the positive (ref online_train.py:306-332)."""
    d_ap = pairwise_dist(out_anc, out_anc2, dist_metric)
    d_an = pairwise_dist(out_anc, out_pos, dist_metric)
    return margin_ranking_loss(d_ap, d_an, margin)


def intra_neg_loss(out_anc: Array, out_pos: Array, out_intra_neg: Array,
                   dist_metric: str = "cosine",
                   reference_compat: bool = False) -> Array:
    """Intra-negative: the temporally shuffled anchor must sit FARTHER than
    the positive — loss = relu(d(anc,pos) - d(anc,shuffled) + margin).

    Latent reference defect (implementing the intent, SURVEY §7.4
    convention): the reference's block (online_train.py:334-360) is a
    copy-paste of its LOCAL_LOCAL_CONTRAST block — it even reuses the
    ``target_llc`` variable for the intra-neg target (:355-357) — and so
    feeds MarginRankingLoss(d(anc,shuffled), d(anc,pos), y=-1), which
    PULLS the shuffled "negative" closer than the positive: the inverse
    of an intra-negative objective (and of the SLIC paper's described
    use of shuffled clips as negatives). Here the roles are the intended
    way around by default; ``reference_compat=True``
    (cfg LOSS.INTRA_NEG_REFERENCE_COMPAT) replicates the reference's
    inverted objective bit-for-bit for anyone reproducing its
    LOSS.INTRA_NEGATIVE training curves."""
    d_ap = pairwise_dist(out_anc, out_pos, dist_metric)
    d_an = pairwise_dist(out_anc, out_intra_neg, dist_metric)
    if reference_compat:
        d_ap, d_an = d_an, d_ap
    return margin_ranking_loss(d_ap, d_an, INTRA_NEG_MARGIN)
