"""TAD (Total AUROC Difference) over CelebA's 40 binary attributes.

Rebuild of ``ae_utils_exp.py:150-235`` (LatentClass threshold classifiers,
``calculate_auroc``, ``aurocs_search``) + ``celeba_tad.py:44-129`` (norm
diffs, attribute mutual-information redundancy filter, final TAD score).

TPU-first change: the reference's triple Python loop (40 attrs x D latents
x 11 thresholds, one full-batch pass each) collapses into ONE einsum —
thresholded predictions (T, N, D) against targets (N, A) gives all
(T, D, A) confusion counts in a single contraction; AUROC is the same
sorted right-rectangle integration as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# CelebA 40 attribute names (standard order)
CELEBA_ATTRS = [
    "5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive", "Bags_Under_Eyes",
    "Bald", "Bangs", "Big_Lips", "Big_Nose", "Black_Hair", "Blond_Hair",
    "Blurry", "Brown_Hair", "Bushy_Eyebrows", "Chubby", "Double_Chin",
    "Eyeglasses", "Goatee", "Gray_Hair", "Heavy_Makeup", "High_Cheekbones",
    "Male", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes", "No_Beard",
    "Oval_Face", "Pale_Skin", "Pointy_Nose", "Receding_Hairline",
    "Rosy_Cheeks", "Sideburns", "Smiling", "Straight_Hair", "Wavy_Hair",
    "Wearing_Earrings", "Wearing_Hat", "Wearing_Lipstick",
    "Wearing_Necklace", "Wearing_Necktie", "Young",
]


def aurocs_all(z, targ, num_thresholds: int = 11,
               min_range: float = 0.2) -> jnp.ndarray:
    """All (attr, latent) threshold-classifier AUROCs at once.

    z: (N, D) latent codes; targ: (N, A) binary attributes.
    Returns (A, D) max(pos-auroc, neg-auroc); latents whose value range is
    <= min_range stay at the 0.5 random-guess floor (ae_utils_exp.py:209-214).
    """
    z = jnp.asarray(z, jnp.float32)
    targ = jnp.asarray(targ, jnp.float32)
    n, d = z.shape
    a = targ.shape[1]
    _ma, _mi = z.max(axis=0), z.min(axis=0)
    ts = jnp.linspace(0.0, 1.0, num_thresholds)
    thr = ts[:, None] * (_ma - _mi)[None, :] + _mi[None, :]        # (T, D)
    preds = (z[None] >= thr[:, None, :]).astype(jnp.float32)       # (T, N, D)

    pos_total = targ.sum(axis=0)                                    # (A,)
    neg_total = n - pos_total

    # tp[t,d,a] = sum_n preds * targ ; fp = sum_n preds * (1-targ)
    tp = jnp.einsum("tnd,na->tda", preds, targ)
    fp = jnp.einsum("tnd,na->tda", preds, 1.0 - targ)
    p_tpr = tp / jnp.maximum(pos_total, 1.0)[None, None, :]
    p_fpr = fp / jnp.maximum(neg_total, 1.0)[None, None, :]
    # negative-direction classifier: pred = (z < thr) = 1 - preds
    n_tpr = (pos_total[None, None, :] - tp) / jnp.maximum(pos_total, 1.0)
    n_fpr = (neg_total[None, None, :] - fp) / jnp.maximum(neg_total, 1.0)

    def area(fpr, tpr):
        # reference integration: sort (fpr,tpr) rows independently, then
        # right-rectangle sum (ae_utils_exp.py:195-203)
        fpr = jnp.sort(fpr, axis=0)
        tpr = jnp.sort(tpr, axis=0)
        return jnp.sum(tpr[1:] * (fpr[1:] - fpr[:-1]), axis=0)      # (D, A)

    auroc = jnp.maximum(area(p_fpr, p_tpr), area(n_fpr, n_tpr))     # (D, A)
    auroc = auroc.T                                                 # (A, D)
    alive = (_ma - _mi) > min_range
    return jnp.where(alive[None, :], auroc, 0.5)


def attribute_mi_matrix(targ) -> jnp.ndarray:
    """Pairwise MI between binary attributes (celeba_tad.py:75-110);
    diagonal = per-attribute entropy."""
    targ = jnp.asarray(targ, jnp.float32)
    n = targ.shape[0]
    p = targ.mean(axis=0)                                           # (A,)

    def joint(x, y):
        return jnp.einsum("na,nb->ab", x, y) / n

    terms = []
    for xi, pi in ((1 - targ, 1 - p), (targ, p)):
        for yj, pj in ((1 - targ, 1 - p), (targ, p)):
            jp = joint(xi, yj)
            denom = pi[:, None] * pj[None, :]
            term = jnp.where((jp > 0) & (denom > 0),
                             jp * jnp.log(jp / jnp.maximum(denom, 1e-12)),
                             0.0)
            terms.append(term)
    return sum(terms)


def tad_score(z, targ, auroc_thresh: float = 0.75,
              ent_red_thresh: float = 0.2) -> dict:
    """Full TAD protocol (celeba_tad.py:54-129). Returns score + diagnostics."""
    au = np.asarray(aurocs_all(z, targ))                            # (A, D)
    max_aur = au.max(axis=1)
    argmax_aur = au.argmax(axis=1)
    A = au.shape[0]
    aurs_diffs = np.zeros(A)
    norm_diffs = np.zeros(A)
    for i in range(A):
        rest = au[i].copy()
        rest[argmax_aur[i]] = 0.0
        aurs_diffs[i] = max_aur[i] - rest.max()
        norm = (au[i] - 0.5) / max(max_aur[i] - 0.5, 1e-12)
        norm[argmax_aur[i]] = 0.0
        norm_diffs[i] = 1.0 - norm.max()

    mi_mat = np.asarray(attribute_mi_matrix(targ))
    offdiag = mi_mat * (1 - np.eye(A))
    mi_maxes = offdiag.max(axis=1)
    diag = np.maximum(np.diag(mi_mat), 1e-12)
    ent_red_prop = 1.0 - (diag - mi_maxes) / diag

    filt = (max_aur >= auroc_thresh) & (ent_red_prop <= ent_red_thresh)
    return {
        "tad_score": float(aurs_diffs[filt].sum()),
        "attributes_captured": int(filt.sum()),
        "max_auroc": max_aur,
        "argmax_latent": argmax_aur,
        "aurs_diffs": aurs_diffs,
        "norm_diffs": norm_diffs,
        "ent_red_prop": ent_red_prop,
    }
