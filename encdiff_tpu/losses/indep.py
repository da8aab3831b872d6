"""Batch-independence regularizers on the concept scalars u.

Round-4 extension of the fork's auxiliary-loss family (the reference's MCL
subsystem, ``ldm/models/diffusion/mcl_utils.py:76-179``), motivated by the
round-3 diagnosis of the residual DCI gap on the v4 renderer
(demo_artifacts/round3/dci_protocol_floor.json + VERDICT r3):

- **completeness 0.70**: two of the 20 codes split the scale factor — each
  code is pure (DCI-disentanglement 0.98) but the factor is not one-code.
  Two codes that both track scale are strongly statistically *dependent*.
- **the 0.992 bar**: the remaining DCI gap behaves like an objhue x scale
  *interaction* leak (~1.4% of code variance) — objhue conditionally
  modulating the scale codes with near-zero main effect. A conditional
  (higher-order) dependence between the objhue code and the scale codes.

Both defects are excess statistical dependence between code pairs. The
dataset factors are sampled independently (the full Cartesian grid), so a
perfect 1-factor-per-code representation has pairwise-independent codes;
penalizing measured dependence is exactly aligned with the target.

Two penalties, both pure functions of the (B, U) scalar batch (no extra
parameters, so they compose with any mcl_type and jit into the fused train
step):

- ``decorr``: mean squared off-diagonal batch correlation. Linear — kills
  the two-codes-one-factor split (they are near-colinear) but blind to
  zero-correlation interaction structure.
- ``hsic``: pairwise HSIC with an RBF kernel on per-code standardized
  scalars, using the *unbiased* estimator (Song et al. 2012, eq. 5) so the
  penalty is zero-mean under true independence — the biased estimator's
  O(1/B) floor would otherwise dominate the ~1%-variance leak signal.
  Catches arbitrary nonlinear dependence, including the interaction leak
  the unconditional MCL critics provably cannot see (VERDICT r3 next #1).

All statistics are computed within the local batch; under pjit data
parallelism each shard penalizes its local pairs (the estimator is
batch-size-unbiased, so the sharded mean matches the global expectation).
"""

from __future__ import annotations

import jax.numpy as jnp

INDEP_TYPES = ("decorr", "hsic", "hsic+decorr")


def _standardize(u, eps: float = 1e-4):
    # eps floors the per-code std: a dead (near-constant) code standardizes
    # to ~0 instead of amplified float noise with huge std-gradients
    u = u.astype(jnp.float32)
    mu = jnp.mean(u, axis=0, keepdims=True)
    sd = jnp.std(u, axis=0, keepdims=True)
    return (u - mu) / (sd + eps)


def decorr_penalty(u) -> jnp.ndarray:
    """Mean squared off-diagonal entry of the batch correlation matrix of
    the (B, U) codes. Scale-free in both B and U."""
    b, d = u.shape
    s = _standardize(u)
    c = (s.T @ s) / b                      # (U, U) correlation estimate
    off = c - jnp.diag(jnp.diag(c))
    n_pairs = d * (d - 1)
    return jnp.sum(off ** 2) / n_pairs


def hsic_penalty(u, bandwidth: float = 1.0) -> jnp.ndarray:
    """Mean pairwise unbiased HSIC between codes (RBF kernel, standardized
    scalars).

    For m samples and per-code kernel matrices K_i with zeroed diagonals
    (K-tilde), the unbiased statistic for a pair (i, j) is

        HSIC_u = [ tr(Ki Kj) + (1'Ki 1)(1'Kj 1)/((m-1)(m-2))
                   - 2/(m-2) * 1'Ki Kj 1 ] / (m (m-3))

    (Song et al., "Feature Selection via Dependence Maximization", JMLR
    2012). Every term vectorizes over all U(U-1)/2 pairs at once:
    tr(Ki Kj) = <Ki, Kj> (einsum), 1'Ki Kj 1 = r_i . r_j with r = K 1.
    Cost: U kernel matrices of (B, B) plus one (U, B, B)x(U, B, B) einsum —
    ~3M flops at B=128, U=20; negligible next to the UNet.
    """
    b, d = u.shape
    s = _standardize(u)                    # (B, U)
    diff = s[:, None, :] - s[None, :, :]   # (B, B, U)
    k = jnp.exp(-(diff ** 2) / (2.0 * bandwidth ** 2))
    k = jnp.transpose(k, (2, 0, 1))        # (U, B, B)
    eye = jnp.eye(b, dtype=k.dtype)
    k = k * (1.0 - eye)                    # zero the diagonals (K-tilde)

    m = float(b)
    t = jnp.einsum("iab,jab->ij", k, k)    # tr(Ki Kj) for all pairs
    ssum = jnp.sum(k, axis=(1, 2))         # 1'Ki 1
    r = jnp.sum(k, axis=2)                 # (U, B): Ki 1
    rr = r @ r.T                           # 1'Ki Kj 1
    hsic = (t + jnp.outer(ssum, ssum) / ((m - 1.0) * (m - 2.0))
            - 2.0 * rr / (m - 2.0)) / (m * (m - 3.0))

    mask = 1.0 - jnp.eye(d, dtype=hsic.dtype)
    n_pairs = d * (d - 1)
    return jnp.sum(hsic * mask) / n_pairs


def indep_penalty(indep_type: str, u, bandwidth: float = 1.0) -> jnp.ndarray:
    """Dispatch. ``u`` is the (B, latent_unit) raw concept-scalar batch."""
    if indep_type == "decorr":
        return decorr_penalty(u)
    if indep_type == "hsic":
        return hsic_penalty(u, bandwidth=bandwidth)
    if indep_type == "hsic+decorr":
        return hsic_penalty(u, bandwidth=bandwidth) + decorr_penalty(u)
    raise ValueError(f"Unknown indep_type: {indep_type!r} "
                     f"(expected one of {INDEP_TYPES})")
