"""Tests for the round-4 independence regularizers (losses/indep.py).

Analytic-fixture style (SURVEY.md §4 pattern 1): representations with known
dependence structure must produce known penalty orderings — independent
codes score ~0, a duplicated code scores high for both penalties, and an
interaction-structured (zero-correlation) dependence is visible to HSIC but
invisible to the linear decorrelation penalty. That last case is the whole
point: it models the objhue x scale interaction leak diagnosed in round 3
(demo_artifacts/round3/dci_protocol_floor.json)."""

import numpy as np
import pytest


def _codes(rng, b=256, d=8):
    return rng.standard_normal((b, d)).astype(np.float32)


def test_independent_codes_near_zero():
    import jax.numpy as jnp

    from encdiff_tpu.losses.indep import decorr_penalty, hsic_penalty

    rng = np.random.RandomState(0)
    u = jnp.asarray(_codes(rng))
    # unbiased HSIC: zero-mean under independence, so |value| is small
    assert abs(float(hsic_penalty(u))) < 2e-4
    # decorr has an O(1/B) sampling floor but no structure
    assert float(decorr_penalty(u)) < 0.01


def test_duplicated_code_scores_high():
    import jax.numpy as jnp

    from encdiff_tpu.losses.indep import decorr_penalty, hsic_penalty

    rng = np.random.RandomState(1)
    u = _codes(rng)
    u[:, 1] = u[:, 0]  # the two-codes-one-factor split (completeness 0.70)
    u = jnp.asarray(u)
    h_dup, d_dup = float(hsic_penalty(u)), float(decorr_penalty(u))
    rng2 = np.random.RandomState(2)
    h_ind = float(hsic_penalty(jnp.asarray(_codes(rng2))))
    d_ind = float(decorr_penalty(jnp.asarray(_codes(rng2))))
    # the mean-over-pairs normalization dilutes a single dependent pair by
    # d(d-1)/2 = 28 here; 10x over the independence floor is the real signal
    assert h_dup > 10 * max(abs(h_ind), 1e-6)
    # decorr floor is E[corr^2] = 1/B per pair; one perfect pair among 28
    # gives 2/56 vs 1/256 — about a 9x lift
    assert d_dup > 8 * d_ind


def test_interaction_dependence_visible_to_hsic_only():
    """b = a * s with s an independent random sign: corr(a, b) == 0 exactly
    in distribution, but a and b are strongly dependent (|b| == |a|). The
    linear penalty must stay at its independence floor; HSIC must fire.
    This is the synthetic analogue of a conditional (interaction) leak with
    zero main effect."""
    import jax.numpy as jnp

    from encdiff_tpu.losses.indep import decorr_penalty, hsic_penalty

    rng = np.random.RandomState(3)
    u = _codes(rng, b=512, d=4)
    sign = rng.choice([-1.0, 1.0], size=512).astype(np.float32)
    u[:, 1] = u[:, 0] * sign
    u = jnp.asarray(u)
    h = float(hsic_penalty(u))
    d = float(decorr_penalty(u))
    u_ind = jnp.asarray(_codes(np.random.RandomState(4), b=512, d=4))
    h_floor = abs(float(hsic_penalty(u_ind)))
    d_floor = float(decorr_penalty(u_ind))
    assert h > 20 * max(h_floor, 1e-6), (h, h_floor)
    assert d < 4 * max(d_floor, 1e-4), (d, d_floor)


def test_gradients_flow_and_reduce_dependence():
    """One gradient step on a mixing matrix must reduce the penalty."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.losses.indep import hsic_penalty

    rng = np.random.RandomState(5)
    base = jnp.asarray(_codes(rng, b=256, d=6))

    def pen(theta):
        # mix code 0 into code 1 with weight theta -> dependence
        mixed = base.at[:, 1].add(theta * base[:, 0])
        return hsic_penalty(mixed)

    g = jax.grad(pen)(jnp.float32(0.8))
    assert np.isfinite(float(g))
    assert float(g) > 0  # reducing the mixing weight reduces the penalty


def test_penalty_scale_invariance():
    """Standardization inside the penalty: affine per-code rescaling must
    not change the value (the raw scalars are unnormalized)."""
    import jax.numpy as jnp

    from encdiff_tpu.losses.indep import hsic_penalty

    rng = np.random.RandomState(6)
    u = _codes(rng, b=128, d=5)
    u[:, 2] = u[:, 0] * rng.choice([-1.0, 1.0], size=128)
    a = float(hsic_penalty(jnp.asarray(u)))
    b = float(hsic_penalty(jnp.asarray(u * np.float32(37.0) + 5.0)))
    assert a == pytest.approx(b, rel=1e-3)


def test_indep_dispatch_and_unknown_type():
    import jax.numpy as jnp

    from encdiff_tpu.losses.indep import indep_penalty

    u = jnp.asarray(_codes(np.random.RandomState(7)))
    both = float(indep_penalty("hsic+decorr", u))
    assert np.isfinite(both)
    with pytest.raises(ValueError):
        indep_penalty("nope", u)


@pytest.mark.slow
def test_loss_fn_carries_indep_term():
    """LatentDiffusion.loss_fn: the configured penalty lands in loss_dict
    and in the total loss; the train step moves the encoder params."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax

    from __graft_entry__ import _flagship_config
    from encdiff_tpu.core.config import instantiate_from_config
    from encdiff_tpu.train import loop as train_loop

    cfg = _flagship_config(model_channels=32, num_res_blocks=1, vq_ch=32,
                           channel_mult=(1, 2), vq_ch_mult=(1, 2),
                           resolution=32)
    cfg["params"].update({"indep_type": "hsic", "lambda_indep": 0.5})
    model = instantiate_from_config(cfg)
    optimizer = train_loop.build_optimizer(model, learning_rate=1e-4)
    state, frozen = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, image_resolution=32)
    step = train_loop.build_train_step(model, optimizer, donate=False)
    batch = np.random.RandomState(0).randint(
        0, 256, size=(8, 32, 32, 3), dtype=np.uint8)
    s1, m1 = step(state, frozen, batch, jax.random.PRNGKey(1))
    assert "train/loss_indep" in m1
    assert np.isfinite(float(m1["train/loss_indep"]))
    assert np.isfinite(float(m1["train/loss"]))
    dc = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params["cond"], s1.params["cond"])))
    assert dc > 0
