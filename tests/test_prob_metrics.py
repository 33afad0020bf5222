"""Probabilistic verification metrics (CRPS, spread-skill, rank histogram).

Beyond-reference capability (the reference's dl4ds/metrics.py is
deterministic-only); golden-tested against the closed-form Gaussian CRPS
and a brute-force O(M^2) pairwise estimator.
"""

import numpy as np
import pytest

from dl4ds_tpu.metrics import (crps_ensemble, spread_skill, rank_histogram,
                               compute_prob_metrics)


def _crps_bruteforce(y, members, fair):
    """O(M^2) reference implementation of the kernel-form CRPS."""
    m = members.shape[0]
    term1 = np.mean(np.abs(members - y[None]), axis=0)
    pair = np.zeros_like(y, dtype='float64')
    for i in range(m):
        for j in range(m):
            pair += np.abs(members[i] - members[j])
    denom = m * (m - 1) if fair and m > 1 else m * m
    return term1 - pair / (2.0 * denom)


@pytest.mark.parametrize('fair', [True, False])
def test_crps_matches_bruteforce(rng, fair):
    members = rng.standard_normal((7, 3, 4, 5, 1))
    y = rng.standard_normal((3, 4, 5, 1))
    got = crps_ensemble(y, members, fair=fair)
    want = _crps_bruteforce(y.astype('float64'),
                            members.astype('float64'), fair)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_crps_single_member_is_absolute_error(rng):
    members = rng.standard_normal((1, 2, 3, 3, 1))
    y = rng.standard_normal((2, 3, 3, 1))
    for fair in (True, False):
        np.testing.assert_allclose(crps_ensemble(y, members, fair=fair),
                                   np.abs(members[0] - y), atol=1e-12)


def test_fair_crps_matches_gaussian_closed_form(rng):
    # fair CRPS is an unbiased estimator of the CRPS of the underlying
    # distribution: with members ~ N(0,1), the closed form is
    # sigma * (z(2 Phi(z) - 1) + 2 phi(z) - 1/sqrt(pi))
    from scipy.stats import norm
    m, n_pix = 512, 4096
    members = rng.standard_normal((m, n_pix))
    y = np.full((n_pix,), 0.3)
    got = float(np.mean(crps_ensemble(y, members, fair=True)))
    z = 0.3
    want = z * (2 * norm.cdf(z) - 1) + 2 * norm.pdf(z) - 1 / np.sqrt(np.pi)
    assert abs(got - want) < 5e-3
    # the plain estimator is biased high-variance-ward (underestimates the
    # pairwise term less): plain >= fair - tolerance, strictly different
    plain = float(np.mean(crps_ensemble(y, members, fair=False)))
    assert plain > got


def test_crps_rewards_sharp_calibrated_ensemble(rng):
    # a forecast matching the truth distribution scores better than a
    # too-wide one and than a biased one
    n = 8192
    y = rng.standard_normal(n)
    good = rng.standard_normal((64, n))
    wide = 4.0 * rng.standard_normal((64, n))
    biased = rng.standard_normal((64, n)) + 2.0
    c_good = crps_ensemble(y, good).mean()
    assert c_good < crps_ensemble(y, wide).mean()
    assert c_good < crps_ensemble(y, biased).mean()


def test_crps_shape_validation(rng):
    with pytest.raises(ValueError, match='members must be'):
        crps_ensemble(np.zeros((2, 3)), np.zeros((4, 3, 2)))


def test_spread_skill_calibrated_ratio_near_one(rng):
    # members and truth drawn iid from the same per-pixel distribution
    # => corrected ratio ~ 1
    mu = rng.standard_normal((1, 64, 64, 1))
    members = mu + rng.standard_normal((8, 1, 64, 64, 1))
    y = mu + rng.standard_normal((1, 64, 64, 1))
    spread, skill, ratio = spread_skill(y, members)
    assert 0.9 < ratio < 1.1
    # under-dispersive ensemble is flagged (< 1)
    members_narrow = mu + 0.2 * rng.standard_normal((8, 1, 64, 64, 1))
    _, _, r_narrow = spread_skill(y, members_narrow)
    assert r_narrow < 0.5


def test_spread_skill_needs_two_members(rng):
    with pytest.raises(ValueError, match='at least 2'):
        spread_skill(np.zeros((2, 2)), np.zeros((1, 2, 2)))


def test_rank_histogram_uniform_when_exchangeable(rng):
    m, n = 9, 40000
    members = rng.standard_normal((m, n))
    y = rng.standard_normal(n)
    counts = rank_histogram(y, members)
    assert counts.shape == (m + 1,)
    assert counts.sum() == n
    expected = n / (m + 1)
    assert np.all(np.abs(counts - expected) < 5 * np.sqrt(expected))


def test_rank_histogram_tie_break_spreads_ties():
    # all members identical and equal to the obs: ties broken uniformly
    # over all M+1 ranks instead of piling into bin 0
    members = np.zeros((4, 10000))
    y = np.zeros(10000)
    counts = rank_histogram(y, members, seed=3)
    assert counts.sum() == 10000
    assert np.all(counts > 1200)   # ~2000 each


def test_rank_histogram_u_shape_for_underdispersive(rng):
    members = 0.1 * rng.standard_normal((7, 20000))
    y = rng.standard_normal(20000)
    counts = rank_histogram(y, members)
    assert counts[0] + counts[-1] > 0.7 * counts.sum()


def test_compute_prob_metrics_artifacts(tmp_path, rng):
    y = rng.standard_normal((6, 8, 8, 1)).astype('float32')
    members = y[None] + 0.5 * rng.standard_normal((5, 6, 8, 8, 1))
    crps_map, ratio, counts = compute_prob_metrics(
        y, members, save_path=str(tmp_path), dpi=40)
    assert crps_map.shape == (8, 8)
    assert np.all(np.isfinite(crps_map)) and crps_map.min() >= 0
    assert counts.sum() == 6 * 8 * 8
    for f in ('metrics_crps_map.npy', 'metrics_crps_map.png',
              'metrics_spread_map.png', 'metrics_rank_histogram.npy',
              'metrics_rank_histogram.png', 'metrics_prob_summary.txt'):
        assert (tmp_path / f).exists(), f
    txt = (tmp_path / 'metrics_prob_summary.txt').read_text()
    assert 'Spread-skill ratio' in txt and 'CRPS' in txt


def test_compute_prob_metrics_scaler_applied(rng):
    # inverse_transform applied to BOTH obs and every member
    class Affine:
        def inverse_transform(self, a):
            return 2.0 * a + 1.0

    y = rng.standard_normal((3, 4, 4, 1)).astype('float32')
    members = y[None] + rng.standard_normal((4, 3, 4, 4, 1)).astype('float32')
    m1, _, _ = compute_prob_metrics(y, members)
    m2, _, _ = compute_prob_metrics(y, members, scaler=Affine())
    # CRPS is scale-equivariant: doubling the data doubles the score
    np.testing.assert_allclose(m2, 2.0 * m1, rtol=1e-5)


def test_predict_ensemble_return_members(rng):
    import jax
    from jax.sharding import Mesh
    from dl4ds_tpu.models import net_postupsampling
    from dl4ds_tpu.parallel import init_ensemble, predict_ensemble

    model = net_postupsampling(
        'resnet', 'spc', scale=2, n_channels=1, n_aux_channels=0,
        lr_size=(8, 8), n_filters=4, n_blocks=1, attention=False)
    mesh = Mesh(np.array(jax.devices()[:4]), ('ensemble',))
    stacked = init_ensemble(model, 4, seed=0, mesh=mesh)
    x = rng.standard_normal((2, 8, 8, 1)).astype('float32')
    mean, std, members = predict_ensemble(model, stacked, x, mesh=mesh,
                                          return_members=True)
    assert members.shape == (4, 2, 16, 16, 1)
    np.testing.assert_allclose(mean, members.mean(0), atol=1e-6)
    np.testing.assert_allclose(std, members.std(0), atol=1e-6)
    # feed straight into the verification suite
    y = rng.standard_normal(mean.shape).astype('float32')
    crps_map, ratio, counts = compute_prob_metrics(y, members)
    assert np.isfinite(crps_map).all() and counts.sum() == y.size


def test_predict_mc_return_members(rng):
    from dl4ds_tpu.models import net_postupsampling
    from dl4ds_tpu.inference import predict_mc
    import jax

    model = net_postupsampling(
        'resnet', 'spc', scale=2, n_channels=1, n_aux_channels=0,
        lr_size=(8, 8), n_filters=4, n_blocks=1, attention=False,
        dropout_rate=0.3, dropout_variant='mcdrop')
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    arr = rng.standard_normal((2, 16, 16, 1)).astype('float32')
    mean, std, members = predict_mc((model, variables), arr, scale=2,
                                    n_members=3, return_members=True)
    assert members.shape[0] == 3
    np.testing.assert_allclose(mean, members.mean(0), atol=1e-6)
    assert float(std.max()) > 0   # MC dropout members differ
