import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.sampling import GaussianDistribution


def make_sampler(**kw):
    defaults = dict(std_dev=[0.5, 2.0], control_cost_coeff=[1.0, 1.0])
    defaults.update(kw)
    return GaussianDistribution.create(**defaults)


def test_sample_zero_is_mean():
    s = make_sampler()
    mean = jnp.ones((10, 2)) * 0.7
    U, _ = s.sample(jax.random.PRNGKey(0), mean, 64)
    np.testing.assert_allclose(U[0], mean, atol=1e-6)


def test_frozen_head_optimization_stride():
    s = make_sampler()
    mean = jnp.linspace(0, 1, 20)[:, None] * jnp.ones((20, 2))
    U, _ = s.sample(jax.random.PRNGKey(0), mean, 64, optimization_stride=5)
    # all samples equal mean for t < 5
    np.testing.assert_allclose(U[:, :5], jnp.broadcast_to(mean[None, :5], (64, 5, 2)), atol=1e-6)
    # and differ afterwards for at least one non-zero sample
    assert not np.allclose(U[3, 5:], mean[5:])


def test_pure_noise_tail_is_zero_mean():
    s = make_sampler(pure_noise_percentage=0.25)
    mean = jnp.ones((16, 2)) * 10.0  # large mean so the carve-out is obvious
    K = 1000
    U, _ = s.sample(jax.random.PRNGKey(1), mean, K)
    tail = U[int(0.75 * K) :]
    head = U[1 : int(0.75 * K)]
    assert abs(float(jnp.mean(tail))) < 0.2  # zero-mean
    assert abs(float(jnp.mean(head)) - 10.0) < 0.2  # mean-centered


def test_sample_statistics_match_sigma():
    s = make_sampler()
    mean = jnp.zeros((32, 2))
    U, _ = s.sample(jax.random.PRNGKey(2), mean, 4096)
    stds = np.std(np.asarray(U[1:]), axis=(0, 1))
    np.testing.assert_allclose(stds, [0.5, 2.0], rtol=0.05)


def test_std_dev_decay():
    s = make_sampler(std_dev_decay=0.5)
    mean = jnp.zeros((32, 2))
    U0, _ = s.sample(jax.random.PRNGKey(3), mean, 2048, iteration=0)
    U2, _ = s.sample(jax.random.PRNGKey(3), mean, 2048, iteration=2)
    r = np.std(np.asarray(U2[1:])) / np.std(np.asarray(U0[1:]))
    assert np.isclose(r, 0.25, rtol=0.05)


def test_time_specific_std_dev():
    sigma_t = jnp.stack([jnp.full((2,), 0.1), jnp.full((2,), 5.0)] * 8)  # (16, 2)
    s = GaussianDistribution.create(std_dev=sigma_t)
    assert s.time_specific_std_dev
    U, _ = s.sample(jax.random.PRNGKey(4), jnp.zeros((16, 2)), 4096)
    stds = np.std(np.asarray(U[1:]), axis=(0, 2))
    np.testing.assert_allclose(stds[0::2], 0.1, rtol=0.1)
    np.testing.assert_allclose(stds[1::2], 5.0, rtol=0.1)


def test_likelihood_ratio_cost_formula():
    """0.5*lam*(1-alpha) * sum c_i mu_i (mu_i - 2u_i)/sigma_i^2
    (gaussian.cu:481-568)."""
    s = GaussianDistribution.create(
        std_dev=[0.5, 2.0], control_cost_coeff=[3.0, 4.0]
    )
    mean = jnp.array([[1.0, -1.0], [0.5, 0.25]])  # (T=2, C=2)
    U = jnp.array([[[2.0, 0.0], [1.0, 1.0]]])  # (K=1, T=2, C=2)
    lam, alpha = 0.8, 0.1
    got = s.likelihood_ratio_cost(U, mean, lam, alpha)
    sigma2 = np.array([0.25, 4.0])
    c = np.array([3.0, 4.0])
    mu = np.asarray(mean)
    u = np.asarray(U[0])
    expected = 0.5 * lam * (1 - alpha) * np.sum(c * mu * (mu - 2 * u) / sigma2)
    np.testing.assert_allclose(float(got[0]), expected, rtol=1e-5)


def test_likelihood_ratio_pure_noise_mu_zero():
    s = GaussianDistribution.create(
        std_dev=[1.0], control_cost_coeff=[1.0], pure_noise_percentage=0.5
    )
    mean = jnp.ones((4, 1))
    U = jnp.ones((4, 4, 1))
    costs = s.likelihood_ratio_cost(U, mean, 1.0, 0.0)
    # samples 2,3 are the pure-noise tail: mu = 0 -> cost 0
    np.testing.assert_allclose(costs[2:], 0.0, atol=1e-6)
    # samples 0,1: sum over 4 timesteps of 1*(1-2) = -4 -> 0.5 * -4
    np.testing.assert_allclose(costs[:2], -2.0, atol=1e-6)


def test_feedback_cost():
    s = GaussianDistribution.create(std_dev=[2.0], control_cost_coeff=[3.0])
    u_fb = jnp.ones((5, 1)) * 4.0
    got = s.feedback_cost(u_fb, 1.0, 0.0)
    expected = 0.5 * 1.0 * np.sum(3.0 * 16.0 / 4.0) * 5
    np.testing.assert_allclose(float(got), expected, rtol=1e-6)


def test_update_mean_weighted_average():
    s = make_sampler()
    U = jnp.stack([jnp.zeros((3, 2)), jnp.ones((3, 2))])  # K=2
    w = jnp.array([1.0, 3.0])
    new_mean, _ = s.update_mean(U, None, w, jnp.sum(w), None)
    np.testing.assert_allclose(new_mean, 0.75 * jnp.ones((3, 2)), atol=1e-6)
