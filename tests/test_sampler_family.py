"""Tests for the colored / NLN / smooth-MPPI / piecewise-linear sampling
distributions — the analog of the reference's statistical sampler tests
(tests/sampling_distributions/colored_noise_tests.cu, ground truth
scripts/colored_noise.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.sampling import (
    ColoredNoiseDistribution,
    GaussianDistribution,
    NLNDistribution,
    PiecewiseLinearDistribution,
    SmoothMPPIDistribution,
    powerlaw_psd_gaussian,
)


def numpy_powerlaw_oracle(rng, exponent, samples, n_series, fmin=0.0):
    """NumPy Timmer & Koenig oracle (the algorithm behind
    scripts/colored_noise.py), for spectrum comparison."""
    f = np.fft.rfftfreq(samples)
    s_scale = f.copy()
    fmin = max(fmin, 1.0 / samples)
    ix = np.sum(s_scale < fmin)
    if ix and ix < len(s_scale):
        s_scale[:ix] = s_scale[ix]
    s_scale = s_scale ** (-exponent / 2.0)
    w = s_scale[1:].copy()
    w[-1] *= (1 + (samples % 2)) / 2.0
    sigma = 2 * np.sqrt(np.sum(w**2)) / samples
    size = (n_series, len(f))
    sr = rng.normal(scale=s_scale, size=size)
    si = rng.normal(scale=s_scale, size=size)
    if not (samples % 2):
        si[..., -1] = 0
    si[..., 0] = 0
    return np.fft.irfft(sr + 1j * si, n=samples, axis=-1) / sigma


def mean_psd(x):
    """Mean power spectral density over a batch of series (N, T)."""
    spec = np.abs(np.fft.rfft(x, axis=-1)) ** 2
    return spec.mean(axis=0)


def test_powerlaw_unit_variance():
    y = powerlaw_psd_gaussian(jax.random.PRNGKey(0), [1.0], 128, 4096)
    assert y.shape == (4096, 128, 1)
    # reference takes first T of 2T unit-variance samples -> variance ~ 1
    assert np.isclose(np.std(np.asarray(y)), 1.0, rtol=0.1)


def test_powerlaw_spectrum_matches_numpy_oracle():
    """Spectral shape of the JAX sampler must match the NumPy oracle's for
    pink (beta=1) and brown (beta=2) noise."""
    T = 128
    n = 2 * T
    for beta in (1.0, 2.0):
        y = powerlaw_psd_gaussian(jax.random.PRNGKey(1), [beta], T, 2048)
        # compare the spectrum over the full 2T-generation by regenerating
        # an yoracle over length T directly: both are unit-variance 1/f^beta,
        # so their *shapes* (normalized PSD) should agree over mid freqs.
        oracle = numpy_powerlaw_oracle(np.random.RandomState(0), beta, T, 2048)
        psd_jax = mean_psd(np.asarray(y[:, :, 0]))
        psd_oracle = mean_psd(oracle)
        # normalize and compare log-PSD slopes over mid-band
        band = slice(3, T // 3)
        r = psd_jax[band] / psd_oracle[band]
        # ratio should be flat (same power-law slope): std of log-ratio small
        assert np.std(np.log(r)) < 0.25, f"beta={beta}"


def test_powerlaw_white_noise_case():
    """beta=0 must reduce to white noise (flat spectrum)."""
    y = np.asarray(powerlaw_psd_gaussian(jax.random.PRNGKey(2), [0.0], 64, 4096))
    psd = mean_psd(y[:, :, 0])
    mid = psd[1:-1]
    assert np.std(np.log(mid)) < 0.2  # flat


def test_colored_distribution_carveouts_and_stats():
    s = ColoredNoiseDistribution.create(
        exponents=[2.0, 0.0], std_dev=[0.5, 1.5], offset_decay_rate=0.0
    )
    mean = jnp.ones((64, 2)) * 3.0
    U, _ = s.sample(jax.random.PRNGKey(3), mean, 512)
    np.testing.assert_allclose(U[0], mean, atol=1e-5)  # sample 0 = mean
    stds = np.std(np.asarray(U[1:]), axis=(0, 1))
    np.testing.assert_allclose(stds, [0.5, 1.5], rtol=0.15)
    # brown-noise channel is temporally correlated, white channel is not
    du = np.diff(np.asarray(U[1:]), axis=1)
    autocorr_brown = 1 - np.var(du[..., 0]) / (2 * np.var(np.asarray(U[1:, :, 0])))
    autocorr_white = 1 - np.var(du[..., 1]) / (2 * np.var(np.asarray(U[1:, :, 1])))
    assert autocorr_brown > 0.5
    assert abs(autocorr_white) < 0.2


def test_nln_distribution_heavy_tails():
    g = GaussianDistribution.create(std_dev=[1.0])
    n = NLNDistribution.create(std_dev=[1.0])
    mean = jnp.zeros((32, 1))
    Ug, _ = g.sample(jax.random.PRNGKey(4), mean, 4096)
    Un, _ = n.sample(jax.random.PRNGKey(4), mean, 4096)
    # normal x lognormal has excess kurtosis >> gaussian
    def kurt(x):
        x = np.asarray(x).ravel()
        return np.mean((x - x.mean()) ** 4) / np.var(x) ** 2

    assert kurt(Un) > kurt(Ug) + 2.0
    np.testing.assert_allclose(Un[0], mean, atol=1e-6)  # carve-out preserved


def test_smooth_mppi_integrates_derivative_noise():
    T, C = 16, 2
    s = SmoothMPPIDistribution.create(std_dev=[1.0, 1.0], num_timesteps=T, dt=0.1)
    state = s.init_state()
    assert state.shape == (T, C)
    mean = jnp.ones((T, C)) * 2.0
    U, W = s.sample(jax.random.PRNGKey(5), mean, 128, state=state)
    # u = mean + W*dt
    np.testing.assert_allclose(U, mean[None] + W * 0.1, atol=1e-6)
    # sample 0 of the derivative noise is the derivative mean (zeros)
    np.testing.assert_allclose(W[0], state, atol=1e-6)

    # update: derivative mean <- weighted avg of W; mean <- mean + w*dt
    w = jnp.ones((128,))
    new_mean, new_state = s.update_mean(U, W, w, jnp.sum(w), mean, state)
    np.testing.assert_allclose(new_state, np.mean(np.asarray(W), axis=0), atol=1e-5)
    np.testing.assert_allclose(new_mean, mean + new_state * 0.1, atol=1e-5)


def test_smooth_mppi_shift_shifts_both():
    T = 8
    s = SmoothMPPIDistribution.create(std_dev=[1.0], num_timesteps=T, dt=0.1)
    mean = jnp.arange(T, dtype=jnp.float32)[:, None]
    state = jnp.arange(T, dtype=jnp.float32)[:, None] * 10
    new_mean, new_state = s.shift(mean, 2, None, state)
    np.testing.assert_allclose(new_mean[:6, 0], np.arange(2, 8), atol=1e-6)
    np.testing.assert_allclose(new_state[:6, 0], np.arange(2, 8) * 10, atol=1e-6)


def test_smooth_mppi_in_controller():
    from mppi_generic_tpu.controllers import VanillaMPPI
    from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
    from mppi_generic_tpu.models import DoubleIntegratorDynamics

    T = 32
    ctrl = VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=SmoothMPPIDistribution.create(
            std_dev=[2.0, 2.0], num_timesteps=T, dt=0.02
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=T,
        num_rollouts=128,
    )
    cs = ctrl.init_state(jax.random.PRNGKey(6))
    res, cs2 = ctrl.solve(jnp.array([2.0, 0.0, 0.0, 1.0]), cs)
    assert np.isfinite(float(res.baseline))
    assert cs2.sampler_state.shape == (T, 2)
    cs3 = ctrl.slide_control_sequence(cs2, 1)
    assert cs3.sampler_state.shape == (T, 2)

    # smoothness: derivative-space sampling must yield smaller mean-abs
    # control increments than direct Gaussian sampling at the same sigma
    key = jax.random.PRNGKey(7)
    mean = jnp.zeros((T, 2))
    U_s, _ = ctrl.sampler.sample(key, mean, 128, state=ctrl.sampler.init_state())
    from mppi_generic_tpu.sampling import GaussianDistribution

    U_g, _ = GaussianDistribution.create(std_dev=[2.0, 2.0]).sample(
        key, mean, 128
    )
    inc_s = float(jnp.mean(jnp.abs(jnp.diff(U_s[1:], axis=1))))
    inc_g = float(jnp.mean(jnp.abs(jnp.diff(U_g[1:], axis=1))))
    assert inc_s < 0.5 * inc_g, (inc_s, inc_g)


def test_piecewise_linear_carveouts():
    s = PiecewiseLinearDistribution.create(
        std_dev=[0.5],
        control_ranges=[[-2.0, 2.0]],
        num_segments=4,
    )
    T = 32
    mean = jnp.ones((T, 1)) * 0.5
    U, _ = s.sample(jax.random.PRNGKey(7), mean, 64)
    np.testing.assert_allclose(U[0], 0.0, atol=1e-6)  # sample 0 = zero controls
    np.testing.assert_allclose(U[1], mean, atol=1e-6)  # sample 1 = nominal
    # values bounded by the (scaled) control range
    assert float(jnp.max(jnp.abs(U[2:]))) <= 2.0 + 1e-5
    # piecewise-linear: second differences are mostly zero (linear segments)
    d2 = np.diff(np.asarray(U[2:, :, 0]), n=2, axis=1)
    frac_linear = np.mean(np.abs(d2) < 1e-3)
    assert frac_linear > 0.6


def test_piecewise_linear_frozen_head():
    s = PiecewiseLinearDistribution.create(
        std_dev=[0.5], control_ranges=[[-2.0, 2.0]], num_segments=3
    )
    mean = jnp.ones((16, 1)) * 0.25
    U, _ = s.sample(jax.random.PRNGKey(8), mean, 32, optimization_stride=4)
    np.testing.assert_allclose(
        U[:, :4], jnp.broadcast_to(mean[None, :4], (32, 4, 1)), atol=1e-6
    )


def test_colored_solve_pallas_epilogue_matches_combined():
    """ColoredMPPI with kernel='pallas' (noise in XLA, rollout + in-kernel
    LR + flash weights/mean in ONE Pallas launch via
    fused_weighted_rollout) matches the all-XLA combined kernel end to end
    — same key, same samples, same update."""
    from mppi_generic_tpu.controllers import ColoredMPPI
    from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
    from mppi_generic_tpu.models import DoubleIntegratorDynamics

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-2, 2], [-2, 2]])
    kw = dict(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=ColoredNoiseDistribution.create(
            std_dev=[1.0, 0.7], exponents=[1.0, 2.0],
            control_cost_coeff=[0.02, 0.01], pure_noise_percentage=0.1,
        ),
        num_timesteps=16,
        num_rollouts=256,
        lam=jnp.float32(1.2),
    )
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    cs = ColoredMPPI(kernel="combined", **kw).init_state(
        jax.random.PRNGKey(7)
    )
    res_p, _ = jax.jit(ColoredMPPI(kernel="pallas", **kw).solve)(x0, cs)
    res_c, _ = jax.jit(ColoredMPPI(kernel="combined", **kw).solve)(x0, cs)
    np.testing.assert_allclose(
        np.asarray(res_p.control_mean), np.asarray(res_c.control_mean),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        float(res_p.baseline), float(res_c.baseline), rtol=1e-5, atol=1e-5
    )
