import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.ops import weights as w


def test_baseline_is_min():
    costs = jnp.array([3.0, 1.0, 2.0])
    assert float(w.baseline_cost(costs)) == 1.0


def test_norm_exp():
    costs = jnp.array([1.0, 2.0, 3.0])
    lam = 0.5
    out = w.norm_exp_weights(costs, lam, 1.0)
    np.testing.assert_allclose(out, np.exp(-(np.array([0.0, 1.0, 2.0])) / lam), rtol=1e-6)
    assert float(out[0]) == 1.0


def test_tsallis_weights():
    costs = jnp.array([1.0, 2.0, 20.0])
    gamma, r = 10.0, 2.0
    out = w.tsallis_weights(costs, gamma, r, 1.0)
    # dJ = [0, 1, 19]; third exceeds gamma -> 0
    np.testing.assert_allclose(out, [1.0, (1 - 0.1) ** 1.0, 0.0], rtol=1e-5)


def test_tsallis_r_exponent():
    costs = jnp.array([1.0, 6.0])
    out = w.tsallis_weights(costs, 10.0, 3.0, 1.0)
    # (1 - 0.5)^(1/2)
    np.testing.assert_allclose(float(out[1]), np.sqrt(0.5), rtol=1e-5)


def test_cem_weights():
    costs = jnp.array([5.0, 1.0, 3.0, 2.0, 4.0, 6.0, 7.0, 8.0, 9.0, 10.0])
    out = w.cem_weights(costs, 0.3)
    np.testing.assert_allclose(out, [0, 1, 1, 1, 0, 0, 0, 0, 0, 0], atol=1e-6)


def test_free_energy_matches_reference_formula():
    """computeFreeEnergy (mppi_common.cu:1065-1081)."""
    weights = np.array([1.0, 0.5, 0.25, 0.125], np.float32)
    baseline, lam = 2.0, 0.7
    fe, fe_var, fe_mod = w.compute_free_energy(jnp.asarray(weights), baseline, lam)
    K = len(weights)
    norm = weights.sum() / K
    var = (weights**2).sum() / K
    exp_fe = -lam * np.log(norm) + baseline
    exp_var = lam * (var - norm**2)
    weird = exp_var / (norm * np.sqrt(K))
    exp_mod = lam * (weird + 0.5 * weird**2)
    np.testing.assert_allclose(float(fe), exp_fe, rtol=1e-5)
    np.testing.assert_allclose(float(fe_var), exp_var, rtol=1e-5)
    np.testing.assert_allclose(float(fe_mod), exp_mod, rtol=1e-5)


def test_risk_measures():
    from mppi_generic_tpu.utils import risk

    costs = jnp.arange(1.0, 11.0)
    assert float(risk.risk_measure(costs, "mean")) == 5.5
    assert float(risk.risk_measure(costs, "min")) == 1.0
    assert float(risk.risk_measure(costs, "max")) == 10.0
    # CVaR_0.9 of 1..10: VaR_0.9 = 9.1-quantile, so only cost 10 exceeds it
    # -> tail mean exactly 10 (a plain-quantile bug would return ~9.1)
    cv = float(risk.cvar(costs, 0.9))
    np.testing.assert_allclose(cv, 10.0, rtol=1e-6)
    # a lower alpha includes more of the tail
    np.testing.assert_allclose(float(risk.cvar(costs, 0.5)), 8.0, rtol=1e-6)
