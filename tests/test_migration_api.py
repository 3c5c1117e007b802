"""Acceptance test for docs/migration.md: every API mapping promised to a
reference (CUDA) user must exist and work end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu import instantiations, ops
from mppi_generic_tpu.controllers import RobustMPPI, VanillaMPPI
from mppi_generic_tpu.costs import CartpoleQuadraticCost, DoubleIntegratorCircleCost
from mppi_generic_tpu.feedback import DDPFeedback
from mppi_generic_tpu.models import CartpoleDynamics, DoubleIntegratorDynamics
from mppi_generic_tpu.parallel import make_sample_mesh, shard_controller
from mppi_generic_tpu.runtime.checkpoint import load_state, save_state
from mppi_generic_tpu.sampling import GaussianDistribution


def test_migration_guide_control_loop_mappings(tmp_path):
    dyn = CartpoleDynamics.create(cart_mass=1.0, pole_mass=1.0, pole_length=1.0)
    ctrl = VanillaMPPI(
        dynamics=dyn,
        cost=CartpoleQuadraticCost(),
        sampler=GaussianDistribution.create(std_dev=[5.0]),
        dt=0.02, lam=0.25, alpha=0.0,
        num_timesteps=32, num_rollouts=128, num_iters=1,
        return_samples=True,
    )
    fb = DDPFeedback.create(dyn, 0.02)
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x = jnp.zeros(4)

    # computeControl -> solve
    result, cs = ctrl.solve(x, cs, 0)
    # getControlSeq / getTargetStateSeq / getFreeEnergyStatistics
    assert result.control_mean.shape == (32, 1)
    assert result.state_trajectory.shape == (33, 4)
    assert np.isfinite(float(result.free_energy.free_energy_mean))
    # slideControlSequence
    cs = ctrl.slide_control_sequence(cs, 1)
    # getCurrentControl (wall-time interpolation)
    u = ctrl.get_current_control(result, 0.013)
    assert u.shape == (1,)
    # computeFeedback + k_
    fb_state = fb.compute_feedback(x, result.state_trajectory[:32],
                                   result.control_mean)
    u_fb = fb.k(x + 0.1, result.state_trajectory[0], 0, fb_state)
    assert u_fb.shape == (1,)
    # chooseAppropriateKernel
    tuned = ops.choose_appropriate_kernel(ctrl, x, num_evaluations=1,
                                          candidates=("combined", "split"))
    assert tuned.kernel in ("combined", "split")
    # visualize (copySampledControlFromDevice analog)
    vis = ctrl.visualize(x, result, num_vis=4, num_top=2)
    assert vis.outputs.shape[0] == 6
    # setParams -> .replace
    ctrl2 = ctrl.replace(lam=0.5, cost=ctrl.cost.replace())
    assert float(ctrl2.lam) == 0.5
    # warm-start snapshot round trip
    path = str(tmp_path / "warm")
    save_state(path, cs)
    restored = load_state(path, ctrl.init_state(jax.random.PRNGKey(1)))
    np.testing.assert_allclose(np.asarray(restored.control_mean),
                               np.asarray(cs.control_mean))


def test_migration_guide_rmppi_and_sharding():
    dyn = DoubleIntegratorDynamics.create()
    ctrl = RobustMPPI(
        dynamics=dyn, cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16, num_rollouts=64,
        num_candidates=9, samples_per_condition=16,
        feedback=DDPFeedback.create(dyn, 0.02),
    )
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x = jnp.array([2.0, 0.0, 0.0, 1.0])
    # updateImportanceSamplingControl
    cs, cand_fe = ctrl.update_importance_sampling(x, cs, 1)
    assert cand_fe.shape == (9,)
    res, cs = ctrl.solve(x, cs)
    assert np.isfinite(float(res.real.baseline))
    # multi-chip sharding (capability beyond the reference)
    mesh = make_sample_mesh(num_devices=8)
    sharded = shard_controller(ctrl.replace(), mesh)
    assert sharded.sample_sharding is not None


def test_migration_guide_instantiations():
    ctrl, fb = instantiations.cartpole_mppi(num_rollouts=64, num_timesteps=8)
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    res, _ = ctrl.solve(jnp.zeros(4), cs)
    assert np.all(np.isfinite(np.asarray(res.control_mean)))
