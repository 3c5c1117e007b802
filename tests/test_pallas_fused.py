"""CPU-side tests for the fused sample+rollout kernel (the TPU hardware-PRNG
path). The compiled behavior is verified on hardware by
scripts/tpu_selfcheck.py; on the CPU test backend the kernel must cleanly
refuse (PallasIncompatible) so the auto-tuner and controllers fall back."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.ops import PallasIncompatible, choose_appropriate_kernel
from mppi_generic_tpu.ops.pallas_rollout import fused_sample_rollout_costs
from mppi_generic_tpu.sampling import (
    ColoredNoiseDistribution,
    GaussianDistribution,
    NLNDistribution,
)


def test_fused_sampling_refuses_on_cpu():
    dyn = DoubleIntegratorDynamics.create()
    samp = GaussianDistribution.create(std_dev=[1.0, 1.0])
    with pytest.raises(PallasIncompatible):
        fused_sample_rollout_costs(
            dyn, DoubleIntegratorCircleCost(), samp, jnp.zeros(4),
            jnp.zeros((8, 2)), jnp.int32(0), 0.02, 1.0, 0.0, 128,
        )


def test_fused_sampling_refuses_non_gaussian():
    dyn = DoubleIntegratorDynamics.create()
    samp = ColoredNoiseDistribution.create(
        std_dev=[1.0, 1.0], exponents=[1.0, 1.0]
    )
    with pytest.raises(PallasIncompatible):
        fused_sample_rollout_costs(
            dyn, DoubleIntegratorCircleCost(), samp, jnp.zeros(4),
            jnp.zeros((8, 2)), jnp.int32(0), 0.02, 1.0, 0.0, 128,
        )


def test_fused_sampling_accepts_smooth_type():
    """Smooth-MPPI passes the type gate when its derivative-mean state is
    supplied; without it the refusal names the missing state."""
    from mppi_generic_tpu.sampling import SmoothMPPIDistribution

    dyn = DoubleIntegratorDynamics.create()
    samp = SmoothMPPIDistribution.create(std_dev=[0.5, 0.5], num_timesteps=8)
    with pytest.raises(PallasIncompatible, match="sampler_state"):
        fused_sample_rollout_costs(
            dyn, DoubleIntegratorCircleCost(), samp, jnp.zeros(4),
            jnp.zeros((8, 2)), jnp.int32(0), 0.02, 1.0, 0.0, 128,
        )
    with pytest.raises(PallasIncompatible, match="hardware PRNG"):
        fused_sample_rollout_costs(
            dyn, DoubleIntegratorCircleCost(), samp, jnp.zeros(4),
            jnp.zeros((8, 2)), jnp.int32(0), 0.02, 1.0, 0.0, 128,
            sampler_state=samp.init_state(),
        )


def test_fused_sampling_accepts_nln_type():
    """NLN passes the distribution-type gate (its noise generates in-kernel);
    on the CPU test backend the refusal must cite the PRNG backend, not the
    sampler type."""
    dyn = DoubleIntegratorDynamics.create()
    samp = NLNDistribution.create(std_dev=[0.5, 0.5])
    with pytest.raises(PallasIncompatible, match="hardware PRNG"):
        fused_sample_rollout_costs(
            dyn, DoubleIntegratorCircleCost(), samp, jnp.zeros(4),
            jnp.zeros((8, 2)), jnp.int32(0), 0.02, 1.0, 0.0, 128,
        )


def test_fused_solve_refuses_on_cpu():
    """The fully-fused solve-iteration kernel (ops/pallas_solve.py) needs
    the TPU hardware PRNG; off-TPU it must refuse so VanillaMPPI falls
    through to the fused-rollout / XLA routes."""
    from mppi_generic_tpu.ops.pallas_solve import fused_solve_iteration

    dyn = DoubleIntegratorDynamics.create()
    samp = GaussianDistribution.create(std_dev=[1.0, 1.0])
    with pytest.raises(PallasIncompatible, match="hardware PRNG"):
        fused_solve_iteration(
            dyn, DoubleIntegratorCircleCost(), samp, jnp.zeros(4),
            jnp.zeros((8, 2)), jnp.int32(0), 0.02, 1.0, 0.0, 128,
        )


def test_fused_solve_refuses_non_gaussian():
    from mppi_generic_tpu.ops.pallas_solve import fused_solve_iteration

    dyn = DoubleIntegratorDynamics.create()
    samp = ColoredNoiseDistribution.create(
        std_dev=[1.0, 1.0], exponents=[1.0, 1.0]
    )
    with pytest.raises(PallasIncompatible, match="Gaussian or NLN"):
        fused_solve_iteration(
            dyn, DoubleIntegratorCircleCost(), samp, jnp.zeros(4),
            jnp.zeros((8, 2)), jnp.int32(0), 0.02, 1.0, 0.0, 128,
        )


def test_pallas_fused_controller_falls_back_on_cpu():
    """kernel='pallas_fused' with a non-exp weight transform must skip the
    fused-solve route entirely (its online softmax is exp-only), and since
    the round-4 review pass the whole pallas_fused branch falls back to
    XLA sampling + the combined rollout when the sample kernel refuses
    (here: CPU has no hardware-PRNG lowering) instead of letting the raise
    escape solve(). The fallback samples with the same key the combined
    path would use, so the solves must MATCH — the gating never silently
    produces wrong weights."""

    def build(kernel):
        return VanillaMPPI(
            dynamics=DoubleIntegratorDynamics.create(),
            cost=DoubleIntegratorCircleCost(),
            sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
            num_timesteps=16, num_rollouts=128, kernel=kernel,
            weight_transform="tsallis",
        )

    key = jax.random.PRNGKey(0)
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    res_f, _ = build("pallas_fused").solve(
        x0, build("pallas_fused").init_state(key))
    res_c, _ = build("combined").solve(
        x0, build("combined").init_state(key))
    np.testing.assert_allclose(np.asarray(res_f.control_mean),
                               np.asarray(res_c.control_mean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_f.weights),
                               np.asarray(res_c.weights),
                               rtol=1e-5, atol=1e-6)


def test_autotune_skips_fused_on_cpu():
    ctrl = VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16, num_rollouts=128,
    )
    tuned = choose_appropriate_kernel(
        ctrl, jnp.array([2.0, 0.0, 0.0, 1.0]), num_evaluations=1,
        candidates=("combined", "pallas_fused"),
    )
    assert tuned.kernel == "combined"


def test_autotune_split_sweep_arbitration(monkeypatch):
    """The tuner's split-cost sweep (TPU-gated in real runs) must: time the
    split candidate at tile=None (its own tile heuristic, not the combined
    winner's tile), adopt (split=True, tile=None) when split measures
    faster, keep (split=False, best_tile) otherwise, and cache the triple.
    Timing and the backend gate are stubbed so this tests ONLY the
    arbitration logic."""
    from mppi_generic_tpu.ops import autotune

    ctrl = VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16, num_rollouts=256,
    )
    monkeypatch.setattr(autotune.jax, "default_backend", lambda: "tpu")

    seen = []

    def fake_time_solve(cand, x0, cs, n=10):
        seen.append((cand.kernel, cand.pallas_tile_k, cand.pallas_split_cost))
        if cand.kernel != "pallas":
            return 5e-3  # other kernels slow -> pallas wins the sweep
        if cand.pallas_split_cost is True:
            assert cand.pallas_tile_k is None  # split gets its own tile
            return 1e-4
        return 2e-4

    monkeypatch.setattr(autotune, "time_solve", fake_time_solve)
    autotune._CACHE.clear()
    tuned = autotune.choose_appropriate_kernel(
        ctrl, jnp.array([2.0, 0.0, 0.0, 1.0]),
        candidates=("combined", "pallas"),
    )
    assert tuned.kernel == "pallas"
    assert tuned.pallas_split_cost is True
    assert tuned.pallas_tile_k is None
    assert any(s == ("pallas", None, True) for s in seen)
    # cached triple is replayed without re-timing
    n_timed = len(seen)
    tuned2 = autotune.choose_appropriate_kernel(
        ctrl, jnp.array([2.0, 0.0, 0.0, 1.0]),
        candidates=("combined", "pallas"),
    )
    assert len(seen) == n_timed
    assert (tuned2.kernel, tuned2.pallas_tile_k,
            tuned2.pallas_split_cost) == ("pallas", None, True)

    # split measuring SLOWER keeps the combined winner's tile and False
    # (clear the on-disk decision too — the conftest fixture points it at a
    # temp dir, but the first sweep above stored its triple there)
    autotune._CACHE.clear()
    autotune._DISK.clear()
    seen.clear()

    def fake_slow_split(cand, x0, cs, n=10):
        seen.append((cand.kernel, cand.pallas_tile_k, cand.pallas_split_cost))
        if cand.kernel != "pallas":
            return 5e-3
        return 9e-4 if cand.pallas_split_cost is True else 2e-4

    monkeypatch.setattr(autotune, "time_solve", fake_slow_split)
    tuned3 = autotune.choose_appropriate_kernel(
        ctrl, jnp.array([2.0, 0.0, 0.0, 1.0]),
        candidates=("combined", "pallas"),
    )
    assert tuned3.kernel == "pallas"
    assert tuned3.pallas_split_cost is False
    autotune._CACHE.clear()


def test_split_auto_grid_cap():
    """On the U-input fused paths the sequential loop's latency floor is
    per grid step, so AUTO split declines past 4 grid steps (measured on
    hardware, BASELINE.md); a forced True is honored as given."""
    from mppi_generic_tpu.models.double_integrator import (
        DoubleIntegratorDynamics,
    )
    from mppi_generic_tpu.ops.pallas_rollout import _prep_fused_rollout

    dyn = DoubleIntegratorDynamics.create()
    cost = DoubleIntegratorCircleCost()
    x0 = dyn.get_zero_state()

    def resolved(K, tile, split, T=20):
        U = jnp.zeros((K, T, dyn.CONTROL_DIM))
        prep = _prep_fused_rollout(dyn, cost, x0, U, None, tile, True, 0,
                                   split_cost=split)
        return prep[-2], prep[5]  # resolved split_cost, tile_k

    assert resolved(512, 128, None)[0] is True   # 4 grids: auto keeps split
    assert resolved(1024, 128, None)[0] is False  # 8 grids: auto declines
    assert resolved(1024, 128, True)[0] is True  # forced: honored

    # the fit gate must judge the POST-shrink tile: at the colored-headline
    # shape (K=8192, T=100, DI) the default tile 4096 exceeds the working-
    # set budget but the shrink heuristic's tile 2048 fits at 4 grids —
    # auto must resolve split=True there (review finding, round 3)
    s, tile = resolved(8192, None, None, T=100)
    assert s is True and tile == 2048
    # ...and still decline at K=32768 (16 grids at the shrunk tile),
    # keeping the combined default tile
    s, tile = resolved(32768, None, None, T=100)
    assert s is False and tile == 4096


def test_sticky_crash_split_parity():
    """time_parallel_crash costs (sticky-prefix crash, e.g. the AutoRally
    track cost) must produce IDENTICAL crash flags and matching costs under
    the split kernels' dual-evaluation + prefix-OR pass, on a population
    where some but not all samples crash (the boundary stripe sits at the
    edge of reach so crash timing varies across samples and chunks)."""
    import numpy as np

    from mppi_generic_tpu.costs.autorally import ARStandardCost
    from mppi_generic_tpu.maps.texture import MapTexture2D
    from mppi_generic_tpu.models.bicycle_slip import BicycleSlipDynamics
    from mppi_generic_tpu.ops.pallas_rollout import (
        fused_rollout_costs,
        fused_weighted_rollout,
    )
    from mppi_generic_tpu.ops.rollout import rollout_combined

    assert ARStandardCost().time_parallel_crash()
    assert not ARStandardCost().time_parallel_cost()

    # AUTO must never PREDICT a split win for map-bearing costs: in-kernel
    # map queries lose to XLA at every measured size and the split
    # variant's one-hot temporaries can crash the Mosaic compile (review
    # finding, round 3) — forced True and the tuner sweep stay available
    from mppi_generic_tpu.models.racer_dubins import RacerDubinsDynamics
    from mppi_generic_tpu.ops.pallas_rollout import _split_profitable

    big = MapTexture2D.create(np.zeros((128, 128), np.float32),
                              origin=(-64, -64, 0), resolution=1.0)
    assert not _split_profitable(
        RacerDubinsDynamics.create(),
        ARStandardCost(costmap=big, output_indices=(0, 1, 2, 3, 4, 5)),
    )

    data = np.zeros((32, 32), np.float32)
    data[:, 21:] = 1.0  # boundary stripe at world x >= 5
    tex = MapTexture2D.create(data, origin=(-16, -16, 0), resolution=1.0)
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=tex, output_indices=(0, 1, 2, 8, 5, 6))
    x0 = dyn.get_zero_state().at[5].set(4.0)  # VEL_X: rolling start
    K, T = 384, 48
    U = jax.random.normal(jax.random.PRNGKey(0), (K, T, dyn.CONTROL_DIM))
    U = U * 0.9

    c_ref, _, cr_ref = rollout_combined(dyn, cost, x0, U, 0.02)
    n_crash = int(np.asarray(cr_ref).sum())
    assert 0 < n_crash < K, n_crash  # mixed population or the test is void

    c0, cr0 = fused_rollout_costs(dyn, cost, x0, U, 0.02, split_cost=False)
    c1, cr1 = fused_rollout_costs(dyn, cost, x0, U, 0.02, split_cost=True)
    np.testing.assert_array_equal(np.asarray(cr0), np.asarray(cr_ref))
    np.testing.assert_array_equal(np.asarray(cr1), np.asarray(cr_ref))
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c_ref),
                               rtol=3e-5, atol=3e-4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=3e-5, atol=3e-3)

    o0 = fused_weighted_rollout(dyn, cost, x0, U, 0.02, 100.0,
                                split_cost=False)
    o1 = fused_weighted_rollout(dyn, cost, x0, U, 0.02, 100.0,
                                split_cost=True)
    for a, b, name in zip(o0, o1, ("costs", "crash", "mean", "baseline",
                                   "eta")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=3e-3, err_msg=name)


def test_time_parallel_cost_declarations():
    """time_parallel_cost() is a per-cost correctness statement the split
    fused-solve variant relies on (ops/pallas_solve.py): crash-free +
    time-broadcastable costs opt in; crash-bearing or t-indexed costs must
    stay False. The declaration is also checked semantically: an eligible
    cost evaluated with a vectorized leading time axis must reproduce the
    per-timestep scalar evaluation."""
    import numpy as np

    from mppi_generic_tpu.costs.cartpole import CartpoleQuadraticCost
    from mppi_generic_tpu.costs.quadratic import QuadraticCost

    from mppi_generic_tpu.costs.double_integrator import (
        DoubleIntegratorRobustCost,
    )
    from mppi_generic_tpu.costs.quadrotor import QuadrotorQuadraticCost

    di = DoubleIntegratorCircleCost()
    assert di.time_parallel_cost()
    dir_ = DoubleIntegratorRobustCost()
    assert dir_.time_parallel_cost()
    cp = CartpoleQuadraticCost()
    assert cp.time_parallel_cost()
    qq = QuadrotorQuadraticCost()
    assert qq.time_parallel_cost()
    assert QuadraticCost.create(goal=jnp.zeros(4)).time_parallel_cost()
    assert not QuadraticCost.create(goal=jnp.zeros((7, 4))).time_parallel_cost()
    # base default is conservative
    from mppi_generic_tpu.costs.base import Cost

    assert not Cost().time_parallel_cost()

    # the traced op-weight heuristic (calibrated on hardware,
    # scripts/split_cost_probe.py): split auto-enables only where the
    # removable cost work dominates the sequential loop — DI-class pairs
    # yes, transcendental-heavy-dynamics pairs (cartpole, quadrotor) no
    from mppi_generic_tpu.models.cartpole import CartpoleDynamics
    from mppi_generic_tpu.models.double_integrator import (
        DoubleIntegratorDynamics,
    )
    from mppi_generic_tpu.models.quadrotor import QuadrotorDynamics
    from mppi_generic_tpu.ops.pallas_rollout import _split_profitable

    didyn = DoubleIntegratorDynamics.create()
    assert _split_profitable(didyn, di)
    assert _split_profitable(didyn, dir_)
    assert not _split_profitable(CartpoleDynamics.create(), cp)
    assert not _split_profitable(QuadrotorDynamics.create(), qq)

    # semantic check: vectorized-time evaluation == per-t evaluation
    Tc = 6
    key = jax.random.PRNGKey(3)
    for cost, O, C in ((di, 4, 2), (cp, 4, 1), (dir_, 4, 2), (qq, 13, 4)):
        y = jax.random.normal(key, (O, Tc))
        u = jax.random.normal(key, (C, Tc))
        tb = jnp.arange(Tc, dtype=jnp.float32).reshape(Tc)
        c_vec, _ = cost.running_cost(y, u, tb, jnp.int32(0))
        c_seq = jnp.stack([
            cost.running_cost(y[:, t], u[:, t], jnp.float32(t),
                              jnp.int32(0))[0]
            for t in range(Tc)
        ])
        np.testing.assert_allclose(np.asarray(c_vec), np.asarray(c_seq),
                                   rtol=1e-6, atol=1e-6)
