"""A/B probe for the fused-solve split-cost variant on the bench chip.

Checks exact-sample parity (split vs combined share the PRNG stream, so U
must match bitwise) and times both variants with the dispatch-amortized
two-length-chain slope at the headline configs. Run on TPU:

    python scripts/split_cost_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mppi_generic_tpu.costs.cartpole import CartpoleQuadraticCost
from mppi_generic_tpu.costs.double_integrator import DoubleIntegratorCircleCost
from mppi_generic_tpu.models.cartpole import CartpoleDynamics
from mppi_generic_tpu.models.double_integrator import DoubleIntegratorDynamics
from mppi_generic_tpu.ops.pallas_solve import fused_solve_iteration
from mppi_generic_tpu.sampling.gaussian import GaussianDistribution


def parity(dyn, cost, K, T, tile_k=None, lam=1.0):
    """lam must be commensurate with the cost scale: with lam << J the
    normExp softmax is a degenerate argmin and exponentiates the (benign)
    summation-reassociation difference between the combined and split cost
    accumulations into large weight shifts."""
    samp = GaussianDistribution.create(
        std_dev=[1.0] * dyn.CONTROL_DIM,
        control_cost_coeff=[0.01] * dyn.CONTROL_DIM,
        pure_noise_percentage=0.1,
    )
    x0 = dyn.get_zero_state()
    mean = jnp.tile(jnp.linspace(-0.2, 0.3, dyn.CONTROL_DIM), (T, 1))
    outs = {}
    for split in (False, True):
        costs, crash, new_mean, baseline, eta, U = fused_solve_iteration(
            dyn, cost, samp, x0, mean, jnp.int32(1234), 0.02, lam, 0.0, K,
            optimization_stride=3, return_samples=True, tile_k=tile_k,
            split_cost=split,
        )
        outs[split] = jax.tree.map(
            np.asarray, (costs, crash, new_mean, baseline, eta, U)
        )
    c0, _, m0, b0, e0, U0 = outs[False]
    c1, _, m1, b1, e1, U1 = outs[True]
    np.testing.assert_array_equal(U0, U1)  # same PRNG stream -> same samples
    np.testing.assert_allclose(c1, c0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(m1, m0, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(b1, b0, rtol=2e-4)
    np.testing.assert_allclose(e1, e0, rtol=2e-3)
    print(f"  parity OK (K={K}, T={T}, tile_k={tile_k}): "
          f"max|dc|={np.abs(c1-c0).max():.2e}")


def slope_time(dyn, cost, K, T, split, tile_k=None, n=64):
    samp = GaussianDistribution.create(
        std_dev=[1.0] * dyn.CONTROL_DIM,
        control_cost_coeff=[0.01] * dyn.CONTROL_DIM,
    )
    x0 = dyn.get_zero_state()
    mean0 = jnp.zeros((T, dyn.CONTROL_DIM))

    def chain(mean, length):
        def body(carry, i):
            m = carry
            _, _, m2, _, _, _ = fused_solve_iteration(
                dyn, cost, samp, x0, m, i, 0.02, 1.0, 0.0, K,
                tile_k=tile_k, split_cost=split,
            )
            return m2, 0.0
        m_f, _ = jax.lax.scan(body, mean,
                              jnp.arange(length, dtype=jnp.int32))
        return m_f

    chain_j = jax.jit(chain, static_argnames="length")

    def run(length):
        jax.block_until_ready(chain_j(mean0, length))

    run(n); run(2 * n)
    deltas = []
    for _ in range(5):
        t0 = time.perf_counter(); run(n)
        t1 = time.perf_counter(); run(2 * n)
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / n)
    deltas.sort()
    return deltas[len(deltas) // 2]


def weighted_parity(dyn, cost, K, T, tile_k=None):
    """Compiled split-vs-combined parity for the precomputed-U fused path
    (fused_weighted_rollout) with the in-kernel LR term — the colored-noise
    solve's kernel."""
    from mppi_generic_tpu.ops.pallas_rollout import fused_weighted_rollout

    x0 = dyn.get_zero_state()
    U = jax.random.normal(jax.random.PRNGKey(7), (K, T, dyn.CONTROL_DIM)) * 0.5
    mean = jnp.tile(jnp.linspace(-0.2, 0.3, dyn.CONTROL_DIM), (T, 1))
    lrp = (mean, jnp.ones((T, dyn.CONTROL_DIM)),
           jnp.full((dyn.CONTROL_DIM,), 0.01), 1.0, 0.0, 0.9 * K)
    outs = {}
    for split in (False, True):
        outs[split] = jax.tree.map(np.asarray, fused_weighted_rollout(
            dyn, cost, x0, U, 0.02, 1.0, lr_params=lrp, tile_k=tile_k,
            split_cost=split,
        ))
    c0, _, m0, b0, e0 = outs[False]
    c1, _, m1, b1, e1 = outs[True]
    np.testing.assert_allclose(c1, c0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(m1, m0, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(b1, b0, rtol=2e-4)
    np.testing.assert_allclose(e1, e0, rtol=2e-3)
    print(f"  weighted parity OK (K={K}, T={T}): "
          f"max|dc|={np.abs(c1-c0).max():.2e}")


def weighted_slope_time(dyn, cost, K, T, split, tile_k=None, n=64):
    """Per-call device slope of fused_weighted_rollout; U threads through
    the chain (a cheap AXPY, identical across variants) so XLA cannot
    hoist the kernel out of the scan."""
    from mppi_generic_tpu.ops.pallas_rollout import fused_weighted_rollout

    x0 = dyn.get_zero_state()
    C = dyn.CONTROL_DIM
    mean = jnp.zeros((T, C))
    lrp = (mean, jnp.ones((T, C)), jnp.full((C,), 0.01), 1.0, 0.0, 0.9 * K)
    U0 = jax.random.normal(jax.random.PRNGKey(9), (K, T, C)) * 0.5

    def chain(U, length):
        def body(carry, _):
            _, _, new_mean, _, _ = fused_weighted_rollout(
                dyn, cost, x0, carry, 0.02, 1.0, lr_params=lrp,
                tile_k=tile_k, split_cost=split,
            )
            return carry * 0.999 + new_mean[None] * 1e-3, 0.0
        U_f, _ = jax.lax.scan(body, U, None, length=length)
        return U_f

    chain_j = jax.jit(chain, static_argnames="length")

    def run(length):
        jax.block_until_ready(chain_j(U0, length))

    run(n); run(2 * n)
    deltas = []
    for _ in range(5):
        t0 = time.perf_counter(); run(n)
        t1 = time.perf_counter(); run(2 * n)
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / n)
    deltas.sort()
    return deltas[len(deltas) // 2]


def main():
    assert jax.default_backend() == "tpu", "run on the bench chip"
    di, dicost = DoubleIntegratorDynamics.create(), DoubleIntegratorCircleCost()
    cp, cpcost = CartpoleDynamics.create(), CartpoleQuadraticCost()

    print("== parity ==")
    # forced split + return_samples needs tile_k <= 2048 for VMEM (the auto
    # gate accounts for the emission buffer; forcing bypasses it)
    parity(di, dicost, K=2048, T=100)
    parity(di, dicost, K=8192, T=100, tile_k=2048)
    parity(cp, cpcost, K=8192, T=100, tile_k=2048, lam=200.0)

    print("== op-weight heuristic predictions ==")
    from mppi_generic_tpu.ops.pallas_rollout import _split_profitable

    for name, d, c in (("DI/circle", di, dicost), ("cartpole", cp, cpcost)):
        print(f"  {name}: split_profitable={_split_profitable(d, c)}")

    print("== timing (per-solve device slope, µs) ==")
    for dyn, cost, name in ((di, dicost, "DI"), (cp, cpcost, "cartpole")):
        for K in (1024, 8192, 32768):
            for tile in (None, 2048):
                ts = {}
                for split in (False, True):
                    ts[split] = slope_time(dyn, cost, K, 100, split,
                                           tile_k=tile) * 1e6
                print(f"  {name:9s} K={K:6d} tile={tile}: "
                      f"combined {ts[False]:7.1f}  split {ts[True]:7.1f}  "
                      f"speedup {ts[False]/ts[True]:.2f}x")

    print("== precomputed-U path (fused_weighted_rollout, in-kernel LR) ==")
    weighted_parity(di, dicost, K=8192, T=100)
    for K in (1024, 8192, 32768):
        ts = {}
        for split in (False, True):
            ts[split] = weighted_slope_time(di, dicost, K, 100, split) * 1e6
        print(f"  DI weighted K={K:6d}: "
              f"combined {ts[False]:7.1f}  split {ts[True]:7.1f}  "
              f"speedup {ts[False]/ts[True]:.2f}x")


if __name__ == "__main__":
    main()
