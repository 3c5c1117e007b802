"""Live TPU plant smoke — exercises the full real-time runtime on the real
backend: donated solve dispatch, dynamics hot-swap (constraint rows must
reach the native publisher's clamp), and the host-side actuation fast path,
with an estimator thread feeding states while the solver loop runs.

Run:  python scripts/tpu_plant_smoke.py
(~3-4 min through the relay; sub-second solves co-located.)
"""

import sys
import threading
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.instantiations import double_integrator_mppi
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.runtime.plant import BasePlant


class SmokePlant(BasePlant):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.n_pub = 0
        self.last_u = None

    def pub_control(self, u):
        self.n_pub += 1
        self.last_u = u


def main():
    ctrl, _ = double_integrator_mppi(
        num_rollouts=1024, num_timesteps=48, kernel="pallas_fused"
    )
    cs = ctrl.init_state(jax.random.key(0, impl="rbg"))
    plant = SmokePlant(ctrl, cs, hz=10.0)
    dyn = ctrl.dynamics
    x = np.array([2.0, 0.0, 0.0, 1.0], np.float32)

    # pre-warm the solve compile outside the timed loop
    plant.update_state(x, 0.0)
    assert plant.run_control_iteration(timeout=5.0)

    stop = threading.Event()

    def solver():
        while not stop.is_set():
            plant.run_control_iteration(timeout=0.1)

    th = threading.Thread(target=solver)
    th.start()

    t0 = time.monotonic()
    swap_done = False
    for _ in range(400):
        t = 0.01 + time.monotonic() - t0
        plant.update_state(x, t)
        if plant.last_u is not None:
            u = jnp.asarray(plant.last_u)
            x = np.asarray(
                dyn.step(jnp.asarray(x), u, 0.0, ctrl.dt)[0], np.float32
            )
        if not swap_done and t > 4.0:
            plant.set_dynamics_params(DoubleIntegratorDynamics.create(
                control_ranges=[[-0.5, 0.5], [-0.5, 0.5]]
            ))
            swap_done = True
        time.sleep(0.02)
    stop.set()
    th.join(timeout=5)

    print(f"iterations: {plant.stats.num_iterations}  "
          f"published: {plant.n_pub}  "
          f"avg optimize ms: {plant.stats.avg_optimize_ms:.2f}")
    assert plant.stats.num_iterations > 5
    assert plant.n_pub > 50
    assert plant.last_u is not None and np.all(np.isfinite(plant.last_u))
    # the tightened hot-swapped range must reach the native clamp
    assert np.all(np.abs(plant.last_u) <= 0.5 + 1e-5), plant.last_u
    print("TPU PLANT SMOKE PASSED")


if __name__ == "__main__":
    main()
