"""Multi-chip sample-axis sharding.

The reference is single-GPU (no NCCL/MPI anywhere in its tree; SURVEY §2.12).
The TPU framework makes the sample axis a first-class mesh axis: rollouts
shard over chips, and the MPPI reductions (baseline = min, normalizer = sum,
weighted mean update = weighted sum) lower to psum/pmin collectives over
ICI/DCN automatically once the (K, T, C) sample tensor carries a
``NamedSharding(mesh, P("samples"))`` constraint — the XLA-collective
equivalent of the reference's in-block tree reductions
(core/mppi_common.cu:1191-1254).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SAMPLE_AXIS = "samples"


def make_sample_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first N) devices with axis "samples"."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:num_devices]
    return jax.make_mesh(
        (len(devices),),
        (SAMPLE_AXIS,),
        devices=np.array(devices),
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def sample_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """NamedSharding placing the leading (sample) axis across the mesh."""
    spec = P(SAMPLE_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host bring-up: initialize jax.distributed so a DCN-connected
    pod slice presents all chips in ``jax.devices()`` and the sample mesh
    spans hosts (SURVEY §2.12 — the reference has no distributed backend;
    this is the TPU-native scaling path). No-op if already initialized or
    running single-process with no coordinator configured."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()  # env-driven (TPU pod autodetect)
        except (RuntimeError, ValueError):
            pass  # already initialized or single-process environment
    else:
        # explicit multi-host config: a failure here means the pod is NOT
        # what the caller asked for — never silently fall back to one host
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def shard_controller(controller, mesh: Mesh):
    """Return a copy of ``controller`` whose solves shard the sample axis
    over ``mesh``. Requires num_rollouts % mesh size == 0.

    The fused Pallas rollout kernels run **per shard** under
    ``jax.shard_map`` (ops/pallas_rollout.py): each chip launches the
    single-chip kernel on its K/n sample slice, and only the MPPI
    reductions (baseline pmin, normalizer / weighted-mean psum) cross
    chips — so a sharded solve keeps the fused-kernel rate per chip."""
    n = mesh.devices.size
    if controller.num_rollouts % n != 0:
        raise ValueError(
            f"num_rollouts={controller.num_rollouts} not divisible by mesh size {n}"
        )
    ctrl = controller.replace(sample_sharding=sample_sharding(mesh))
    # the (sample-independent) DDP synthesis runs its Pallas kernel inside
    # a fully-replicated shard_map region on a mesh — every device computes
    # the same gains; pjit cannot partition a bare single-chip pallas_call
    fb = getattr(ctrl, "feedback", None)
    if fb is not None and hasattr(fb, "mesh"):
        ctrl = ctrl.replace(feedback=fb.replace(mesh=mesh))
    return ctrl
