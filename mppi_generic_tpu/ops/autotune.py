"""Empirical kernel auto-tuning — the analog of the reference's
``chooseAppropriateKernel`` (controllers/MPPI/mppi_controller.cu:45-143),
which times the single-kernel vs split-kernel variants for 10 launches at
construction and picks the faster.

Here the candidates are the four rollout paths ("combined" XLA scan,
"split" scan + time-parallel cost, "pallas" fused rollout kernel,
"pallas_fused" sample+rollout kernel); results are cached per
(controller/dynamics/cost/sampler type, K, T, sharding, backend) so a
plant that rebuilds controllers does not re-tune.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from mppi_generic_tpu.ops.pallas_rollout import (
    PallasIncompatible,
    _check_compatible,
)

_CACHE: dict = {}
DEFAULT_CANDIDATES = ("combined", "split", "pallas", "pallas_fused")

# ---------------------------------------------------------------------------
# On-disk decision cache: the reference re-measures only 10 launches of 2
# pre-compiled kernels per construction (mppi_controller.cu:45-143); this
# tuner's sweep compiles 4+ kernel variants, which through a ~27 ms/dispatch
# relay dominates plant startup. Decisions persist per (config key, device
# kind, jax version) so a second process skips the sweep entirely; set
# MPPI_RETUNE=1 (or pass retune=True) to force a fresh sweep.
# ---------------------------------------------------------------------------
_DISK_LOADED = False
_DISK: dict = {}


def _disk_path():
    root = os.environ.get("MPPI_TUNE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "mppi_generic_tpu"
    )
    return os.path.join(root, "autotune.json")


def _disk_key(key) -> str:
    """Stable string form of a _config_key + the environment that could
    invalidate a measured choice (device kind, jax/jaxlib versions)."""
    try:
        dev = jax.devices()[0].device_kind
    except Exception:
        dev = "unknown"
    import jaxlib

    return repr((key, dev, jax.__version__, jaxlib.__version__))


def _disk_load():
    global _DISK_LOADED, _DISK
    if _DISK_LOADED:
        return _DISK
    _DISK_LOADED = True
    try:
        with open(_disk_path()) as f:
            _DISK = json.load(f)
    except (OSError, ValueError):
        _DISK = {}
    return _DISK


def _disk_store(key_str, decision):
    _disk_load()
    _DISK[key_str] = list(decision)
    path = _disk_path()
    tmp = path + f".tmp{os.getpid()}"
    try:
        # merge the CURRENT file contents first: another plant process may
        # have persisted its own decisions since this process loaded, and
        # dumping our stale snapshot would silently drop them (its next
        # restart would re-run the multi-compile sweep the cache exists to
        # avoid). Only the entry being stored RIGHT NOW wins a collision —
        # re-asserting this process's whole snapshot would undo keys a
        # peer re-tuned since we loaded (e.g. an operator's MPPI_RETUNE=1
        # run). Peers' entries are adopted in-process too.
        try:
            with open(path) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
        merged[key_str] = list(decision)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=0)
        os.replace(tmp, path)  # atomic vs concurrent plants
        # adopt the merged view only after the write landed (a failed
        # write must not drop this process's unpersisted entries)
        _DISK.clear()
        _DISK.update(merged)
    except OSError:
        pass  # read-only home: in-process cache still works


def _config_key(controller, candidates):
    # the leaf-shape signature distinguishes parameter-wise-different
    # models of the same type (e.g. elevation map attached vs flat ground):
    # whether a model lowers in Mosaic can depend on which leaves exist,
    # not just on the class — a cached choice must never cross that line
    leaf_sig = tuple(
        tuple(jnp.shape(l))
        for l in jax.tree_util.tree_leaves(
            (controller.dynamics, controller.cost)
        )
    )
    return (
        type(controller).__name__,
        type(controller.dynamics).__name__,
        type(controller.cost).__name__,
        type(controller.sampler).__name__,
        int(controller.num_rollouts),
        int(controller.num_timesteps),
        controller.sample_sharding is not None,
        controller.pallas_tile_k,
        controller.pallas_split_cost,
        jax.default_backend(),
        tuple(candidates),
        leaf_sig,
    )


def _kernel_supported(controller, name) -> bool:
    """Cheap static compatibility check (the same gates the kernels apply),
    so a cached choice is never handed to a controller whose *parameters*
    (not type) are incompatible — e.g. an oversized NN checkpoint."""
    if not name.startswith("pallas"):
        return True
    sh = controller.sample_sharding
    if sh is not None:
        # shard_mapped Pallas: the sample axis must divide the mesh
        axis = sh.spec[0] if len(sh.spec) else None
        if axis is not None and controller.num_rollouts % sh.mesh.shape[axis]:
            return False
    try:
        leaves = [
            jnp.asarray(l) for l in jax.tree_util.tree_leaves(
                (controller.dynamics, controller.cost)
            )
        ]
        _check_compatible(controller.dynamics, leaves, allow_recurrent=True)
    except PallasIncompatible:
        return False
    if name == "pallas_fused":
        from mppi_generic_tpu.sampling.gaussian import GaussianDistribution
        from mppi_generic_tpu.sampling.nln import NLNDistribution
        from mppi_generic_tpu.sampling.smooth import SmoothMPPIDistribution

        if type(controller.sampler) not in (GaussianDistribution,
                                            NLNDistribution,
                                            SmoothMPPIDistribution):
            return False
        if jax.default_backend() != "tpu":
            return False
    return True


@functools.partial(jax.jit, static_argnames="length")
def _solve_chain(controller, x, s, length):
    """``length`` state-threaded solves in one jitted program. Module-level
    so repeat time_solve calls on the SAME controller pytree (perf-gate
    fixture -> tuner sweep, tuner re-runs) hit the jit cache instead of
    recompiling a fresh closure every call — the combined-XLA chain costs
    minutes of compile at K=8192."""

    def body(carry, _):
        x, s = carry
        _, s2 = controller.solve(x, s)
        return (x, s2), 0.0

    (_, s_f), _ = jax.lax.scan(body, (x, s), None, length=length)
    return s_f


def time_solve(controller, x0, ctrl_state, num_evaluations=10):
    """Per-solve seconds, dispatch-amortized: times jitted chains of n and
    2n state-threaded solves and returns (t_2n - t_n) / n, so a fixed
    host->device dispatch latency (tens of ms through a TPU relay, vs
    ~0.1 ms solves) cancels instead of swamping the kernel differences the
    tuner exists to measure. Median of 3 repeats; the reference's 10-launch
    timing loop (mppi_controller.cu:45-143) has the same amortizing effect
    because its launches queue on one CUDA stream."""
    # chain length sets the jitter floor: the n-vs-2n marginal time must
    # clear the relay's run-to-run dispatch jitter (several ms) or every
    # delta is noise — observed: a whole 4-kernel sweep reading the 1e-9
    # clamp for every candidate. Start short and escalate n until the
    # total marginal signal (median delta * n) is comfortably above the
    # jitter, exactly like bench._steady_state_ms escalates its scan
    # lengths. CPU dispatch is ~us: short chains, no escalation.
    on_tpu = jax.default_backend() == "tpu"
    n = max(int(num_evaluations), 32 if on_tpu else 4)

    def run(length):
        out = _solve_chain(controller, x0, ctrl_state, length)
        # device_get, not block_until_ready: through the axon relay the
        # latter can report ready before the chain has executed (measured:
        # a 512-solve chain "blocking" in 0.1 ms while device_get on the
        # same output waits the real 30+ ms). The extra fetch is one small
        # leaf and a fixed RTT, which cancels in the n-vs-2n delta.
        jax.device_get(jax.tree_util.tree_leaves(out)[0])

    def measure(n):
        run(n)  # compiles both lengths (same program shape, different
        run(2 * n)  # trip counts -> separate executables) + warms caches
        deltas = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(n)
            t1 = time.perf_counter()
            run(2 * n)
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) / n)
        deltas.sort()
        return deltas[len(deltas) // 2]

    med = measure(n)
    while on_tpu and med * n < 10e-3 and n < 512:
        n *= 4
        med = measure(n)
    # guard against relay jitter making the difference negative
    return max(med, 1e-9)


def choose_appropriate_kernel(
    controller,
    x0,
    ctrl_state=None,
    candidates=DEFAULT_CANDIDATES,
    num_evaluations=10,
    retune=False,
):
    """Return ``controller.replace(kernel=<fastest>)``.

    Any candidate that fails to build (e.g. "pallas" with a recurrent or
    oversized model, mirroring the reference's shared-memory fallback) is
    skipped. Timings are cached per configuration, in-process AND on disk
    (~/.cache/mppi_generic_tpu/autotune.json, keyed by config + device
    kind + jax/jaxlib versions) so a restarted plant skips the multi-
    compile sweep. ``retune=True`` (or env MPPI_RETUNE=1) forces a fresh
    sweep and overwrites both caches.
    """
    key = _config_key(controller, candidates)
    retune = retune or os.environ.get("MPPI_RETUNE") == "1"
    if retune:
        _CACHE.pop(key, None)
    if key in _CACHE:
        cached_kernel, cached_tile, cached_split = _CACHE[key]
        if _kernel_supported(controller, cached_kernel):
            return controller.replace(
                kernel=cached_kernel, pallas_tile_k=cached_tile,
                pallas_split_cost=cached_split,
            )
    if not retune:
        hit = _disk_load().get(_disk_key(key))
        if hit is not None:
            cached_kernel, cached_tile, cached_split = hit
            if _kernel_supported(controller, cached_kernel):
                _CACHE[key] = (cached_kernel, cached_tile, cached_split)
                return controller.replace(
                    kernel=cached_kernel, pallas_tile_k=cached_tile,
                    pallas_split_cost=cached_split,
                )

    if ctrl_state is None:
        ctrl_state = controller.init_state(jax.random.PRNGKey(0))

    # controllers whose solve treats some kernels identically (e.g. RMPPI's
    # pallas/pallas_fused) declare aliases so the tuner times each compiled
    # program once
    aliases = getattr(controller, "_equivalent_kernels", {})
    seen = set()
    best, best_t = None, None
    for name in candidates:
        canonical = aliases.get(name, name)
        if canonical in seen:
            continue
        seen.add(canonical)
        if not _kernel_supported(controller, canonical):
            continue
        cand = controller.replace(kernel=canonical)
        try:
            t = time_solve(cand, x0, ctrl_state, num_evaluations)
        except PallasIncompatible:
            continue
        except Exception:
            # a kernel variant the model cannot lower (e.g. unsupported ops
            # in Mosaic) — the reference's shared-mem-overflow fallback
            if not name.startswith("pallas"):
                raise
            continue
        if best_t is None or t < best_t:
            best, best_t = name, t
    if best is None:  # every candidate failed — keep what we had
        return controller

    # tile-size sweep for the winning Pallas kernel (the reference sweeps
    # its kernel block dims the same empirical way): the kernel candidates
    # above were timed with the controller's OWN pallas_tile_k (tile0);
    # additionally try half/default/double of the default tile and keep
    # the fastest — a caller-set tile is only replaced by one that
    # measured faster
    best_tile = controller.pallas_tile_k
    if best.startswith("pallas") and controller.sample_sharding is None:
        from mppi_generic_tpu.ops.pallas_rollout import (
            LANES,
            _round_up,
            default_tile_k,
        )

        K = int(controller.num_rollouts)
        T = int(controller.num_timesteps)
        C = int(controller.dynamics.CONTROL_DIM)
        base_tile = default_tile_k(K, T, C)
        tile0 = controller.pallas_tile_k  # None = base_tile inside the ops
        timed = {base_tile if tile0 is None else tile0}
        best_tile_t = best_t
        for tile in sorted({base_tile // 2, base_tile, base_tile * 2}):
            if tile in timed or not LANES <= tile <= _round_up(K, LANES):
                continue
            timed.add(tile)
            cand = controller.replace(kernel=best, pallas_tile_k=tile)
            try:
                t = time_solve(cand, x0, ctrl_state, num_evaluations)
            except Exception:
                continue
            if t < best_tile_t:
                best_tile, best_tile_t = tile, t

    # split-cost sweep for the winning Pallas kernel: the op-weight
    # heuristic (ops/pallas_rollout._split_profitable) only PREDICTS the
    # split-vs-combined outcome — here it is measured, the same way the
    # reference times its single-kernel vs split-kernel variants
    # (mppi_controller.cu:45-143). The split candidate runs at
    # pallas_tile_k=None so it gets its OWN tile heuristic (forcing the
    # combined winner's tile would handicap it or overflow VMEM); the
    # winner's tile is cached alongside. TPU-only: interpret-mode timings
    # are meaningless and slow.
    best_split = controller.pallas_split_cost
    if (best.startswith("pallas")
            and best_split is None
            and jax.default_backend() == "tpu"
            and (controller.cost.time_parallel_cost()
                 or controller.cost.time_parallel_crash())):
        timed_split = {}
        for split, tile in ((False, best_tile), (True, None)):
            cand = controller.replace(
                kernel=best, pallas_tile_k=tile, pallas_split_cost=split,
            )
            try:
                timed_split[split] = time_solve(
                    cand, x0, ctrl_state, num_evaluations
                )
            except Exception:
                continue
        if len(timed_split) == 2:
            if timed_split[True] < timed_split[False]:
                best_split, best_tile = True, None
            else:
                best_split = False

    _CACHE[key] = (best, best_tile, best_split)
    _disk_store(_disk_key(key), (best, best_tile, best_split))
    return controller.replace(kernel=best, pallas_tile_k=best_tile,
                              pallas_split_cost=best_split)
