"""Solver warm-start persistence.

The reference has no checkpoint/resume (MPC is stateless across runs); its
persistence surface is npz weight files plus the sliding control sequence +
LSTM hidden buffer as in-memory warm-start state (SURVEY §5). Here the whole
``ControllerState`` pytree (control mean, history, RNG key, sampler state)
can be snapshotted to a flat npz and restored — useful for process restarts
of the plant runtime and for reproducing a solve offline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, ctrl_state) -> None:
    """Snapshot any controller-state pytree to ``path`` (npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(ctrl_state)
    arrays = {}
    for i, l in enumerate(leaves):
        arr = jnp.asarray(l)
        if jnp.issubdtype(arr.dtype, jax.dtypes.prng_key):
            arr = jax.random.key_data(arr)  # typed keys -> uint32 payload
        arrays[f"leaf_{i}"] = np.asarray(arr)
    arrays["treedef_repr"] = np.array(str(treedef))
    np.savez(path, **arrays)


def load_state(path: str, template):
    """Restore a snapshot into the structure of ``template`` (a controller
    state with the same pytree shape, e.g. ``controller.init_state()``).
    Validates the pytree structure and every leaf shape against the
    template so a mismatched snapshot fails here, not inside a jitted
    solve."""
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"  # np.savez appends it on save
    data = np.load(path, allow_pickle=False)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    n = len([k for k in data.files if k.startswith("leaf_")])
    if n != len(leaves_t):
        raise ValueError(
            f"snapshot has {n} leaves, template has {len(leaves_t)}"
        )
    saved_treedef = str(data["treedef_repr"])
    if saved_treedef != str(treedef):
        raise ValueError(
            "snapshot pytree structure does not match the template:\n"
            f"  saved:    {saved_treedef}\n  template: {treedef}"
        )
    leaves = []
    for i, t in enumerate(leaves_t):
        arr = data[f"leaf_{i}"]
        t_arr = jnp.asarray(t)
        expect = (jax.random.key_data(t_arr).shape
                  if jnp.issubdtype(t_arr.dtype, jax.dtypes.prng_key)
                  else t_arr.shape)
        if arr.shape != expect:
            raise ValueError(
                f"snapshot leaf {i} has shape {arr.shape}, template "
                f"expects {expect}"
            )
        if hasattr(t_arr, "dtype") and jnp.issubdtype(t_arr.dtype, jax.dtypes.prng_key):
            # PRNG keys round-trip through their uint32 key data
            leaves.append(jax.random.wrap_key_data(
                jnp.asarray(arr, jnp.uint32),
                impl=jax.random.key_impl(t_arr),
            ))
        else:
            leaves.append(jnp.asarray(arr, t_arr.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
