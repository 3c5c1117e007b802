"""FNN helper — fully-connected MLP with tanh hidden activations.

Parity target: reference ``utils/nn_helpers/fnn_helper.{cuh,cu}``:
* layers discovered from npz keys ``{prefix}dynamics_W{i}`` /
  ``{prefix}dynamics_b{i}`` (1-indexed; fnn_helper.cu:65-128);
* weights row-major (out, in), stored as float64 in the npz;
* forward: x <- W x + b, tanh on all but the last layer
  (fnn_helper.cu:354-382).

Batched-friendly: ``forward`` accepts (..., in) and contracts on the last
axis, so the same module runs per-vector on host and under vmap/scan in
rollouts (where the matmuls land on the MXU).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct


class FNN(struct.PyTreeNode):
    weights: Tuple[jnp.ndarray, ...] = ()  # each (out, in)
    biases: Tuple[jnp.ndarray, ...] = ()

    @classmethod
    def create(cls, layers: Sequence[int], key=None, scale=0.1):
        """Random (or zero) init with the given layer sizes."""
        import jax

        ws, bs = [], []
        for i in range(len(layers) - 1):
            if key is not None:
                key, sub = jax.random.split(key)
                w = scale * jax.random.normal(sub, (layers[i + 1], layers[i]))
            else:
                w = jnp.zeros((layers[i + 1], layers[i]))
            ws.append(w.astype(jnp.float32))
            bs.append(jnp.zeros((layers[i + 1],), jnp.float32))
        return cls(weights=tuple(ws), biases=tuple(bs))

    @classmethod
    def from_npz(cls, npz, prefix: str = ""):
        """Load from an npz mapping (dict-like or np.load result) using the
        reference's key convention."""
        if prefix and not prefix.endswith("/") and not prefix.endswith("_"):
            prefix = prefix + "/"
        ws, bs = [], []
        i = 1
        while f"{prefix}dynamics_W{i}" in npz:
            w = np.asarray(npz[f"{prefix}dynamics_W{i}"], np.float32)
            b = np.asarray(npz[f"{prefix}dynamics_b{i}"], np.float32)
            w = w.reshape(b.shape[0], -1)
            ws.append(jnp.asarray(w))
            bs.append(jnp.asarray(b.reshape(-1)))
            i += 1
        if not ws:
            raise KeyError(f"no '{prefix}dynamics_W1' in npz keys {list(npz.keys())[:10]}")
        return cls(weights=tuple(ws), biases=tuple(bs))

    @property
    def input_dim(self):
        return self.weights[0].shape[1]

    @property
    def output_dim(self):
        return self.weights[-1].shape[0]

    def forward(self, x):
        """(..., in) -> (..., out); tanh on hidden layers, linear output."""
        n = len(self.weights)
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            x = jnp.tensordot(x, w, axes=[[-1], [1]]) + b
            if i < n - 1:
                x = jnp.tanh(x)
        return x

    def forward_axis0(self, x):
        """(in, *batch) -> (out, *batch): the component-first twin of
        ``forward`` for the rollout SoA convention (models/base.py). Batch
        dims flatten into one matmul minor axis, so inside Pallas kernels
        this is a plain (out, in) @ (in, tile) MXU matmul with no
        lane-transposing moveaxis."""
        batch_shape = x.shape[1:]
        h = x.reshape(x.shape[0], -1)
        n = len(self.weights)
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            h = jnp.dot(w, h, preferred_element_type=jnp.float32) + b[:, None]
            if i < n - 1:
                h = jnp.tanh(h)
        return h.reshape((h.shape[0],) + batch_shape)

    def __call__(self, x):
        return self.forward(x)
