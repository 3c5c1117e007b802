"""LSTM helpers.

Parity targets:
* ``utils/nn_helpers/lstm_helper.{cuh,cu}`` — single-layer LSTM + FNN output
  head whose input is [hidden; input] (lstm_helper.cu:308-323). Gate math
  (lstm_helper.cu:267-306):
      g_i = sigma(W_im h + W_ii x + b_i)      g_f = sigma(...)
      g_o = sigma(...)                        g_c = tanh(W_cm h + W_ci x + b_c)
      c' = g_i*g_c + g_f*c ;  h' = g_o * tanh(c')
  npz keys ``{prefix}lstm/weight_hh_l0`` etc. with PyTorch (i, f, g, o)
  chunk order and summed ih+hh biases (lstm_helper.cu:514-585); an optional
  leading "model/" prefix is auto-detected.
* ``utils/nn_helpers/lstm_lstm_helper.{cuh,cu}`` — an *init* LSTM consumes
  the most recent ``init_len`` buffer columns; its final output-head
  evaluation produces [h0; c0] for the *prediction* LSTM used inside
  rollouts (lstm_lstm_helper.cu:50-73). This is how real-vehicle models
  warm-start each solve (plant hook base_plant.hpp:477-482).

TPU note: per-rollout (h, c) live in the rollout scan carry (the analog of
the reference keeping them in kernel shared memory,
lstm_helper.cuh:130-133); the gate matmuls batch over samples onto the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mppi_generic_tpu.nn.fnn import FNN


class LSTM(struct.PyTreeNode):
    # recurrent weights (H, H) and input weights (H, I) per gate
    W_im: jnp.ndarray = None
    W_fm: jnp.ndarray = None
    W_om: jnp.ndarray = None
    W_cm: jnp.ndarray = None
    W_ii: jnp.ndarray = None
    W_fi: jnp.ndarray = None
    W_oi: jnp.ndarray = None
    W_ci: jnp.ndarray = None
    b_i: jnp.ndarray = None
    b_f: jnp.ndarray = None
    b_o: jnp.ndarray = None
    b_c: jnp.ndarray = None
    # initial hidden/cell (settable; reference initial_hidden_/initial_cell_)
    initial_hidden: jnp.ndarray = None
    initial_cell: jnp.ndarray = None
    output_nn: Optional[FNN] = None  # head on [hidden; input]

    @classmethod
    def create(cls, input_dim, hidden_dim, output_layers=None, key=None, scale=0.1):
        import jax

        def mk(shape, k):
            if key is None:
                return jnp.zeros(shape, jnp.float32)
            return scale * jax.random.normal(k, shape, jnp.float32)

        keys = (
            jax.random.split(key, 12)
            if key is not None
            else [None] * 12
        )
        H, I = hidden_dim, input_dim
        out = None
        if output_layers is not None:
            assert output_layers[0] == H + I, "output head input must be H+I"
            out = FNN.create(
                output_layers, key=keys[11] if key is not None else None
            )
        return cls(
            W_im=mk((H, H), keys[0]),
            W_fm=mk((H, H), keys[1]),
            W_om=mk((H, H), keys[2]),
            W_cm=mk((H, H), keys[3]),
            W_ii=mk((H, I), keys[4]),
            W_fi=mk((H, I), keys[5]),
            W_oi=mk((H, I), keys[6]),
            W_ci=mk((H, I), keys[7]),
            b_i=jnp.zeros((H,)),
            b_f=jnp.zeros((H,)),
            b_o=jnp.zeros((H,)),
            b_c=jnp.zeros((H,)),
            initial_hidden=jnp.zeros((H,)),
            initial_cell=jnp.zeros((H,)),
            output_nn=out,
        )

    @classmethod
    def from_npz(cls, npz, prefix: str = ""):
        if prefix and not prefix.endswith("/") and not prefix.endswith("_"):
            prefix = prefix + "/"
        if f"model/{prefix}lstm/weight_hh_l0" in npz:
            prefix = "model/" + prefix
        w_hh = np.asarray(npz[f"{prefix}lstm/weight_hh_l0"], np.float32)
        b_hh = np.asarray(npz[f"{prefix}lstm/bias_hh_l0"], np.float32).reshape(-1)
        w_ih = np.asarray(npz[f"{prefix}lstm/weight_ih_l0"], np.float32)
        b_ih = np.asarray(npz[f"{prefix}lstm/bias_ih_l0"], np.float32).reshape(-1)
        H = b_hh.shape[0] // 4
        I = w_ih.reshape(4 * H, -1).shape[1]
        w_hh = w_hh.reshape(4 * H, H)
        w_ih = w_ih.reshape(4 * H, I)
        b = b_hh + b_ih
        # PyTorch chunk order (i, f, g/c, o) (lstm_helper.cu:549-585)
        out = FNN.from_npz(npz, prefix + "output/")
        kw = {}
        if f"{prefix}hidden_state" in npz:
            kw["initial_hidden"] = jnp.asarray(
                np.asarray(npz[f"{prefix}hidden_state"], np.float32).reshape(-1)
            )
        if f"{prefix}cell_state" in npz:
            kw["initial_cell"] = jnp.asarray(
                np.asarray(npz[f"{prefix}cell_state"], np.float32).reshape(-1)
            )
        return cls(
            W_im=jnp.asarray(w_hh[:H]),
            W_fm=jnp.asarray(w_hh[H : 2 * H]),
            W_cm=jnp.asarray(w_hh[2 * H : 3 * H]),
            W_om=jnp.asarray(w_hh[3 * H :]),
            W_ii=jnp.asarray(w_ih[:H]),
            W_fi=jnp.asarray(w_ih[H : 2 * H]),
            W_ci=jnp.asarray(w_ih[2 * H : 3 * H]),
            W_oi=jnp.asarray(w_ih[3 * H :]),
            b_i=jnp.asarray(b[:H]),
            b_f=jnp.asarray(b[H : 2 * H]),
            b_c=jnp.asarray(b[2 * H : 3 * H]),
            b_o=jnp.asarray(b[3 * H :]),
            initial_hidden=kw.get("initial_hidden", jnp.zeros((H,))),
            initial_cell=kw.get("initial_cell", jnp.zeros((H,))),
            output_nn=out,
        )

    @property
    def hidden_dim(self):
        return self.W_im.shape[0]

    @property
    def input_dim(self):
        return self.W_ii.shape[1]

    def init_hidden_cell(self):
        return self.initial_hidden, self.initial_cell

    def step(self, h, c, x):
        """One LSTM step. h, c: (..., H); x: (..., I). Returns (h', c')."""

        def lin(Wm, Wi, b):
            return (
                jnp.tensordot(h, Wm, axes=[[-1], [1]])
                + jnp.tensordot(x, Wi, axes=[[-1], [1]])
                + b
            )

        g_i = jax.nn.sigmoid(lin(self.W_im, self.W_ii, self.b_i))
        g_f = jax.nn.sigmoid(lin(self.W_fm, self.W_fi, self.b_f))
        g_o = jax.nn.sigmoid(lin(self.W_om, self.W_oi, self.b_o))
        g_c = jnp.tanh(lin(self.W_cm, self.W_ci, self.b_c))
        c_next = g_i * g_c + g_f * c
        h_next = g_o * jnp.tanh(c_next)
        return h_next, c_next

    def forward(self, h, c, x):
        """Step + output head on [h'; x] (lstm_helper.cu:308-323).
        Returns (output, h', c')."""
        h2, c2 = self.step(h, c, x)
        nn_in = jnp.concatenate([h2, x], axis=-1)
        return self.output_nn.forward(nn_in), h2, c2

    def step_axis0(self, h, c, x):
        """Component-first twin of ``step``: h, c (H, *batch); x (I, *batch).
        Batch dims flatten into the matmul minor axis, so inside Pallas
        kernels the gate updates are (H, H) @ (H, tile) MXU matmuls."""
        batch_shape = h.shape[1:]
        hf = h.reshape(h.shape[0], -1)
        cf = c.reshape(c.shape[0], -1)
        xf = x.reshape(x.shape[0], -1)

        def lin(Wm, Wi, b):
            return (jnp.dot(Wm, hf, preferred_element_type=jnp.float32)
                    + jnp.dot(Wi, xf, preferred_element_type=jnp.float32)
                    + b[:, None])

        g_i = jax.nn.sigmoid(lin(self.W_im, self.W_ii, self.b_i))
        g_f = jax.nn.sigmoid(lin(self.W_fm, self.W_fi, self.b_f))
        g_o = jax.nn.sigmoid(lin(self.W_om, self.W_oi, self.b_o))
        g_c = jnp.tanh(lin(self.W_cm, self.W_ci, self.b_c))
        c2 = g_i * g_c + g_f * cf
        h2 = g_o * jnp.tanh(c2)
        H = h.shape[0]
        return h2.reshape((H,) + batch_shape), c2.reshape((H,) + batch_shape)

    def forward_axis0(self, h, c, x):
        """Component-first ``forward``: returns (output (O, *batch), h', c')."""
        h2, c2 = self.step_axis0(h, c, x)
        nn_in = jnp.concatenate([h2, x], axis=0)
        return self.output_nn.forward_axis0(nn_in), h2, c2


class LSTMLSTM(struct.PyTreeNode):
    """Init-LSTM warm-starts the prediction LSTM (lstm_lstm_helper.cuh:17-112)."""

    init_model: LSTM = None
    pred_model: LSTM = None
    init_len: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def from_npz(cls, init_npz, lstm_npz, init_len=None, init_prefix="", prefix=""):
        init_model = LSTM.from_npz(init_npz, init_prefix)
        pred_model = LSTM.from_npz(lstm_npz, prefix)
        assert init_model.output_nn.output_dim == 2 * pred_model.hidden_dim, (
            "init LSTM head must emit [h0; c0] of the prediction LSTM"
        )
        return cls(
            init_model=init_model,
            pred_model=pred_model,
            init_len=init_len if init_len is not None else 1,
        )

    def initialize(self, buffer):
        """Run the init-LSTM over the last init_len buffer rows
        (buffer: (T_buf, I_init)) and return the prediction LSTM's (h0, c0)
        (lstm_lstm_helper.cu:50-73)."""
        if self.init_len is not None and buffer.shape[0] < self.init_len:
            raise ValueError(
                f"warm-start buffer has {buffer.shape[0]} rows but the init "
                f"network expects {self.init_len} (resample the sensor "
                "buffer to a fixed-dt window first, buffer.hpp "
                "getSmoothedBuffer)"
            )
        window = buffer[-self.init_len :]
        h, c = self.init_model.init_hidden_cell()

        def step(carry, x):
            h, c = carry
            h, c = self.init_model.step(h, c, x)
            return (h, c), None

        (h, c), _ = jax.lax.scan(step, (h, c), window[:-1])
        out, _, _ = self.init_model.forward(h, c, window[-1])
        H = self.pred_model.hidden_dim
        return out[:H], out[H:]
