"""Tests for the scripts/ utilities: torch->npz LSTM export round-trip (the
reference validates its LSTM helpers against PyTorch-exported npz fixtures,
tests/nn_helpers/lstm_helper_test.cu) and the colored-noise NumPy oracle."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from mppi_generic_tpu.nn.fnn import FNN
from mppi_generic_tpu.nn.lstm import LSTM

torch = pytest.importorskip("torch")


def test_lstm_export_roundtrip_matches_torch():
    from lstm_converter import export_lstm

    torch.manual_seed(0)
    I, H, O = 3, 8, 2
    tl = torch.nn.LSTM(I, H, batch_first=False)
    head = [torch.nn.Linear(H, 16), torch.nn.Linear(16, O)]

    npz = export_lstm(tl, head)
    ours = LSTM.from_npz(npz)
    assert ours.hidden_dim == H and ours.input_dim == I

    xs = torch.randn(5, 1, I)
    with torch.no_grad():
        ys_t, (h_t, c_t) = tl(xs)
        outs_t = head[1](torch.tanh(head[0](ys_t[-1, 0])))

    h = ours.init_hidden_cell()[0]
    c = ours.init_hidden_cell()[1]
    for t in range(5):
        h, c = ours.step(h, c, jnp.asarray(xs[t, 0].numpy()))
    np.testing.assert_allclose(np.asarray(h), h_t[0, 0].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_t[0, 0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_fnn_export_roundtrip_matches_torch():
    from lstm_converter import export_fnn

    torch.manual_seed(1)
    layers = [torch.nn.Linear(4, 16), torch.nn.Linear(16, 3)]
    npz = export_fnn(layers)
    ours = FNN.from_npz(npz)
    x = torch.randn(4)
    with torch.no_grad():
        want = layers[1](torch.tanh(layers[0](x))).numpy()
    got = np.asarray(ours.forward(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_colored_noise_oracle_spectrum():
    """The NumPy oracle must produce ~unit variance and the right spectral
    slope (beta=2 -> Brownian-like)."""
    from colored_noise import powerlaw_psd_gaussian

    y = powerlaw_psd_gaussian(2.0, (64, 4096), rng=0)
    assert y.shape == (64, 4096)
    np.testing.assert_allclose(y.std(), 1.0, atol=0.15)
    spec = np.abs(np.fft.rfft(y, axis=-1)) ** 2
    f = np.fft.rfftfreq(4096)
    lo = spec[:, (f > 0.001) & (f < 0.01)].mean()
    hi = spec[:, (f > 0.1) & (f < 0.5)].mean()
    assert lo / hi > 50  # strongly low-frequency dominated
