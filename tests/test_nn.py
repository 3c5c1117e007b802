"""FNN/LSTM helper tests — analog of tests/nn_helpers/*: forward passes are
compared against PyTorch (the same oracle the reference's npz fixtures were
exported from, scripts/autorally/lstm_converter.py)."""

import jax
import jax.numpy as jnp
import numpy as np
torch = __import__("pytest").importorskip("torch")

from mppi_generic_tpu.nn import FNN, LSTM, LSTMLSTM


def make_torch_mlp(layers, seed=0):
    torch.manual_seed(seed)
    mods = []
    for i in range(len(layers) - 1):
        mods.append(torch.nn.Linear(layers[i], layers[i + 1]))
        if i < len(layers) - 2:
            mods.append(torch.nn.Tanh())
    return torch.nn.Sequential(*mods)


def mlp_to_npz_dict(mlp, prefix=""):
    d = {}
    idx = 1
    for m in mlp:
        if isinstance(m, torch.nn.Linear):
            d[f"{prefix}dynamics_W{idx}"] = m.weight.detach().numpy().astype(np.float64)
            d[f"{prefix}dynamics_b{idx}"] = m.bias.detach().numpy().astype(np.float64)
            idx += 1
    return d


def lstm_to_npz_dict(lstm, head, prefix=""):
    d = {
        f"{prefix}lstm/weight_hh_l0": lstm.weight_hh_l0.detach().numpy().astype(np.float64),
        f"{prefix}lstm/bias_hh_l0": lstm.bias_hh_l0.detach().numpy().astype(np.float64),
        f"{prefix}lstm/weight_ih_l0": lstm.weight_ih_l0.detach().numpy().astype(np.float64),
        f"{prefix}lstm/bias_ih_l0": lstm.bias_ih_l0.detach().numpy().astype(np.float64),
    }
    d.update(mlp_to_npz_dict(head, prefix + "output/"))
    return d


def test_fnn_matches_torch():
    layers = [6, 32, 32, 4]
    mlp = make_torch_mlp(layers)
    fnn = FNN.from_npz(mlp_to_npz_dict(mlp))
    x = np.random.RandomState(0).randn(10, 6).astype(np.float32)
    want = mlp(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(fnn.forward(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fnn_prefix_loading():
    mlp = make_torch_mlp([3, 8, 2], seed=1)
    d = mlp_to_npz_dict(mlp, "steering/")
    fnn = FNN.from_npz(d, "steering")
    assert fnn.input_dim == 3 and fnn.output_dim == 2


def test_lstm_step_matches_torch():
    I, H = 5, 16
    torch.manual_seed(2)
    tl = torch.nn.LSTM(I, H, num_layers=1, batch_first=True)
    head = make_torch_mlp([H + I, 8, 3], seed=3)
    lstm = LSTM.from_npz(lstm_to_npz_dict(tl, head))
    assert lstm.hidden_dim == H and lstm.input_dim == I

    rng = np.random.RandomState(4)
    xs = rng.randn(1, 7, I).astype(np.float32)
    out_t, (h_t, c_t) = tl(torch.from_numpy(xs))

    h = jnp.zeros((H,))
    c = jnp.zeros((H,))
    for t in range(7):
        h, c = lstm.step(h, c, jnp.asarray(xs[0, t]))
    np.testing.assert_allclose(np.asarray(h), h_t[0, 0].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_t[0, 0].detach().numpy(), atol=1e-5)


def test_lstm_output_head_uses_hidden_and_input():
    I, H = 4, 8
    torch.manual_seed(5)
    tl = torch.nn.LSTM(I, H)
    head = make_torch_mlp([H + I, 6, 2], seed=6)
    lstm = LSTM.from_npz(lstm_to_npz_dict(tl, head))
    x = jnp.asarray(np.random.RandomState(7).randn(I).astype(np.float32))
    out, h2, c2 = lstm.forward(jnp.zeros((H,)), jnp.zeros((H,)), x)
    want = head(torch.from_numpy(np.concatenate([np.asarray(h2), np.asarray(x)])))
    np.testing.assert_allclose(np.asarray(out), want.detach().numpy(), atol=1e-5)


def test_lstm_batched_step_matches_loop():
    I, H = 3, 8
    lstm = LSTM.create(I, H, key=jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (32, I))
    h = jnp.zeros((32, H))
    c = jnp.zeros((32, H))
    hb, cb = lstm.step(h, c, xs)
    for k in [0, 13, 31]:
        hk, ck = lstm.step(jnp.zeros(H), jnp.zeros(H), xs[k])
        np.testing.assert_allclose(hb[k], hk, atol=1e-6)


def test_lstm_model_prefix_autodetect():
    I, H = 2, 4
    torch.manual_seed(8)
    tl = torch.nn.LSTM(I, H)
    head = make_torch_mlp([H + I, 3], seed=9)
    d = lstm_to_npz_dict(tl, head, "model/")
    lstm = LSTM.from_npz(d)  # should find keys under model/
    assert lstm.hidden_dim == H


def test_lstm_lstm_warm_start():
    """Init-LSTM's final output becomes the prediction LSTM's (h0, c0)."""
    I_init, H_init, H_pred, I_pred = 6, 12, 8, 4
    torch.manual_seed(10)
    t_init = torch.nn.LSTM(I_init, H_init)
    init_head = make_torch_mlp([H_init + I_init, 2 * H_pred], seed=11)
    t_pred = torch.nn.LSTM(I_pred, H_pred)
    pred_head = make_torch_mlp([H_pred + I_pred, 5], seed=12)

    ll = LSTMLSTM.from_npz(
        lstm_to_npz_dict(t_init, init_head),
        lstm_to_npz_dict(t_pred, pred_head),
        init_len=5,
    )
    buffer = np.random.RandomState(13).randn(9, I_init).astype(np.float32)
    h0, c0 = ll.initialize(jnp.asarray(buffer))
    assert h0.shape == (H_pred,)

    # oracle: run torch LSTM over the last 5 rows, head on [h_5; x_5]
    window = torch.from_numpy(buffer[-5:])
    out, (h, c) = t_init(window.unsqueeze(1))
    nn_in = torch.cat([h[0, 0], window[-1]])
    want = init_head(nn_in).detach().numpy()
    np.testing.assert_allclose(np.asarray(h0), want[:H_pred], atol=1e-5)
    np.testing.assert_allclose(np.asarray(c0), want[H_pred:], atol=1e-5)
