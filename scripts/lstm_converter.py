"""PyTorch -> npz weight export for the LSTM/FNN helpers — the analog of the
reference ``scripts/autorally/lstm_converter.py`` (which repacks trained
PyTorch LSTMs into flat npz files the cnpy loaders read).

Emitted key layout (what ``nn.lstm.LSTM.from_npz`` / ``nn.fnn.FNN.from_npz``
consume, mirroring the reference fixtures in resources/*.npz):

  lstm/weight_ih_l0, lstm/weight_hh_l0, lstm/bias_ih_l0, lstm/bias_hh_l0
  output/dynamics_W1, output/dynamics_b1, ...   (1-indexed head layers)
  hidden_state, cell_state                       (optional initial values)

PyTorch packs the four gates as [i, f, g(=cell), o] blocks of rows; the
loaders re-slice, so the tensors are exported verbatim.
"""

import argparse

import numpy as np


def export_lstm(torch_lstm, head_linears, h0=None, c0=None):
    """{key: array} for one single-layer torch.nn.LSTM + output-head
    torch.nn.Linear list."""
    sd = {k: v.detach().cpu().numpy() for k, v in torch_lstm.state_dict().items()}
    out = {
        "lstm/weight_ih_l0": sd["weight_ih_l0"],
        "lstm/weight_hh_l0": sd["weight_hh_l0"],
        "lstm/bias_ih_l0": sd.get(
            "bias_ih_l0", np.zeros(sd["weight_ih_l0"].shape[0], np.float32)
        ),
        "lstm/bias_hh_l0": sd.get(
            "bias_hh_l0", np.zeros(sd["weight_hh_l0"].shape[0], np.float32)
        ),
    }
    for li, lin in enumerate(head_linears):
        out[f"output/dynamics_W{li + 1}"] = lin.weight.detach().cpu().numpy()
        out[f"output/dynamics_b{li + 1}"] = lin.bias.detach().cpu().numpy()
    if h0 is not None:
        out["hidden_state"] = np.asarray(h0, np.float32).reshape(-1)
    if c0 is not None:
        out["cell_state"] = np.asarray(c0, np.float32).reshape(-1)
    return out


def export_fnn(linears, prefix=""):
    """{prefix}dynamics_W{i}/b{i} (1-indexed) — the FNNHelper npz layout."""
    out = {}
    for i, lin in enumerate(linears):
        out[f"{prefix}dynamics_W{i + 1}"] = lin.weight.detach().cpu().numpy()
        out[f"{prefix}dynamics_b{i + 1}"] = lin.bias.detach().cpu().numpy()
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="torch .pt checkpoint with .lstm / .head")
    ap.add_argument("out_npz")
    args = ap.parse_args()
    import torch

    model = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    lstm = getattr(model, "lstm", None)
    head = list(getattr(model, "head", []))
    if lstm is None:
        raise SystemExit("checkpoint must expose .lstm (torch.nn.LSTM)")
    np.savez(args.out_npz, **export_lstm(lstm, head))
    print(f"wrote {args.out_npz}")


if __name__ == "__main__":
    main()
