from mppi_generic_tpu.nn.fnn import FNN
from mppi_generic_tpu.nn.lstm import LSTM, LSTMLSTM

__all__ = ["FNN", "LSTM", "LSTMLSTM"]
