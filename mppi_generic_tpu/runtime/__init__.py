from mppi_generic_tpu.runtime.plant import BasePlant, BufferedPlant, PlantStats
from mppi_generic_tpu.runtime.native import (
    NativeBuffer,
    NativeMailbox,
    PyBuffer,
    PyMailbox,
    make_buffer,
    make_mailbox,
)

__all__ = [
    "BasePlant",
    "BufferedPlant",
    "PlantStats",
    "NativeBuffer",
    "NativeMailbox",
    "PyBuffer",
    "PyMailbox",
    "make_buffer",
    "make_mailbox",
]
