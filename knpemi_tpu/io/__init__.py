from .checkpoint import save_checkpoint, load_checkpoint
from .xdmf import read_mesh, write_mesh, TimeSeriesWriter

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "read_mesh",
    "write_mesh",
    "TimeSeriesWriter",
]
