from .checkpoint import save_checkpoint, load_checkpoint
from .xdmf import read_mesh, write_mesh, TimeSeriesWriter
from .probe import TimeSeriesReader, evaluate_p1, locate_points

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "read_mesh",
    "write_mesh",
    "TimeSeriesWriter",
    "TimeSeriesReader",
    "evaluate_p1",
    "locate_points",
]
