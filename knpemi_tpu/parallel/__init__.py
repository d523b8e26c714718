from .spmd import SpmdSimulation

__all__ = ["SpmdSimulation"]
