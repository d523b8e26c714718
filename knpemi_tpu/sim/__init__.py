from .stepper import Simulation, SolverOptions

__all__ = ["Simulation", "SolverOptions"]
