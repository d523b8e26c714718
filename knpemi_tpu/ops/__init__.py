from .geometry import (
    DiscreteGeometry,
    SubdomainSpace,
    MembraneSpace,
    BoundarySpace,
    build_geometry,
)
from . import quadrature
from . import kernels

__all__ = [
    "DiscreteGeometry",
    "SubdomainSpace",
    "MembraneSpace",
    "BoundarySpace",
    "build_geometry",
    "quadrature",
    "kernels",
]
