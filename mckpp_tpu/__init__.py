"""mckpp_tpu: a TPU-native multi-column KPP ocean mixed-layer framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
MC-KPP model (aosprey/mckpp-f90).  See SURVEY.md at the repo root for the
structural analysis of the reference and the layer mapping.
"""

from .config import (KppConfig, DomainConfig, TimeConfig, PhysicsFlags,
                     ForcingConfig, BoundaryConfig, InitConfig, OutputConfig)
from .grid import VerticalGrid, make_vertical_grid, vertical_grid_from_arrays
from .state import State, ColumnParams, Forcing
from .models.column_model import KppModel

__version__ = "0.1.0"
