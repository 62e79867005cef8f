from nngparareal_tpu.systems.base import ODE
from nngparareal_tpu.systems.odes import (
    FHNODE,
    Rossler,
    Hopf,
    DblPend,
    Brusselator,
    Lorenz,
    ThomasLabyrinth,
)
from nngparareal_tpu.systems.pdes import FHNPDE, Burgers, DiffReact
from nngparareal_tpu.systems.registry import make_system

__all__ = [
    "ODE",
    "FHNODE",
    "Rossler",
    "Hopf",
    "DblPend",
    "Brusselator",
    "Lorenz",
    "ThomasLabyrinth",
    "FHNPDE",
    "Burgers",
    "DiffReact",
    "make_system",
]
