"""nngparareal_tpu — TPU-native parallel-in-time ODE/PDE solvers.

A ground-up JAX/XLA rebuild of the Nearest-Neighbors GParareal research
library (reference: Parallel-in-Time-Differential-Equations/
Nearest-Neighbors-GParareal, arXiv:2405.12182). Capabilities match the
reference's v2+v3 union (see SURVEY.md); the architecture does not:

* time slices are a batched leading axis — the fine-solver fan-out is a
  single ``vmap``-ed (and mesh-shardable) Runge-Kutta kernel instead of an
  MPI master/worker pool (reference parareal.py:310-315);
* GP hyperparameter search runs as a batched, jitted Nelder-Mead over
  (coordinate x jitter x restart) tasks on device instead of a scipy
  fan-out over process pools (reference models.py:185-226);
* nearest-neighbour selection is pairwise-distance + ``lax.top_k``
  (reference models.py:171-183 uses scipy cdist + argsort);
* the sequential predictor-corrector sweep is a ``lax.scan`` with the
  coarse solver and the GP prediction fused into its body.

float64 is enabled at import, mirroring the reference's insistence on x64
for its 5e-7 convergence tolerances (reference globals.py:7-8,
parareal.py:28-33).
"""

from jax import config as _jax_config

_jax_config.update("jax_enable_x64", True)

from nngparareal_tpu.systems import (  # noqa: E402
    ODE,
    FHNODE,
    Rossler,
    Hopf,
    DblPend,
    Brusselator,
    Lorenz,
    ThomasLabyrinth,
    FHNPDE,
    Burgers,
    DiffReact,
)
from nngparareal_tpu.systems.configs import Config  # noqa: E402
from nngparareal_tpu.solver import RKSolver, ScipySolver  # noqa: E402
from nngparareal_tpu.driver import Parareal, PararealLight  # noqa: E402

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
    "Config",
    "RKSolver",
    "ScipySolver",
    "Parareal",
    "PararealLight",
]

__version__ = "0.1.0"
