from nngparareal_tpu.ops.butcher import TABLEAUS, Tableau
from nngparareal_tpu.ops.rk import (
    rk_step,
    integrate_last,
    integrate_traj,
    make_last_integrator,
    make_traj_integrator,
)
from nngparareal_tpu.ops import gp
from nngparareal_tpu.ops import optim
from nngparareal_tpu.ops.nn_select import nearest_neighbors

__all__ = [
    "TABLEAUS",
    "Tableau",
    "rk_step",
    "integrate_last",
    "integrate_traj",
    "make_last_integrator",
    "make_traj_integrator",
    "gp",
    "optim",
    "nearest_neighbors",
]
