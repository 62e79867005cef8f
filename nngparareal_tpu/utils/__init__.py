from nngparareal_tpu.utils.normalize import Normalize
from nngparareal_tpu.utils.timing import Timer, wall_timed
from nngparareal_tpu.utils.io import (
    store_pickle,
    read_pickle,
    store_fig,
    slim_run,
    print_cond,
)

__all__ = [
    "Normalize",
    "Timer",
    "wall_timed",
    "store_pickle",
    "read_pickle",
    "store_fig",
    "slim_run",
    "print_cond",
]
