from nngparareal_tpu.utils.normalize import Normalize
from nngparareal_tpu.utils.timing import Timer, wall_timed

__all__ = ["Normalize", "Timer", "wall_timed"]
