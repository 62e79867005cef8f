from nngparareal_tpu.models.base import ModelBase, Dataset
from nngparareal_tpu.models.bare import BareParareal
from nngparareal_tpu.models.nngp import NNGParareal
from nngparareal_tpu.models.nngp_scipy import NNGPScipy
from nngparareal_tpu.models.gp import GParareal
from nngparareal_tpu.models.elm import ELM
from nngparareal_tpu.models.nngp_time import NNGPTime
from nngparareal_tpu.models.knn_mean import KNNMean

__all__ = [
    "KNNMean",
    "ModelBase",
    "Dataset",
    "BareParareal",
    "NNGParareal",
    "NNGPScipy",
    "GParareal",
    "ELM",
    "NNGPTime",
]
