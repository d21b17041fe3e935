from .exact import ExactGPModel
from .multitask import MultitaskGPModel
from .variational import VariationalMultitaskGPModel
from .projected import ProjectedGPModel, LMCMixingMatrix
