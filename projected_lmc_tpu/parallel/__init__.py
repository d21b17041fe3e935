from .mesh import make_mesh, model_shardings, shard_model, replicate
from .sharded import sharded_fit_step, dryrun_step
from . import distributed
from .distributed import initialize, make_global_mesh, is_coordinator
