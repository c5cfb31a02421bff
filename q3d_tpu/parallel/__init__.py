from .mesh import (make_mesh, shard_batch, replicate,  # noqa: F401
                   make_train_step, make_eval_step, merge_results)
from .commu_utils import merge_results_dist  # noqa: F401
