from .mesh import make_mesh
from .schur_pgo import optimize_schur
from .sharded_lio import sharded_lio_update
from .sharded_map import (make_sharded_lio_step, sharded_lio_init)
from .sharded_pgo import optimize_sharded
