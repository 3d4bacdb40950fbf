from .mesh import make_mesh
from .sharded_lio import sharded_lio_update
from .sharded_pgo import optimize_sharded
