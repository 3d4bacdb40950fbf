from .mesh import make_mesh
from .sharded_lio import sharded_lio_update
