from .mesh import build_mesh
from .sharding import batch_sharding, param_shardings
