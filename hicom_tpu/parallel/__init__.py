from .mesh import create_mesh, MESH_AXES  # noqa: F401
from .sharding import param_shardings, batch_sharding, replicate  # noqa: F401
