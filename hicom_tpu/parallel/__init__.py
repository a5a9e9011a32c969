from .mesh import create_mesh, MESH_AXES  # noqa: F401
from .sharding import param_shardings, batch_sharding, replicate  # noqa: F401
from .pipeline import create_pp_mesh, pipeline_prefill  # noqa: F401
