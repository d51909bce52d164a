from .mesh import axis_size, device_mesh, replicated, row_sharding  # noqa: F401
from .dist import (  # noqa: F401
    Resharded,
    distributed_poisson_gmg,
    grid_spec,
    replicate_stencil,
    shard_grid_vector,
    shard_stencil,
)
