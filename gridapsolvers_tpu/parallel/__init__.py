from .mesh import (  # noqa: F401
    axis_size,
    device_mesh,
    device_mesh_nd,
    replicated,
    row_sharding,
)
from .dist import (  # noqa: F401
    Resharded,
    distributed_poisson_gmg,
    grid_spec,
    replicate_stencil,
    shard_grid_vector,
    shard_stencil,
)
from .dist_ell import (  # noqa: F401
    DistELLMatrix,
    shard_csr,
    shard_vector,
    unshard_vector,
)
from .dist_ell_nd import (  # noqa: F401
    BoxPartition,
    DistGraphELL,
    box_partition,
    shard_csr_nd,
    shard_vector_nd,
    unshard_vector_nd,
)
from .dist_block import (  # noqa: F401
    FieldLayout,
    shard_block_system,
    shard_block_vector,
    unshard_block_vector,
)
