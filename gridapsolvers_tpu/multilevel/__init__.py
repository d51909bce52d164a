from .hierarchy import (  # noqa: F401
    GridHierarchy,
    cartesian_hierarchy,
    compute_hierarchy_matrices,
    hierarchy_from_coarse,
)
from .transfer import (  # noqa: F401
    StructuredProlongation,
    StructuredRestriction,
    free_mask,
    setup_transfer_operators,
)
