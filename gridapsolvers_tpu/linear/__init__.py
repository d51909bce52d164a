from .cg import CGSolver, condition_estimate  # noqa: F401
from .gmres import (  # noqa: F401
    AdaptiveGMRESSolver,
    FGMRESSolver,
    GMRESSolver,
)
from .minres import MINRESSolver  # noqa: F401
from .direct import (  # noqa: F401
    DenseCholeskySolver,
    DenseInverseSolver,
    DenseLUSolver,
    MatrixSolver,
)
from .smoothers import (  # noqa: F401
    ChebyshevSmoother,
    ColoredGaussSeidel,
    IdentitySolver,
    JacobiSolver,
    RichardsonLinearSolver,
    RichardsonSmoother,
    SymGaussSeidelSmoother,
)
from .gmg import GMGSolver, gmg_from_hierarchy  # noqa: F401
from .schur import SchurComplementSolver  # noqa: F401
from .schwarz import (  # noqa: F401
    SchwarzLinearSolver,
    TwoLevelSchwarzSolver,
    slab_neumann_matrices,
)
from .wrappers import (  # noqa: F401
    CallbackSolver,
    LinearSolverFromSmoother,
    NullspaceSolver,
)
from .amg import AMGSolver, DistAMGSolver  # noqa: F401

# Reference-facing aliases (src/GridapSolvers.jl re-exports;
# SymGaussSeidelSmoother already aliased in smoothers.py)
JacobiLinearSolver = JacobiSolver
GMGLinearSolver = GMGSolver
IdentityLinearSolver = IdentitySolver
