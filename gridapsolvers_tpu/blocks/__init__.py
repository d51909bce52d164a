from .block_solvers import (  # noqa: F401
    BiformBlock,
    BlockDiagonalSolver,
    BlockTriangularSolver,
    LinearSystemBlock,
    MatrixBlock,
    NonlinearSystemBlock,
    SolverBlock,
    TriformBlock,
)
