from .ell import ELLMatrix, ell_from_coo, ell_from_scipy, ell_to_scipy  # noqa: F401
from .stencil import StencilMatrix, shift  # noqa: F401
from .block import BlockOperator  # noqa: F401
from .dense import DenseMatrix  # noqa: F401
