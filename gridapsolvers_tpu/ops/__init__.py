from .stencil_pallas import PallasConstStencil, pallas_const_stencil  # noqa: F401
from .banded_pallas import PallasBandedStencil, pallas_banded_stencil  # noqa: F401
