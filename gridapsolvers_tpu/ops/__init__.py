from .stencil_pallas import PallasConstStencil, pallas_const_stencil  # noqa: F401
