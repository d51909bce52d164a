from .stencil_pallas import PallasConstStencil  # noqa: F401
