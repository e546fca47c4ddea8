from .weights import (
    ConstantWeighter,
    ExponentialWeighter,
    PowerWeighter,
    RayleighWeighter,
    Weighter,
)

__all__ = [
    "Weighter",
    "ConstantWeighter",
    "PowerWeighter",
    "ExponentialWeighter",
    "RayleighWeighter",
]
