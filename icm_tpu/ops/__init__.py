from .rounding import ste_round
from .bound import lower_bound, LowerBound
from .parametrizers import NonNegativeParametrizer

__all__ = ["ste_round", "lower_bound", "LowerBound", "NonNegativeParametrizer"]
