from .expectimax import (
    expectimax_value,
    make_compacted_estimator,
    make_expectimax_estimator,
)

__all__ = [
    "expectimax_value",
    "make_compacted_estimator",
    "make_expectimax_estimator",
]
