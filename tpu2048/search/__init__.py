from .expectimax import expectimax_value, make_expectimax_estimator

__all__ = ["expectimax_value", "make_expectimax_estimator"]
