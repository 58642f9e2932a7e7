from .td import (
    Metrics,
    Recorder,
    TDState,
    evaluate_boards,
    greedy_step,
    init_td_state,
    make_train_step,
)

__all__ = [
    "Metrics",
    "Recorder",
    "TDState",
    "evaluate_boards",
    "greedy_step",
    "init_td_state",
    "make_train_step",
]
