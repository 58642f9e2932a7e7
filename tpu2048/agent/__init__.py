from .td import (
    Metrics,
    Recorder,
    TDState,
    evaluate_boards,
    init_td_state,
    make_train_step,
)

__all__ = [
    "Metrics",
    "Recorder",
    "TDState",
    "evaluate_boards",
    "init_td_state",
    "make_train_step",
]
