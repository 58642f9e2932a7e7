from .loop import Trainer
from .trial import TrialResult, trial

__all__ = ["Trainer", "TrialResult", "trial"]
