"""Early stopping (reference ``betty/misc/early_stopping.py``).

The reference has a crash bug — it reads ``self.patience`` but stores
``self.tolerance`` (``early_stopping.py:15,43``) so triggering early stop
raises AttributeError. Fixed here (SURVEY.md §5 "quirks: do NOT replicate").
"""

from betty_tpu.utils import convert_scalar


class EarlyStopping:
    def __init__(self, metric: str = "loss", mode: str = "min", tolerance: int = 5):
        assert mode in ("min", "max")
        self.metric = metric
        self.mode = mode
        self.tolerance = tolerance
        self.best = None
        self.counter = 0

    def __call__(self, validation_stats) -> bool:
        assert self.metric in validation_stats, (
            f"early-stopping metric {self.metric!r} not in validation stats"
        )
        value = convert_scalar(validation_stats[self.metric])
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best)
            or (self.mode == "max" and value > self.best)
        )
        if improved:
            self.best = value
            self.counter = 0
        else:
            self.counter += 1
        return self.counter >= self.tolerance
