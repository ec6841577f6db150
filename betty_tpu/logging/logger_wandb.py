"""Weights & Biases sink (reference ``betty/logging/logger_wandb.py``)."""

import wandb  # noqa: F401  (ImportError handled by the factory)

from betty_tpu.logging.logger_base import LoggerBase
from betty_tpu.utils import convert_scalar


class WandBLogger(LoggerBase):
    def __init__(self, project=None, **kwargs):
        if wandb.run is None:
            wandb.init(project=project or "betty_tpu", **kwargs)

    def log(self, stats, tag=None, step=None):
        if stats is None:
            return
        payload = {}
        for key, value in stats.items():
            prefix = f"{tag}/" if tag else ""
            payload[f"{prefix}{key}"] = convert_scalar(value)
        wandb.log(payload, step=step)
