"""Logging sinks.

Parity with reference ``betty/logging/``: a stdlib-logger base that always
prints to stdout, plus optional TensorBoard and Weights & Biases sinks
selected by ``EngineConfig.logger_type`` with graceful import fallback
(reference ``betty/logging/__init__.py:14-39``).
"""

from betty_tpu.logging.logger_base import LoggerBase, get_logger


def logger(logger_type: str = "none") -> LoggerBase:
    if logger_type in ("tensorboard", "tb"):
        try:
            from betty_tpu.logging.logger_tensorboard import TensorBoardLogger

            return TensorBoardLogger()
        except ImportError:
            get_logger().warning(
                "tensorboard is not installed; falling back to stdout logging"
            )
            return LoggerBase()
    if logger_type == "wandb":
        try:
            from betty_tpu.logging.logger_wandb import WandBLogger

            return WandBLogger()
        except ImportError:
            get_logger().warning(
                "wandb is not installed; falling back to stdout logging"
            )
            return LoggerBase()
    return LoggerBase()
