"""TensorBoard sink (reference ``betty/logging/logger_tensorboard.py``).

Uses ``torch.utils.tensorboard`` (torch-cpu ships in this environment) with
the same auto log-dir convention ``betty_tensorboard/<time>_<host>``.
"""

import atexit
import os
import socket
import time

from betty_tpu.logging.logger_base import LoggerBase
from betty_tpu.utils import convert_scalar

from torch.utils.tensorboard import SummaryWriter  # noqa: E402


class TensorBoardLogger(LoggerBase):
    def __init__(self, log_dir=None):
        if log_dir is None:
            now = time.strftime("%Y%m%d-%H%M%S")
            log_dir = os.path.join(
                "betty_tensorboard", f"{now}_{socket.gethostname()}"
            )
        self.writer = SummaryWriter(log_dir=log_dir)
        atexit.register(self.writer.close)

    def log(self, stats, tag=None, step=None):
        if stats is None:
            return
        for key, value in stats.items():
            prefix = f"{tag}/" if tag else ""
            value = convert_scalar(value)
            if isinstance(value, (int, float)):
                self.writer.add_scalar(f"{prefix}{key}", value, step)
