"""Env — external (host-side) environment abstraction.

Counterpart of reference ``betty/envs/env_base.py``: used by MAML-style task
samplers and RL rollout generators. Environments are inherently host-side
(task sampling, gym stepping); they feed batches to problems while the
jitted meta-step stays on device. The reference's module/data-loader
patching (device moves, DDP wraps) is unnecessary here — batches are
device_put by the consuming problem.
"""


class Env:
    def __init__(self):
        self.engine = None
        self.device_sharding = None

    def initialize(self):
        """Set up the environment (user-overridable)."""

    def configure_device(self, sharding):
        self.device_sharding = sharding

    def step(self):
        """Advance the external environment; called by custom Engine
        subclasses (user-overridable; reference ``env_base.py:7-79``)."""
