from betty_tpu.envs.env_base import Env

__all__ = ["Env"]
