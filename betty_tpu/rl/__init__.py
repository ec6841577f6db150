from betty_tpu.rl.buffer import ExperienceBuffer

__all__ = ["ExperienceBuffer"]
