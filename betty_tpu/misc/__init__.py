from betty_tpu.misc.early_stopping import EarlyStopping

__all__ = ["EarlyStopping"]
