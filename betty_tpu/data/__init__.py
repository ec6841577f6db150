from betty_tpu.data.loader import ArrayLoader, prefetch_to_device, shard_loader

__all__ = ["ArrayLoader", "prefetch_to_device", "shard_loader"]
