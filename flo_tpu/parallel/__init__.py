"""Batch-parallel scaling over a device mesh (SURVEY.md §2.9, §5.8)."""

from .pipeline import (  # noqa: F401
    active_mesh,
    batch_sharding,
    bucket_count,
    decode_step,
    device_mesh,
    encode_select_step,
    pad_batch,
    put_batch,
    put_replicated,
    shape_buckets_on,
    shard_batch,
    use_mesh,
    use_shape_buckets,
)
