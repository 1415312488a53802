"""The shared {1, 1.5} x 2^k growth bucket.

Every variable-size quantity that keys a compiled program shape (upload
byte buffers, stage-2 word counts, sparse entry counts, shape-bucketed
batch axes) rounds up through this one policy, so tuning it — the floor,
the 1.5x midpoint — changes every cache-bounding site at once instead of
silently splitting some of the compiled-shape caches it exists to bound.
Call sites keep their own domain-named wrappers (bucket_words,
bucket_entries, _bucket_bytes, bucket_count) with their tuned floors.
"""

from __future__ import annotations


def grow_bucket(n: int, floor: int) -> int:
    """Smallest {1, 1.5} x 2^k value >= n (and >= floor)."""
    b = floor
    while b < n:
        b <<= 1
    return b * 3 // 4 if (b * 3 // 4 >= n and b * 3 // 4 >= floor) else b
