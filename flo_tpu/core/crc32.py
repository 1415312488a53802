"""CRC32 (IEEE 802.3, poly 0xEDB88320, init/final-xor 0xFFFFFFFF).

The reference's table-driven implementation (libflo/src/core/crc32.rs:2-30) is
the standard zlib CRC32; ``zlib.crc32`` computes the identical function, so the
host finalizer simply delegates to it.
"""

from __future__ import annotations

import zlib


def compute(data: bytes) -> int:
    return zlib.crc32(data) & 0xFFFFFFFF
