"""Top-level bulk (multi-file) API — the corpus-throughput surface.

Each call runs one device program for the whole batch (see
lossless/encoder.encode_many, lossy/encoder.encode_many, and the two
decode_many implementations), which is how thousands of files per chip are
meant to be processed (SURVEY.md §0 north star).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .container import reader
from .core.constants import FrameType
from .lossless import decoder as _lossless_decoder
from .lossless import encoder as _lossless_encoder
from .lossy import decoder as _lossy_decoder
from .lossy import encoder as _lossy_encoder
from .lossy.presets import QUALITY_U8_TO_F32


def encode_many(
    samples_list: Sequence[np.ndarray],
    sample_rate: int,
    channels: int,
    bit_depth: int = 16,
    compression_level: int = 5,
    metadata_list: Optional[Sequence[bytes]] = None,
) -> List[bytes]:
    """Lossless bulk encode (byte-identical to per-file `encode`)."""
    return _lossless_encoder.encode_many(
        samples_list, sample_rate, channels, bit_depth, compression_level, metadata_list
    )


def encode_lossy_many(
    samples_list: Sequence[np.ndarray],
    sample_rate: int,
    channels: int,
    quality: int = 2,
    metadata_list: Optional[Sequence[bytes]] = None,
    transport_dtype=np.float32,
) -> List[bytes]:
    """Lossy bulk encode; quality is the u8 preset 0-4."""
    q = QUALITY_U8_TO_F32[min(int(quality), 4)]
    return _lossy_encoder.encode_many(
        samples_list, sample_rate, channels, q, metadata_list,
        transport_dtype=transport_dtype,
    )


def decode_many(datas: Sequence[bytes]) -> List[np.ndarray]:
    """Bulk auto-detecting decode: groups files into lossless/lossy batches
    (each group = one device pass) and returns outputs in input order."""
    flos = [reader.read(d) for d in datas]
    is_lossy = [
        any(f.frame_type == int(FrameType.TRANSFORM) for f in flo.frames) for flo in flos
    ]
    outs: List[np.ndarray] = [np.zeros(0, np.float32)] * len(flos)
    ll = [i for i, v in enumerate(is_lossy) if not v]
    lo = [i for i, v in enumerate(is_lossy) if v]
    if ll:
        for i, out in zip(ll, _lossless_decoder.decode_many([flos[i] for i in ll])):
            outs[i] = out
    if lo:
        # Lossy bulk needs homogeneous rate/channels; sub-group accordingly.
        groups: dict = {}
        for i in lo:
            key = (flos[i].header.sample_rate, flos[i].header.channels)
            groups.setdefault(key, []).append(i)
        for idxs in groups.values():
            for i, out in zip(idxs, _lossy_decoder.decode_many([flos[i] for i in idxs])):
                outs[i] = out
    return outs
