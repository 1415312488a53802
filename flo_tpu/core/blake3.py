"""BLAKE3 hash (32-byte digest), numpy-vectorized.

The reference fingerprints audio with the Rust `blake3` crate
(analysis.rs:245-262); this environment has no blake3 binding, so this is a
from-spec implementation. BLAKE3's chunked tree structure makes it naturally
data-parallel: every 1 KiB chunk is compressed independently, so the 7-round
compression function runs across all chunks at once as uint32 numpy lanes,
and parent nodes reduce pairwise (odd chunk carried up — the left-complete
tree of the spec). Python-level cost is O(blocks-per-chunk * rounds), not
O(input length).
"""

from __future__ import annotations

import numpy as np

_IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)

_PERM = np.array([2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8])

CHUNK_START = 1
CHUNK_END = 2
PARENT = 4
ROOT = 8

CHUNK_LEN = 1024
BLOCK_LEN = 64


def _rotr(x: np.ndarray, n: int) -> np.ndarray:
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress(cv, m, counter, block_len, flags):
    """Vectorized compression: cv [N, 8], m [N, 16] uint32, counter [N] u64,
    block_len/flags [N] uint32 -> new cv [N, 8]."""
    N = cv.shape[0]
    v = np.empty((N, 16), dtype=np.uint32)
    v[:, :8] = cv
    v[:, 8:12] = _IV[:4]
    v[:, 12] = (counter & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    v[:, 13] = (counter >> np.uint64(32)).astype(np.uint32)
    v[:, 14] = block_len
    v[:, 15] = flags

    def g(a, b, c, d, x, y):
        v[:, a] += v[:, b] + x
        v[:, d] = _rotr(v[:, d] ^ v[:, a], 16)
        v[:, c] += v[:, d]
        v[:, b] = _rotr(v[:, b] ^ v[:, c], 12)
        v[:, a] += v[:, b] + y
        v[:, d] = _rotr(v[:, d] ^ v[:, a], 8)
        v[:, c] += v[:, d]
        v[:, b] = _rotr(v[:, b] ^ v[:, c], 7)

    with np.errstate(over="ignore"):
        for r in range(7):
            g(0, 4, 8, 12, m[:, 0], m[:, 1])
            g(1, 5, 9, 13, m[:, 2], m[:, 3])
            g(2, 6, 10, 14, m[:, 4], m[:, 5])
            g(3, 7, 11, 15, m[:, 6], m[:, 7])
            g(0, 5, 10, 15, m[:, 8], m[:, 9])
            g(1, 6, 11, 12, m[:, 10], m[:, 11])
            g(2, 7, 8, 13, m[:, 12], m[:, 13])
            g(3, 4, 9, 14, m[:, 14], m[:, 15])
            if r < 6:
                m = m[:, _PERM]
    return v[:, :8] ^ v[:, 8:]


def _chunk_cvs(data: bytes, root_if_single: bool):
    """Chaining values for every chunk, all chunks vectorized per block step."""
    n = len(data)
    n_chunks = max(1, -(-n // CHUNK_LEN))
    padded = np.zeros(n_chunks * CHUNK_LEN, dtype=np.uint8)
    padded[:n] = np.frombuffer(data, dtype=np.uint8)
    words = padded.view("<u4").reshape(n_chunks, 16, 16)  # [chunk, block, word]

    # Per-chunk byte counts -> per-block lengths and block counts.
    chunk_bytes = np.full(n_chunks, CHUNK_LEN, dtype=np.int64)
    if n == 0:
        chunk_bytes[0] = 0
    else:
        chunk_bytes[-1] = n - (n_chunks - 1) * CHUNK_LEN
    n_blocks = np.maximum(1, -(-chunk_bytes // BLOCK_LEN))  # >=1 even when empty

    cv = np.broadcast_to(_IV, (n_chunks, 8)).copy()
    counter = np.arange(n_chunks, dtype=np.uint64)
    max_blocks = int(n_blocks.max())
    for b in range(max_blocks):
        active = b < n_blocks
        is_first = b == 0
        is_last = b == n_blocks - 1
        blen = np.clip(chunk_bytes - b * BLOCK_LEN, 0, BLOCK_LEN).astype(np.uint32)
        flags = np.zeros(n_chunks, dtype=np.uint32)
        flags[is_last] |= CHUNK_END
        if is_first:
            flags |= CHUNK_START
        if root_if_single:
            flags[is_last] |= ROOT  # only used when n_chunks == 1
        new_cv = _compress(cv, words[:, b].astype(np.uint32), counter, blen, flags)
        cv = np.where(active[:, None], new_cv, cv)
    return cv


def digest(data: bytes) -> bytes:
    """32-byte BLAKE3 digest of ``data``."""
    data = bytes(data)
    n_chunks = max(1, -(-len(data) // CHUNK_LEN))
    if n_chunks == 1:
        cv = _chunk_cvs(data, root_if_single=True)
        return cv[0].astype("<u4").tobytes()

    cvs = _chunk_cvs(data, root_if_single=False)
    zero = np.zeros(1, dtype=np.uint64)
    while len(cvs) > 2:
        pairs = len(cvs) // 2
        m = np.concatenate([cvs[0 : 2 * pairs : 2], cvs[1 : 2 * pairs : 2]], axis=1)
        parents = _compress(
            np.broadcast_to(_IV, (pairs, 8)).copy(),
            m,
            np.zeros(pairs, dtype=np.uint64),
            np.full(pairs, BLOCK_LEN, dtype=np.uint32),
            np.full(pairs, PARENT, dtype=np.uint32),
        )
        cvs = np.concatenate([parents, cvs[2 * pairs :]], axis=0)

    m = np.concatenate([cvs[0:1], cvs[1:2]], axis=1)
    root = _compress(
        _IV[None, :].copy(),
        m,
        zero,
        np.array([BLOCK_LEN], dtype=np.uint32),
        np.array([PARENT | ROOT], dtype=np.uint32),
    )
    return root[0].astype("<u4").tobytes()
