"""Lossy (MDCT transform) decoder — batched device path.

Behavioral model: libflo/src/lossy/decoder.rs + lib.rs:325-352. All frames'
coefficients are dequantized and IMDCT'd in one jitted call; the reference's
stateful per-channel overlap buffer becomes a stateless shifted add over the
block axis, and the pre-roll frame's output is dropped (lib.rs:341-345).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..container import reader
from ..core.types import FloFile
from ..futures import BulkFuture
from ..ops import compact, mdct, psycho
from .sparse import deserialize_sparse

_BLOCK_SIZES = {0: 2048, 1: 256, 2: 2048, 3: 2048}  # Long/Short/Start/Stop


def _parse_frame_blob(data: bytes):
    """Parse one transform blob -> (n, sf_u16 [C, 25] uint16, [sparse bytes
    per channel]) or None on truncation (decoder.rs:61-131). Scale factors
    stay in wire form and sparse streams stay encoded so bulk callers can
    decode both in single vectorized passes."""
    if len(data) < 2:
        return None
    bs = data[0]
    if bs not in _BLOCK_SIZES:
        return None
    n = _BLOCK_SIZES[bs]
    C = data[1]
    pos = 2
    need = 2 * psycho.NUM_BARK_BANDS
    if pos + need * C > len(data):
        return None
    sf_u16 = (
        np.frombuffer(data, dtype="<u2", count=psycho.NUM_BARK_BANDS * C, offset=pos)
        .reshape(C, psycho.NUM_BARK_BANDS)
    )
    pos += need * C
    streams = []
    for c in range(C):
        if pos + 4 > len(data):
            return None
        ln = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if pos + ln > len(data):
            return None
        streams.append(data[pos : pos + ln])
        pos += ln
    return n, sf_u16, streams


def decode_sf_u16(sf_u16: np.ndarray) -> np.ndarray:
    """Wire-form scale factors -> f32 (decoder.rs:96-99), any shape."""
    return np.where(
        sf_u16 > 0,
        np.exp2((sf_u16.astype(np.float32) - 32768.0) / 256.0),
        np.float32(0.0),
    )


def deserialize_frame_raw(data: bytes):
    """Parse one transform blob -> (n, sf [C, 25] f32, [sparse bytes per
    channel]) or None on truncation (decoder.rs:61-131)."""
    p = _parse_frame_blob(data)
    if p is None:
        return None
    n, sf_u16, streams = p
    return n, decode_sf_u16(sf_u16), streams


def _sparse_decode_rows(streams, n2: int) -> np.ndarray:
    """[len(streams), n2] i16 via the native batch decoder (numpy fallback)."""
    from .. import native

    out = native.sparse_decode_batch(streams, n2)
    if out is not None:
        return out
    rows = np.zeros((len(streams), n2), dtype=np.int16)
    for i, s in enumerate(streams):
        rows[i] = deserialize_sparse(s, n2)
    return rows


def deserialize_frame(data: bytes, expect_n2: int | None = None):
    """Parse one transform blob -> (n, sf [C, 25] f32, q [C, n/2] i16) or
    None on truncation (decoder.rs:61-131)."""
    raw = deserialize_frame_raw(data)
    if raw is None:
        return None
    n, sf, streams = raw
    return n, sf, _sparse_decode_rows(streams, n // 2)


@partial(jax.jit, static_argnames=("sample_rate", "n"))
def _decode_blocks_packed(entries, row_nnz, total, sf, lane_nvalid,
                          sample_rate: int, n: int):
    """Sparse upload AND bit-plane download: the host ships 4 bytes per
    nonzero coefficient (ops/compact.py), the dense [N, T, C, n2] grid is
    rebuilt ON DEVICE, dequantized/IMDCT'd, quantized to the i16 output
    domain, and the PCM leaves via ops/blockpack.pack_rows_stage1
    (compressed size, no per-code indexed ops; one-pass C++ host parse)."""
    from ..ops import blockpack

    N, T, C = sf.shape[:3]
    n2 = n // 2
    dense = compact.expand_nonzeros(entries, row_nnz, total, N * T * C, n2)
    q = dense.reshape(N, T, C, n2)
    s = _decode_blocks(q, sf, sample_rate, n)  # [N, T, n2, C]
    i16 = jnp.clip(jnp.round(s * 32767.0), -32768.0, 32767.0).astype(jnp.int32)
    rows = jnp.moveaxis(i16, -1, -2).reshape(N * T * C, n2)
    return blockpack.pack_rows_fused(rows, lane_nvalid)


@partial(jax.jit, static_argnames=("sample_rate", "n"))
def _decode_blocks(q, sf, sample_rate: int, n: int):
    """q [..., T, C, n2] i16, sf [..., T, C, 25] -> segments [..., T, n2, C].

    Dequantize (decoder.rs:38-45: c = q / sf[band] when sf > 0), batched
    IMDCT, stateless overlap-add over T. Leading axes (e.g. a file batch)
    broadcast through.
    """
    _, band, _, _, _ = psycho.model_tables(sample_rate, n)
    sf_bin = sf[..., band]  # [..., T, C, n2]
    coeffs = jnp.where(sf_bin > 0, q.astype(jnp.float32) / jnp.maximum(sf_bin, 1e-30), 0.0)
    recon = mdct.inverse(coeffs, n, "vorbis")  # [..., T, C, n]
    segs = mdct.overlap_add(jnp.moveaxis(recon, -3, -2))  # [..., C, T, n2]
    return jnp.moveaxis(segs, -3, -1)  # [..., T, n2, C]


def decode_file(flo: FloFile) -> np.ndarray:
    """Decode a parsed lossy file to interleaved f32 (pre-roll dropped)."""
    return decode_many([flo])[0]


def decode(data: bytes) -> np.ndarray:
    return decode_file(reader.read(data))


def decode_many_async(
    flos: list[FloFile], transport_dtype=np.float32, mesh=None
) -> BulkFuture:
    """Bulk decode: all files' blocks in chunked device calls (T padded to
    the batch max; every file must share sample_rate/block size/channels).
    All device work is dispatched before this returns.

    transport_dtype=np.float16 halves the device->host download at ~1e-4
    sample error (well inside the lossy tolerance); output is still f32.

    mesh: optional `jax.sharding.Mesh` (or ambient `parallel.use_mesh`) —
    chunks pad their file axis to a mesh multiple and run the same jitted
    program GSPMD-sharded over the 'batch' axis; outputs match the unsharded
    path within one i16 quantization step (see parallel/pipeline.py).
    """
    from ..parallel import pipeline as _pp

    mesh = _pp.active_mesh(mesh)
    parsed_files = []
    for flo in flos:
        parsed = []
        for f in flo.frames:
            if not f.channels:
                continue
            p = _parse_frame_blob(f.channels[0].residuals)
            if p is None:
                raise ValueError("Failed to deserialize transform frame")
            parsed.append(p)
        parsed_files.append(parsed)
    if not parsed_files or all(not p for p in parsed_files):
        return BulkFuture(lambda: [np.zeros(0, dtype=np.float32) for _ in flos])
    n = next(p[0][0] for p in parsed_files if p)
    C = next(len(p[0][2]) for p in parsed_files if p)
    rate = flos[0].header.sample_rate
    t_max = max(len(p) for p in parsed_files)
    N = len(parsed_files)

    all_streams = []
    sf_u16 = np.zeros((N, t_max, C, psycho.NUM_BARK_BANDS), dtype=np.uint16)
    for i, parsed in enumerate(parsed_files):
        for t, (nn, s, streams) in enumerate(parsed):
            if nn != n or len(streams) != C or flos[i].header.sample_rate != rate:
                raise ValueError("decode_many requires homogeneous files")
            sf_u16[i, t] = s
            all_streams.extend(streams)
    sf = decode_sf_u16(sf_u16)  # one vectorized pass for the whole batch

    # Sparse upload: 4 bytes per nonzero coefficient instead of the dense
    # i16 grid (ops/compact.py). Stream order == (file, frame, channel) ==
    # the padded grid's row-major order (missing frame tails are zero rows).
    # The C++ RLE walker emits the device entry form directly; the fallback
    # goes dense + np.nonzero.
    from .. import native

    ent = native.sparse_decode_entries(all_streams, n // 2)
    if ent is not None:
        entries_all, stream_nnz = ent
    else:
        all_rows = _sparse_decode_rows(all_streams, n // 2)
        rid, cid = np.nonzero(all_rows)
        entries_all = compact.make_entries(cid.astype(np.int32), all_rows[rid, cid])
        stream_nnz = np.bincount(rid, minlength=len(all_streams)).astype(np.int64)
    entry_off = np.concatenate([[0], np.cumsum(stream_nnz)])
    counts = np.array([len(p) for p in parsed_files], dtype=np.int64)
    s0 = np.concatenate([[0], np.cumsum(counts * C)])

    # Double-buffer over two file sub-batches: the second chunk's upload and
    # IMDCT overlap the first chunk's download. The output leaves the device
    # entropy-packed in the i16 domain (x32767 quantization, ~1.5e-5 error —
    # two orders below codec noise at every preset); transport_dtype is kept
    # for API compatibility but no longer changes the wire format.
    n2 = n // 2
    half = N // 2 if N >= 4 else N
    # Device packer int32 bit-index bound (blockpack.MAX_PACK_SAMPLES): each
    # file packs t_max * C rows of n2 padded samples on the download side.
    from ..ops import blockpack as _bp

    spad_file = t_max * C * _bp.nblocks(n2) * _bp.BLK
    half = max(1, min(half, _bp.MAX_PACK_SAMPLES // max(spad_file, 1)))
    handles = []
    for lo in range(0, N, half):
        hi = min(lo + half, N)
        # Mesh padding: inert zero files (nvalid=0, no entries) at the tail.
        pad_n = _pp.pad_batch(hi - lo, mesh) - (hi - lo)
        g = np.zeros((hi - lo + pad_n, t_max, C), np.int32)
        nv = np.zeros((hi - lo + pad_n, t_max, C), np.int32)
        for i in range(lo, hi):
            g[i - lo, : counts[i]] = stream_nnz[s0[i] : s0[i + 1]].reshape(-1, C)
            nv[i - lo, : counts[i]] = n2
        e_lo, e_hi = int(entry_off[s0[lo]]), int(entry_off[s0[hi]])
        nv = nv.reshape(-1)
        sf_pad = np.pad(sf[lo:hi], [(0, pad_n)] + [(0, 0)] * (sf.ndim - 1))
        h = _decode_blocks_packed(
            _pp.put_replicated(compact.pad_entries(entries_all[e_lo:e_hi]), mesh),
            _pp.put_batch(g.reshape(-1), mesh),
            _pp.put_replicated(np.int32(e_hi - e_lo), mesh),
            _pp.put_batch(sf_pad, mesh),
            _pp.put_batch(nv, mesh),
            int(rate),
            n,
        )
        from ..futures import start_host_copy
        from ..ops import blockspread as _bs

        start_host_copy(h[2], h[3], h[4])  # modes/widths/bytes
        # Dispatch-time speculative payload prefetch (sized from the
        # previous same-shaped chunk; cold: ~6 bits per decoded sample —
        # dequantized MDCT output delta-packs tighter than raw input), so
        # the PCM download streams while the host collects other pipelines.
        spec = _bs.fetch_words_spec_start(
            h[1],
            ("lo_dec", C, n2, t_max, hi - lo),
            int(nv.sum()) * 6 // 8,
        )
        handles.append((lo, hi, nv, h, spec))

    def fin() -> list[np.ndarray]:
        from ..ops import blockpack, blockspread

        outs = [None] * N
        # Phase 1: async-start every chunk's payload download (the pack
        # already ran fused at the PCM worst-case bucket).
        started = []
        for lo, hi, nv, h, spec in handles:
            stage, words_d, modes_d, widths_d, bytes_d, _off_d = h
            dn_bytes = np.asarray(bytes_d).astype(np.int64)
            boff = np.concatenate([[0], np.cumsum(dn_bytes)])
            total = int(boff[-1])
            if total > words_d.size * 4:  # corrupt-stream width overflow
                words_d = blockpack.pack_rows_stage2(
                    NW=blockspread.bucket_words(total // 4), **stage
                )
                spec = None  # the prefix sliced the OLD words buffer
            hp = blockspread.fetch_words_spec_resolve(spec, words_d, total)
            started.append(
                (lo, hi, nv, hp, total, boff[:-1], modes_d, widths_d)
            )
        # Fused finalizer: each lane (file, frame t, channel c) writes its
        # f32 samples interleaved straight into the batch output buffer;
        # pre-roll frames (t=0), missing frame tails, and mesh-padding files
        # get base -1 and are never parsed. Per-file results are zero-copy
        # views of the buffer.
        T_out = np.maximum(counts - 1, 0)  # frames after pre-roll drop
        file_base = np.zeros(N + 1, np.int64)
        np.cumsum(T_out * n2 * C, out=file_base[1:])
        batch_out = np.empty(int(file_base[-1]), np.float32)
        for lo, hi, nv, hp, total, dn_off, modes_d, widths_d in started:
            packed = blockspread.fetch_words_spec_collect(hp)
            n_lanes = len(nv)  # (hi-lo+pad)*t_max*C
            base = np.full(n_lanes, -1, np.int64)
            for i in range(lo, hi):
                Ti = int(counts[i])
                if Ti <= 1:
                    continue
                f0 = (i - lo) * t_max * C
                t = np.arange(1, Ti, dtype=np.int64)[:, None]
                c = np.arange(C, dtype=np.int64)[None, :]
                base[f0 + (t * C + c).reshape(-1)] = (
                    file_base[i] + ((t - 1) * n2 * C + c)
                ).reshape(-1)
            blockpack.unpack_f32_into(
                packed, np.asarray(modes_d), np.asarray(widths_d), dn_off,
                nv, n2, base, C, 1.0 / 32767.0, batch_out,
            )
        for i in range(N):
            outs[i] = batch_out[file_base[i] : file_base[i + 1]]
        return outs

    return BulkFuture(fin)


def decode_many(
    flos: list[FloFile], transport_dtype=np.float32, mesh=None
) -> list[np.ndarray]:
    """Blocking form of decode_many_async."""
    return decode_many_async(flos, transport_dtype, mesh=mesh).result()
