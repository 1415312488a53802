#!/usr/bin/env python
"""A/B the PCM-wire transform family: orders {0..2} vs {0..4}.

The host<->device PCM wire (ops/blockpack) block-packs i32 lanes after a
per-lane k-th-difference transform. This tool packs the SAME lanes the
bench's headline pipelines ship — corpus musical content, the corpus sweep
and hi-res files, and the near-incompressible synthetic noise config — and
reports bits/sample with the candidate set capped at order 2 (the pre-r4
wire) vs the full order-4 family, so the wire-size win is a recorded
number rather than a claim.

Pure host math (the C++/numpy analyzer), no TPU needed.

RESULT (round 5, 2026-08-19, committed as the negative answer to VERDICT
r4 item #7): the per-block order pick is a WASH — per_block_shrink_vs_lane
measured 0.999 (corpus chord), 1.005 (sweep), 0.998 (hires), 0.999
(noise). The per-lane transform already captures the content's structure
because block WIDTHS are per-block anyway: a transient block pays a wide
width under either scheme, and the 3-bit/block mode table eats the sub-1%
payload savings. Not implemented; the per-lane wire stays.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (bench.py content generators)
from flo_tpu.ops import blockpack  # noqa: E402


def bits_per_sample(rows: np.ndarray, max_order: int) -> float:
    """Total packed payload bits / total samples with candidate transforms
    limited to orders 0..max_order (per-lane best, like the analyzer)."""
    nvalid = np.full(rows.shape[0], rows.shape[1], np.int64)
    nblk = blockpack.nblocks(rows.shape[1])
    ds, _ = blockpack._np_transform(rows, nvalid, nblk)
    sizes = np.stack([
        32 * blockpack._np_widths(blockpack._np_zigzag(d), nblk)
        .astype(np.int64).sum(axis=1)
        for d in ds[: max_order + 1]
    ])  # [orders, L] bytes
    total_bytes = sizes.min(axis=0).sum()
    return float(8 * total_bytes / rows.size)


def bits_per_sample_per_block(rows: np.ndarray, max_order: int) -> float:
    """Round-5 what-if (VERDICT r4 #7): pick the transform order PER
    256-sample BLOCK instead of per lane — each block stores the codes of
    whichever difference order gives it the narrowest width, with the
    difference chains running continuously across block boundaries (so the
    inverse would carry up to `order` integration constants between blocks;
    this tool only measures the payload, the mode side-table is charged at
    3 bits/block below). This is the upper bound a per-block wire could
    reach — mixed content (transient + tonal inside one second) pays the
    worse of the two under the per-lane pick."""
    nvalid = np.full(rows.shape[0], rows.shape[1], np.int64)
    nblk = blockpack.nblocks(rows.shape[1])
    ds, _ = blockpack._np_transform(rows, nvalid, nblk)
    widths = np.stack([
        blockpack._np_widths(blockpack._np_zigzag(d), nblk).astype(np.int64)
        for d in ds[: max_order + 1]
    ])  # [orders, L, NB] block widths
    best_w = widths.min(axis=0)  # [L, NB]
    payload_bits = 8 * 32 * best_w.sum()
    mode_table_bits = 3 * best_w.size  # one order id per block
    return float((payload_bits + mode_table_bits) / rows.size)


def lanes_from_interleaved(clip: np.ndarray, channels: int, rate: int):
    """Frame interleaved f32 into the decoder's lane geometry ([lanes, 1s])
    in the i16 PCM domain — exactly what the download wire carries."""
    pcm = np.round(np.clip(clip, -1, 1) * 32767).astype(np.int32)
    pcm = pcm.reshape(-1, channels).T  # [C, S]
    n = (pcm.shape[1] // rate) * rate
    return pcm[:, :n].reshape(channels, -1, rate).reshape(-1, rate)


def main() -> None:
    out = {}
    cases = []
    clips = bench.corpus_like_clips(2, 30)
    if clips is not None:
        cases.append(("corpus_chord_stereo", clips[0], 2, 44100))
    for name in ("sweep_20_20k", "hires_96khz"):
        c, rate, ch = bench.corpus_content(name, 1, 15)
        if c is not None:
            cases.append((name, c[0], ch, rate))
    cases.append(("synthetic_noise", bench.make_audio(30, 44100), 2, 44100))

    for name, clip, ch, rate in cases:
        rows = lanes_from_interleaved(np.asarray(clip, np.float32), ch, rate)
        b2 = bits_per_sample(rows, 2)
        b4 = bits_per_sample(rows, 4)
        bpb = bits_per_sample_per_block(rows, 4)
        out[name] = {
            "bits_per_sample_order2": round(b2, 3),
            "bits_per_sample_order4": round(b4, 3),
            "shrink": round(b2 / b4, 3),
            "bits_per_sample_per_block": round(bpb, 3),
            "per_block_shrink_vs_lane": round(b4 / bpb, 3),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
