# Kaitai Struct spec for the flo container (machine-readable format oracle).
# Mirrors docs/file-format.md; usable with any Kaitai runtime to cross-check
# the reader/writer in flo_tpu/container/.
meta:
  id: flo_audio
  title: flo audio container
  file-extension: flo
  endian: le
seq:
  - id: magic
    contents: "FLO!"
  - id: header
    type: header
  - id: toc
    type: toc
    size: header.toc_size
  - id: data
    size: header.data_size
  - id: extra
    size: header.extra_size
  - id: metadata
    size: header.meta_size
    doc: MessagePack map with named keys (see docs/metadata-guide.md)
types:
  header:
    seq:
      - id: version_major
        type: u1
      - id: version_minor
        type: u1
      - id: flags
        type: u2
        doc: bit0 = lossy; bits 8-11 = lossy quality preset 0-4
      - id: sample_rate
        type: u4
      - id: channels
        type: u1
      - id: bit_depth
        type: u1
      - id: total_samples
        type: u8
        doc: sample-frames per channel
      - id: compression_level
        type: u1
      - id: padding
        size: 3
      - id: data_crc32
        type: u4
        doc: IEEE CRC-32 (poly 0xEDB88320) over the DATA chunk
      - id: header_size
        type: u8
      - id: toc_size
        type: u8
      - id: data_size
        type: u8
      - id: extra_size
        type: u8
      - id: meta_size
        type: u8
    instances:
      is_lossy:
        value: (flags & 1) != 0
      lossy_quality:
        value: (flags >> 8) & 0xf
  toc:
    seq:
      - id: num_entries
        type: u4
      - id: entries
        type: toc_entry
        repeat: expr
        repeat-expr: num_entries
  toc_entry:
    seq:
      - id: frame_index
        type: u4
      - id: byte_offset
        type: u8
        doc: offset within the DATA chunk
      - id: frame_size
        type: u4
      - id: timestamp_ms
        type: u4
  frame:
    doc: |
      One frame at a TOC entry's byte range. frame_type: 0 silence,
      1-12 ALPC, 253 transform (lossy), 254 raw PCM. Transform frames store
      exactly one pseudo-channel; others store header.channels channels.
    seq:
      - id: frame_type
        type: u1
      - id: frame_samples
        type: u4
      - id: flags
        type: u1
        doc: bit0 = mid/side stereo
      - id: channels
        type: channel
        repeat: eos
  channel:
    seq:
      - id: len_payload
        type: u4
      - id: payload
        size: len_payload
  alpc_channel:
    doc: Payload layout for ALPC frames.
    seq:
      - id: order
        type: u1
      - id: coeffs
        type: s4
        repeat: expr
        repeat-expr: order
      - id: shift_bits
        type: u1
        doc: ">= 128 marks a fixed predictor of order (shift_bits - 128)"
      - id: residual_encoding
        type: u1
        enum: residual_encoding
      - id: rice_parameter
        type: u1
        if: residual_encoding == residual_encoding::rice
      - id: residuals
        size-eos: true
  transform_blob:
    doc: Payload layout for Transform frames (single pseudo-channel).
    seq:
      - id: block_size
        type: u1
        doc: 0 long/2048, 1 short/256, 2 start, 3 stop
      - id: num_channels
        type: u1
      - id: scale_factors
        type: u2
        repeat: expr
        repeat-expr: num_channels * 25
        doc: "log-coded: clamp(log2(sf)*256 + 32768, 0, 65535); 0 = empty band"
      - id: coefficient_streams
        type: sparse_stream
        repeat: expr
        repeat-expr: num_channels
  sparse_stream:
    seq:
      - id: len_stream
        type: u4
      - id: stream
        size: len_stream
        doc: "repeated [zero_count varint][nonzero_count u8][i16 values]"
enums:
  residual_encoding:
    0: rice
    1: golomb
    2: raw
