"""Block-spread device Rice packer (ops/blockspread) vs the host oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from flo_tpu.core import rice_host
from flo_tpu.ops import blockspread


def _pack(residuals, k, nvalid, is_raw):
    L, S = residuals.shape
    import jax

    stage, lane_bytes_d, lane_off_d, bad_d = jax.jit(blockspread.pack_stage1)(
        jnp.asarray(residuals), jnp.asarray(k), jnp.asarray(nvalid), jnp.asarray(is_raw)
    )
    lane_bytes = np.asarray(lane_bytes_d)
    lane_off = np.asarray(lane_off_d)
    total = int(lane_off[-1] + ((lane_bytes[-1] + 3) // 4) * 4) if L else 0
    NW = blockspread.bucket_words(-(-total // 4))
    words = blockspread.pack_stage2(NW=NW, **stage)
    # pack_stage2 byte-swaps on device: the LE view IS the byte stream.
    stream = np.asarray(words).view(np.uint8)
    return stream, lane_bytes, lane_off, np.asarray(bad_d)


def _check_lanes(residuals, k, nvalid, is_raw):
    stream, lane_bytes, lane_off, bad = _pack(residuals, k, nvalid, is_raw)
    assert not bad.any()
    for l in range(residuals.shape[0]):
        got = bytes(stream[lane_off[l] : lane_off[l] + lane_bytes[l]])
        n = nvalid[l]
        if is_raw[l]:
            want = residuals[l, :n].astype(np.int16).astype("<i2").tobytes()
        else:
            want = rice_host.encode(residuals[l, :n], int(k[l]))
        assert got == want, f"lane {l}"
        assert len(want) == lane_bytes[l]


class TestBlockSpread:
    def test_basic_rice_lanes(self):
        rng = np.random.default_rng(0)
        L, S = 6, 1000
        residuals = rng.integers(-200, 200, (L, S)).astype(np.int32)
        k = np.array(
            [rice_host.estimate_parameter(residuals[l]) for l in range(L)], np.int32
        )
        nvalid = np.full(L, S, np.int32)
        _check_lanes(residuals, k, nvalid, np.zeros(L, bool))

    def test_long_codes_and_spikes(self):
        """Transients produce >32-bit codes (quotient cap 255) -> patch pass.

        k is production-estimated (ops/select computes exact best-k), so the
        spikes are isolated patches and every lane stays on the fast path."""
        rng = np.random.default_rng(1)
        L, S = 4, 700
        residuals = rng.integers(-30, 30, (L, S)).astype(np.int32)
        # A few enormous spikes: codes up to 256+k bits.
        for l in range(L):
            pos = rng.integers(0, S, 5)
            residuals[l, pos] = rng.integers(1 << 12, 1 << 20, 5)
        k = np.array(
            [rice_host.estimate_parameter(residuals[l]) for l in range(L)], np.int32
        )
        nvalid = np.full(L, S, np.int32)
        _check_lanes(residuals, k, nvalid, np.zeros(L, bool))

    def test_pathological_k_flags_bad_and_contains(self):
        """Grossly underestimated k makes most codes >32 bits: block advances
        exceed the merge width budget, the affected lanes flag ``bad`` (the
        caller re-packs them exactly on host, as lossless/encoder does), and
        sane lanes in the same batch remain byte-exact — garbage containment
        across the shared superrows."""
        rng = np.random.default_rng(11)
        L, S = 4, 700
        residuals = rng.integers(-500, 500, (L, S)).astype(np.int32)
        k = np.array([5, 0, 6, 0], np.int32)  # lanes 1, 3: every code ~256 bits
        nvalid = np.full(L, S, np.int32)
        stream, lane_bytes, lane_off, bad = _pack(
            residuals, k, nvalid, np.zeros(L, bool)
        )
        assert bad[1] and bad[3]
        for l in range(L):
            want = rice_host.encode(residuals[l, : nvalid[l]], int(k[l]))
            assert len(want) == lane_bytes[l]
            if not bad[l]:
                got = bytes(stream[lane_off[l] : lane_off[l] + lane_bytes[l]])
                assert got == want, f"lane {l}"

    def test_raw_lanes_and_mixed(self):
        rng = np.random.default_rng(2)
        L, S = 5, 513
        residuals = rng.integers(-32768, 32768, (L, S)).astype(np.int32)
        k = np.array(
            [rice_host.estimate_parameter(residuals[l]) for l in range(L)], np.int32
        )
        is_raw = np.array([True, False, True, False, False])
        nvalid = np.array([513, 400, 64, 513, 1], np.int32)
        _check_lanes(residuals, k, nvalid, is_raw)

    def test_empty_and_partial_lanes(self):
        rng = np.random.default_rng(3)
        L, S = 7, 300
        residuals = rng.integers(-50, 50, (L, S)).astype(np.int32)
        k = np.full(L, 2, np.int32)
        nvalid = np.array([300, 0, 17, 0, 299, 32, 33], np.int32)
        _check_lanes(residuals, k, nvalid, np.zeros(L, bool))

    def test_all_k_values(self):
        rng = np.random.default_rng(4)
        L, S = 16, 257
        residuals = np.stack(
            [rng.integers(-(1 << min(kk + 3, 20)), 1 << min(kk + 3, 20), S) for kk in range(16)]
        ).astype(np.int32)
        k = np.arange(16, dtype=np.int32)
        nvalid = np.full(L, S, np.int32)
        _check_lanes(residuals, k, nvalid, np.zeros(L, bool))

    def test_word_exact_block_boundaries(self):
        """Every code 2 bits at k=1 -> blocks of exactly 64 bits (2 words,
        zero straddle) exercise the aligned-advance path."""
        L, S = 3, 256
        residuals = np.zeros((L, S), np.int32)
        k = np.ones(L, np.int32)
        nvalid = np.full(L, S, np.int32)
        _check_lanes(residuals, k, nvalid, np.zeros(L, bool))

    def test_device_plane_pack_roundtrip(self):
        """blockpack.pack_rows_stage1 + stage2 (the bit-plane PCM download
        transport) vs both host unpackers (C++ and the numpy fallback) and
        the fused f32 finalizer, across transform modes, w=0 lanes, partial
        lanes, interior silence."""
        import jax

        from flo_tpu.ops import blockpack

        rng = np.random.default_rng(9)
        L, S = 8, 1500
        rows = np.zeros((L, S), np.int32)
        rows[0] = rng.integers(-30000, 30000, S)        # mode 0 territory
        rows[1] = np.cumsum(rng.integers(-50, 50, S))   # smooth -> delta
        rows[2] = 123                                   # constant -> w tiny
        rows[3] = 0                                     # silent -> w = 0
        rows[4] = np.cumsum(np.cumsum(rng.integers(-3, 3, S)))  # delta2
        rows[5] = rng.integers(-(2**30), 2**30, S)      # wide (w ~ 31-32)
        rows[6, :700] = rng.integers(-500, 500, 700)
        rows[7, 512:1024] = rng.integers(-500, 500, 512)  # interior silence
        nvalid = np.array([S, S, S, S, S, S, 700, S], np.int64)

        stage, modes, widths, lane_bytes, lane_off = jax.jit(
            blockpack.pack_rows_stage1
        )(jnp.asarray(rows), jnp.asarray(nvalid))
        lane_bytes = np.asarray(lane_bytes)
        lane_off = np.asarray(lane_off).astype(np.int64)
        widths_h = np.asarray(widths)  # already u8
        modes_h = np.asarray(modes).astype(np.uint8)
        assert np.array_equal(
            lane_bytes, 32 * widths_h.astype(np.int64).sum(axis=1)
        )
        assert (widths_h[3] == 0).all()  # silent lane: zero payload
        total = int(lane_off[-1] + lane_bytes[-1])
        NW = blockspread.bucket_words(max(total // 4, 1))
        words = blockpack.pack_rows_stage2(NW=NW, **stage)
        buf = np.asarray(words).view(np.uint8)[:total]

        expect = np.where(np.arange(S)[None, :] < nvalid[:, None], rows, 0)
        # C++ parse, then the forced-numpy path
        got = blockpack.unpack_host(buf, modes_h, widths_h, lane_off, nvalid, S)
        np.testing.assert_array_equal(got, expect)
        from unittest import mock

        with mock.patch("flo_tpu.native.blockpack_unpack", return_value=None):
            got_np = blockpack.unpack_host(
                buf, modes_h, widths_h, lane_off, nvalid, S
            )
        np.testing.assert_array_equal(got_np, expect)

        # Device pack bytes == host pack bytes (same format end to end).
        buf_h, modes_hh, widths_hh, lane_off_hh = blockpack.pack_host(
            expect, nvalid
        )
        np.testing.assert_array_equal(widths_hh.astype(np.int64),
                                      widths_h.astype(np.int64))
        np.testing.assert_array_equal(buf_h[:total], buf)

        # Fused f32 finalizer: interleave lanes as "channels" of one frame
        # (step=L), skip lane 5 (base -1); vs the i32 rows oracle; then the
        # numpy fallback path agrees.
        step = L
        out_base = np.arange(L, dtype=np.int64)
        out_base[5] = -1
        out = np.zeros(L * S, np.float32)
        scale = 1.0 / 32767.0
        blockpack.unpack_f32_into(
            buf, modes_h, widths_h, lane_off, nvalid, S,
            out_base, step, scale, out,
        )
        want = np.zeros((S, L), np.float32)
        for l in range(L):
            if l == 5:
                continue
            want[: int(nvalid[l]), l] = (
                expect[l, : int(nvalid[l])].astype(np.float32)
                * np.float32(scale)
            )
        np.testing.assert_array_equal(out.reshape(S, L), want)
        out2 = np.zeros(L * S, np.float32)
        with mock.patch(
            "flo_tpu.native.blockpack_unpack_f32", return_value=False
        ):
            blockpack.unpack_f32_into(
                buf, modes_h, widths_h, lane_off, nvalid, S,
                out_base, step, scale, out2,
            )
        np.testing.assert_array_equal(out2, out)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_device_plane_pack_fuzz_matches_host(self, seed):
        """Random geometries: device stage1+stage2 bytes == pack_host bytes,
        and both invert exactly (the two directions share one format)."""
        import jax

        from flo_tpu.ops import blockpack

        rng = np.random.default_rng(100 + seed)
        L = int(rng.integers(1, 9))
        S = int(rng.integers(1, 2000))
        rows = np.zeros((L, S), np.int32)
        nvalid = rng.integers(0, S + 1, L).astype(np.int64)
        for l in range(L):
            n = int(nvalid[l])
            kind = int(rng.integers(0, 4))
            if kind == 0 and n:
                rows[l, :n] = rng.integers(-(1 << 30), 1 << 30, n)
            elif kind == 1 and n:
                rows[l, :n] = np.cumsum(rng.integers(-100, 100, n))
            elif kind == 2 and n:
                rows[l, : max(n // 3, 1)] = rng.integers(-50, 50, max(n // 3, 1))
            # kind 3: silence
        stage, modes, widths, lane_bytes, lane_off = jax.jit(
            blockpack.pack_rows_stage1
        )(jnp.asarray(rows), jnp.asarray(nvalid))
        lane_bytes = np.asarray(lane_bytes).astype(np.int64)
        lane_off64 = np.asarray(lane_off).astype(np.int64)
        total = int(lane_off64[-1] + lane_bytes[-1])
        NW = blockspread.bucket_words(max(total // 4, 1))
        buf_d = np.asarray(
            blockpack.pack_rows_stage2(NW=NW, **stage)
        ).view(np.uint8)[:total]
        expect = np.where(np.arange(S)[None, :] < nvalid[:, None], rows, 0)
        buf_h, modes_h, widths_h, lane_off_h = blockpack.pack_host(expect, nvalid)
        np.testing.assert_array_equal(buf_h[:total], buf_d)
        np.testing.assert_array_equal(
            widths_h.astype(np.int64), np.asarray(widths).astype(np.int64)
        )
        got = blockpack.unpack_host(
            buf_d, np.asarray(modes).astype(np.uint8), np.asarray(widths),
            lane_off64, nvalid, S,
        )
        np.testing.assert_array_equal(got, expect)

    def test_patch_overflow_flags_bad(self):
        """More long codes than PATCH_CAP -> affected lanes flagged bad."""
        L, S = 2, blockspread.PATCH_CAP + 64
        residuals = np.full((L, S), 1 << 16, np.int32)  # every code long at k=0
        k = np.zeros(L, np.int32)
        nvalid = np.full(L, S, np.int32)
        _, _, _, bad = _pack(residuals, k, nvalid, np.zeros(L, bool))
        assert bad.all()

    def test_mixed_long_raw_partial(self):
        """Mixed lane kinds in one batch (the legacy packer's hardest case).
        Rice lanes use production-estimated k (lane 1 is raw, k ignored)."""
        rng = np.random.default_rng(5)
        L, S = 4, 450
        residuals = rng.integers(-500, 500, (L, S)).astype(np.int32)
        residuals[2, 17] = 1 << 18  # one long code
        k = np.array(
            [rice_host.estimate_parameter(residuals[l]) for l in range(L)], np.int32
        )
        k[1] = 0
        nvalid = np.array([450, 450, 450, 449], np.int32)
        is_raw = np.array([False, True, False, False])
        _check_lanes(residuals, k, nvalid, is_raw)
