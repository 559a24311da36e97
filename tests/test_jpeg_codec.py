"""Pure-stdlib baseline JPEG codec tests (functions/jpeg.py): DC-exact
closed forms, AC blocks against an independently-coded IDCT golden,
restart markers, 3-component scans, and payload sniffing through the real
mapInPandas operator on a MIXED PNG+JPEG corpus. Cross-engine parity for
the DC-exact fixtures is q105 (test_oracle_parity)."""

import numpy as np
import pytest

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_coeffs,
    encode_jpeg_gray,
)

QTAB = np.full(64, 8, dtype=np.int64)

# zigzag table duplicated here ON PURPOSE: the golden IDCT below must not
# share code with the codec under test
ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


def golden_idct_block(zz, qtab):
    """Textbook O(64^2) IDCT straight from the T.81 formula — independent
    of the codec's matrix-product implementation."""
    S = np.zeros((8, 8))
    for i, (r, c) in enumerate(ZZ):
        S[r, c] = zz[i] * qtab[i]
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * S[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = acc / 4
    return np.clip(np.round(out + 128), 0, 255).astype(np.uint8)


def test_dc_only_blocks_are_exact_flats():
    coeffs = np.zeros((2, 3, 64), dtype=np.int64)
    vals = [[-100, 0, 50], [99, -37, 12]]
    for by in range(2):
        for bx in range(3):
            coeffs[by, bx, 0] = vals[by][bx]
    img = decode_jpeg_gray(encode_jpeg_coeffs(coeffs, QTAB, 16, 24))
    assert img.shape == (16, 24)
    for by in range(2):
        for bx in range(3):
            blk = img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8]
            assert (blk == vals[by][bx] + 128).all()


def test_ac_blocks_match_independent_idct():
    rng = np.random.default_rng(7)
    coeffs = rng.integers(-30, 31, size=(3, 2, 64))
    img = decode_jpeg_gray(encode_jpeg_coeffs(coeffs, QTAB, 24, 16))
    for by in range(3):
        for bx in range(2):
            exp = golden_idct_block(coeffs[by, bx], QTAB)
            got = img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8]
            assert (exp == got).all(), (by, bx)


def test_long_zero_runs_use_zrl():
    # coefficient at zigzag index 40 forces two ZRL (16-zero) codes
    coeffs = np.zeros((1, 1, 64), dtype=np.int64)
    coeffs[0, 0, 0] = 5
    coeffs[0, 0, 40] = -9
    img = decode_jpeg_gray(encode_jpeg_coeffs(coeffs, QTAB, 8, 8))
    assert (img == golden_idct_block(coeffs[0, 0], QTAB)).all()


def test_restart_markers_round_trip():
    rng = np.random.default_rng(3)
    c = np.zeros((4, 4, 64), dtype=np.int64)
    c[:, :, 0] = rng.integers(-90, 90, size=(4, 4))
    plain = decode_jpeg_gray(encode_jpeg_coeffs(c, QTAB, 32, 32))
    rst = decode_jpeg_gray(encode_jpeg_coeffs(c, QTAB, 32, 32, restart_interval=3))
    assert (plain == rst).all()


def test_three_component_scan_returns_y_plane():
    c3 = np.zeros((2, 2, 3, 64), dtype=np.int64)
    c3[:, :, 0, 0] = [[10, -20], [30, -40]]
    c3[:, :, 1, 0] = 5   # chroma planes present but ignored
    c3[:, :, 2, 0] = -7
    img = decode_jpeg_gray(encode_jpeg_coeffs(c3, QTAB, 16, 16))
    exp = np.repeat(np.repeat(np.array([[138, 108], [158, 88]]), 8, 0), 8, 1)
    assert (img == exp).all()


def test_forward_path_is_near_lossless_on_smooth_images():
    # smooth gradient, flat quant 8: error stays within a few levels
    src = np.clip(np.add.outer(np.arange(24) * 2, np.arange(32)), 0, 255).astype(
        np.uint8
    )
    out = decode_jpeg_gray(encode_jpeg_gray(src))
    assert out.shape == src.shape
    assert np.abs(out.astype(int) - src.astype(int)).max() <= 4


def test_non_multiple_of_8_size_crops():
    src = np.full((10, 13), 77, dtype=np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(src))
    assert out.shape == (10, 13)
    assert (out == 77).all()


def test_error_paths():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00\x01\x02")
    # a baseline-structured SOS (Ss=0, Se=63) under an SOF2 header is a
    # MALFORMED progressive stream (DC scans must have Se == 0) — the
    # progressive path rejects it with a clear error rather than
    # misdecoding (SOF2 itself is supported since r4)
    data = bytearray(encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg_gray(bytes(data))
    # lossless (SOF3) stays out of scope with a clear message
    data = bytearray(encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_gray(bytes(data))
    # sampling factors past the spec ceiling are rejected outright
    data = bytearray(encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    assert data[i + 11] == 0x11
    data[i + 11] = 0x55
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg_gray(bytes(data))


def test_mixed_png_jpeg_corpus_through_operator(spark):
    """Payload sniffing end-to-end: one media table mixing real PNGs and
    real JPEGs through decode_image_features(decoder='builtin')."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.png import (
        encode_png_gray,
    )
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        decode_image_features,
    )
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    png = encode_png_gray(np.full((6, 8), 100, dtype=np.uint8))
    co = np.zeros((1, 1, 64), dtype=np.int64)
    co[0, 0, 0] = 100 - 128
    jpg = encode_jpeg_coeffs(co, QTAB, 8, 8)
    df = spark.createDataFrame(
        [
            (0, bytearray(png), ("image", 8, 6, 0)),
            (1, bytearray(jpg), ("image", 8, 8, 0)),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in decode_image_features(df, decoder="builtin").collect()}
    assert (rows[0].width, rows[0].height) == (8, 6)
    assert (rows[1].width, rows[1].height) == (8, 8)
    assert rows[0].mean_luma == pytest.approx(100 / 255)
    assert rows[1].mean_luma == pytest.approx(100 / 255)


def test_420_subsampled_y_plane_exact():
    """4:2:0 (the dominant real-web layout): the interleaved-MCU walk
    must place all 4 Y blocks per MCU correctly; chroma is decoded (to
    keep bitstream sync) and dropped."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.jpeg import (
        encode_jpeg_coeffs_420,
    )

    rng = np.random.default_rng(9)
    y = np.zeros((4, 4, 64), dtype=np.int64)
    y[:, :, 0] = rng.integers(-90, 90, size=(4, 4))
    cb = np.zeros((2, 2, 64), dtype=np.int64)
    cb[:, :, 0] = 11
    cr = np.zeros((2, 2, 64), dtype=np.int64)
    cr[:, :, 0] = -13
    img = decode_jpeg_gray(encode_jpeg_coeffs_420(y, cb, cr, QTAB, 32, 32))
    exp = np.repeat(np.repeat(y[:, :, 0] + 128, 8, 0), 8, 1)
    assert (img == exp).all()
    # odd crop: MCU padding trimmed to the declared frame size
    img2 = decode_jpeg_gray(encode_jpeg_coeffs_420(y, cb, cr, QTAB, 20, 28))
    assert img2.shape == (20, 28) and (img2 == exp[:20, :28]).all()


def test_subsampled_luma_rejected():
    # luma below full resolution stays out of scope with a clear message
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.jpeg import (
        encode_jpeg_coeffs_420,
    )

    y = np.zeros((2, 2, 64), dtype=np.int64)
    cb = np.zeros((1, 1, 64), dtype=np.int64)
    cr = np.zeros((1, 1, 64), dtype=np.int64)
    data = bytearray(encode_jpeg_coeffs_420(y, cb, cr, QTAB, 16, 16))
    i = bytes(data).find(b"\xff\xc0")
    # swap sampling: make chroma 2x2 and luma 1x1
    assert data[i + 11] == 0x22 and data[i + 14] == 0x11
    data[i + 11] = 0x11
    data[i + 14] = 0x22
    with pytest.raises(NotImplementedError, match="full-resolution"):
        decode_jpeg_gray(bytes(data))


def test_grayscale_with_declared_sampling_walks_raster():
    """Review finding: a single-component frame declaring 2x2 sampling is
    non-interleaved by definition (T.81 A.2.2) — the decoder must walk the
    plain block raster, not a 2x2-interleaved grid."""
    coeffs = np.zeros((2, 3, 64), dtype=np.int64)
    coeffs[:, :, 0] = [[10, 20, 30], [40, 50, 60]]
    data = bytearray(encode_jpeg_coeffs(coeffs, QTAB, 16, 24))
    i = bytes(data).find(b"\xff\xc0")
    assert data[i + 11] == 0x11
    data[i + 11] = 0x22  # declare 2x2 sampling on the only component
    img = decode_jpeg_gray(bytes(data))
    exp = np.repeat(np.repeat(coeffs[:, :, 0] + 128, 8, 0), 8, 1)
    assert img.shape == (16, 24) and (img == exp).all()


def test_multiscan_baseline_rejected_cleanly():
    c3 = np.zeros((1, 1, 3, 64), dtype=np.int64)
    data = encode_jpeg_coeffs(c3, QTAB, 8, 8)
    # rebuild with an SOS listing only component 1 (ns=1 < nc=3)
    i = data.find(b"\xff\xda")
    seglen = int.from_bytes(data[i + 2 : i + 4], "big")
    import struct as _s

    new_sos = _s.pack(">BBH", 0xFF, 0xDA, 8) + bytes([1, 1, 0x00, 0, 63, 0])
    patched = data[:i] + new_sos + data[i + 2 + seglen :]
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg_gray(patched)


def test_truncated_stream_raises_value_error():
    coeffs = np.zeros((2, 2, 64), dtype=np.int64)
    coeffs[:, :, 0] = 50
    data = encode_jpeg_coeffs(coeffs, QTAB, 16, 16)
    with pytest.raises((ValueError, EOFError)):
        decode_jpeg_gray(data[: len(data) - 8])


# ---------------------------------------------------------------------------
# progressive (SOF2, T.81 Annex G)
# ---------------------------------------------------------------------------

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.jpeg import (  # noqa: E402
    encode_jpeg_coeffs_progressive,
)


def _rand_coeffs(rng, bh, bw, nc=1, dc_span=100, ac_span=7, ac_nnz=8):
    shape = (bh, bw, 64) if nc == 1 else (bh, bw, nc, 64)
    coeffs = np.zeros(shape, dtype=np.int64)
    view = coeffs if nc > 1 else coeffs[:, :, None, :]
    for by in range(bh):
        for bx in range(bw):
            for ci in range(view.shape[2]):
                view[by, bx, ci, 0] = int(rng.integers(-dc_span, dc_span + 1))
                for _ in range(int(rng.integers(0, ac_nnz))):
                    k = int(rng.integers(1, 64))
                    view[by, bx, ci, k] = int(rng.integers(-ac_span, ac_span + 1))
    return coeffs


def test_progressive_equals_baseline_across_scan_scripts():
    """The SAME coefficients through the progressive scan pipeline (DC
    successive approximation, spectral bands, AC refinement with EOB runs)
    must decode to the SAME pixels as the baseline encoding — two entirely
    different entropy structures over one content, so a self-consistent
    encoder/decoder bug pair in either path breaks the equality."""
    rng = np.random.default_rng(42)
    for trial in range(12):
        bh, bw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        coeffs = _rand_coeffs(rng, bh, bw)
        h = bh * 8 - int(rng.integers(0, 3))
        w = bw * 8 - int(rng.integers(0, 3))
        base = decode_jpeg_gray(encode_jpeg_coeffs(coeffs, QTAB, h, w))
        for al_dc, bands, al_ac in [
            (1, ((1, 5), (6, 63)), 1),   # the web-typical script
            (0, ((1, 63),), 0),          # no successive approximation
            (2, ((1, 2), (3, 20), (21, 63)), 2),  # deep refinement, 3 bands
            (3, ((1, 63),), 1),          # DC bits dominate
        ]:
            data = encode_jpeg_coeffs_progressive(
                coeffs, QTAB, h, w, al_dc=al_dc, ac_bands=bands, al_ac=al_ac
            )
            prog = decode_jpeg_gray(data)
            assert np.array_equal(prog, base), (trial, al_dc, bands, al_ac)


def test_progressive_matches_independent_idct_golden():
    """Progressive decode against the textbook O(64^2) IDCT golden (shared
    with the baseline golden test — independent of BOTH entropy paths)."""
    rng = np.random.default_rng(5)
    coeffs = _rand_coeffs(rng, 2, 2)
    data = encode_jpeg_coeffs_progressive(coeffs, QTAB, 16, 16)
    img = decode_jpeg_gray(data)
    for by in range(2):
        for bx in range(2):
            exp = golden_idct_block(coeffs[by, bx], QTAB)
            got = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert np.array_equal(got, exp), (by, bx)


def test_progressive_eob_runs_span_blocks():
    """A mostly-empty large grid forces multi-block EOB runs in every AC
    scan (first AND refinement: EOBn symbols with extension bits, folded
    correction bits) — plus ZRL-in-refinement via a sparse tail block."""
    rng = np.random.default_rng(9)
    bh, bw = 10, 12
    coeffs = np.zeros((bh, bw, 64), dtype=np.int64)
    coeffs[:, :, 0] = rng.integers(-90, 91, size=(bh, bw))
    coeffs[3, 7, 1] = 3
    coeffs[3, 7, 40] = -3  # >16 zero-history coeffs before it: ZRL path
    coeffs[9, 11, 63] = 1  # newly-significant at the band edge
    base = decode_jpeg_gray(encode_jpeg_coeffs(coeffs, QTAB, bh * 8, bw * 8))
    prog = decode_jpeg_gray(
        encode_jpeg_coeffs_progressive(coeffs, QTAB, bh * 8, bw * 8, al_dc=2, al_ac=1)
    )
    assert np.array_equal(prog, base)


def test_progressive_three_component_returns_y_plane():
    """3-component 4:4:4 progressive: interleaved DC scan + six per-
    component AC scans; the decoder returns the luma plane only."""
    rng = np.random.default_rng(11)
    coeffs = _rand_coeffs(rng, 2, 2, nc=3)
    base = decode_jpeg_gray(encode_jpeg_coeffs(coeffs, QTAB, 16, 16))
    prog = decode_jpeg_gray(encode_jpeg_coeffs_progressive(coeffs, QTAB, 16, 16))
    assert prog.shape == (16, 16)
    assert np.array_equal(prog, base)


def test_progressive_dc_only_exact_flats():
    """DC-only progressive blocks decode to the exact flat DC + 128 (the
    q112 fixture family's closed form at its simplest)."""
    coeffs = np.zeros((1, 3, 64), dtype=np.int64)
    coeffs[0, :, 0] = [-100, 0, 99]
    img = decode_jpeg_gray(encode_jpeg_coeffs_progressive(coeffs, QTAB, 8, 24))
    exp = np.repeat(np.array([[28, 128, 227]], dtype=np.uint8), 8, 0)
    exp = np.repeat(exp, 8, 1)
    assert np.array_equal(img, exp)


def test_progressive_truncated_raises():
    coeffs = np.zeros((2, 2, 64), dtype=np.int64)
    coeffs[:, :, 0] = 50
    data = encode_jpeg_coeffs_progressive(coeffs, QTAB, 16, 16)
    with pytest.raises((ValueError, EOFError)):
        decode_jpeg_gray(data[: len(data) - 10])


def test_progressive_through_builtin_operator(spark):
    """synthetic_progressive_jpeg_media payloads decode through the SAME
    mapInPandas operator path as baseline JPEG/PNG (payload sniffing) —
    the q112 integration, asserted against the direct decode."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        decode_image_features,
        synthetic_progressive_jpeg_media,
    )

    media = synthetic_progressive_jpeg_media(spark, n=6)
    rows = {
        r["media_id"]: r
        for r in decode_image_features(media, decoder="builtin").collect()
    }
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(rows) == 6
    for mid, r in rows.items():
        img = decode_jpeg_gray(payloads[mid])
        assert (r["width"], r["height"]) == (16, 16)
        assert abs(r["mean_luma"] - img.mean() / 255.0) < 1e-12
