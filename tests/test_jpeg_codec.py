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
    # progressive (SOF2) is out of scope with a clear message
    data = bytearray(encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
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
