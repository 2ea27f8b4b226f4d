"""Real baseline-JPEG codec invariants (r8 extension).

The registered query multimodal_jpeg_decode_execute hash-checks the
whole pipeline against DuckDB's arithmetic replay; these tests pin the
codec pieces in isolation so a parity failure localizes fast:
entropy-coding roundtrips recover the EXACT quantized coefficients
(the strongest possible check — it convicts the Huffman tables, the
bit packer/reader, stuffing, DC prediction, ZRL/EOB, and the zigzag
independently of the IDCT), and the IDCT's exact-cosine positions are
pinned against the closed-form pixel formula.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sp500_stock_etl_spark.operators import multimodal as M


def _random_blocks(rng, n_blocks: int, density: float = 0.2):
    """Arbitrary quantized coefficient blocks (not corpus-shaped)."""
    blocks = []
    for _ in range(n_blocks):
        nat = [0] * 64
        for k in range(64):
            if rng.random() < density:
                nat[k] = int(rng.integers(-255, 256))
        blocks.append(nat)
    return blocks


def test_zigzag_order_is_the_standard_one():
    zz = M._JPEG_ZIGZAG
    assert zz[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert zz[10] == (4, 0) and zz[14] == (0, 4) and zz[39] == (4, 4)
    assert zz[63] == (7, 7) and len(set(zz)) == 64


def test_annex_k_tables_are_complete_canonical_codes():
    for bits, vals in (
        (M._JPEG_DC_BITS, M._JPEG_DC_VALS),
        (M._JPEG_AC_BITS, M._JPEG_AC_VALS),
    ):
        assert sum(bits) == len(vals)
        codes = M._jpeg_build_codes(bits, vals)
        # Canonical codes are prefix-free by construction; verify no
        # (length, code) pair collides and all lengths within 16.
        seen = {(ln, c) for (c, ln) in codes.values()}
        assert len(seen) == len(codes)
        assert all(1 <= ln <= 16 and c < (1 << ln) for (c, ln) in codes.values())
    assert len(M._JPEG_AC_VALS) == 162  # full Annex K.3.2 table


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    ri=st.sampled_from([0, 1, 3, 4]),
)
def test_entropy_coding_roundtrips_exact_coefficients(w, h, seed, ri):
    rng = np.random.default_rng(seed)
    nbx, nby = (w + 7) // 8, (h + 7) // 8
    blocks = _random_blocks(rng, nbx * nby)
    payload = M.encode_jpeg_gray(w, h, blocks, restart_interval=ri)
    parsed = M.parse_jpeg_gray(payload)
    assert parsed is not None
    assert (parsed["width"], parsed["height"]) == (w, h)
    assert parsed["blocks"] == blocks
    assert parsed["qtable"] == [8] * 64


def test_byte_stuffing_is_exercised_and_transparent():
    # Dense random blocks reliably produce 0xFF scan bytes; assert the
    # stuffed form appears after SOS and still roundtrips bit-exact.
    rng = np.random.default_rng(7)
    blocks = _random_blocks(rng, 12, density=0.6)
    payload = M.encode_jpeg_gray(32, 24, blocks)
    sos = payload.index(b"\xff\xda")
    assert b"\xff\x00" in payload[sos:]
    assert M.parse_jpeg_gray(payload)["blocks"] == blocks


def test_restart_markers_present_and_dc_prediction_resets():
    w, h = 40, 16  # 5x2 blocks, restart every 4 -> RST0, RST1
    blocks = [[0] * 64 for _ in range(10)]
    for i, b in enumerate(blocks):
        b[0] = 100 * (i % 3) - 100
    payload = M.encode_jpeg_gray(w, h, blocks, restart_interval=4)
    sos = payload.index(b"\xff\xda")
    assert b"\xff\xd0" in payload[sos:] and b"\xff\xd1" in payload[sos:]
    assert b"\xff\xdd" in payload[:sos]  # DRI segment
    assert M.parse_jpeg_gray(payload)["blocks"] == blocks


def test_idct_exact_cosine_positions_match_closed_form():
    # A single block with coefficients only on the exact positions
    # decodes to the integer formula — pinning the IDCT scaling.
    for d, fh, fv, fc in [(-16, 2, -2, 1), (16, -2, 2, -1), (0, 1, 1, 1)]:
        nat = [0] * 64
        nat[M._JPEG_POS_DC] = d
        nat[M._JPEG_POS_H4] = fh
        nat[M._JPEG_POS_V4] = fv
        nat[M._JPEG_POS_44] = fc
        payload = M.encode_jpeg_gray(8, 8, [nat])
        _, _, img = M.decode_jpeg_gray(payload)
        for y in range(8):
            for x in range(8):
                sx = 1 if x % 4 in (0, 3) else -1
                sy = 1 if y % 4 in (0, 3) else -1
                want = 128 + d + sy * fv + sx * fh + sx * sy * fc
                assert int(img[y, x]) == want


def test_idct_matches_independent_reference_on_general_blocks():
    # The decoder's IDCT vs a from-scratch quadruple-loop DCT-III sum
    # (written here independently of the operator module).
    rng = np.random.default_rng(11)
    nat = [int(rng.integers(-64, 65)) for _ in range(64)]
    payload = M.encode_jpeg_gray(8, 8, [nat])
    _, _, img = M.decode_jpeg_gray(payload)
    coeff = np.array(nat, dtype=np.float64).reshape(8, 8) * 8.0
    ref = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    acc += (
                        cv * cu / 4 * coeff[v, u]
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                    )
            ref[y, x] = acc
    want = np.clip(np.round(ref + 128.0), 0, 255).astype(np.uint8)
    assert (img == want).all()


def test_corpus_pixels_match_formula_including_edge_crop():
    for mid in (0, 1, 3, 7, 25):  # 0 and 3 carry restart markers
        w, h = M.jpeg_corpus_dims(mid)
        assert w % 8 and h % 8  # partial edge blocks by construction
        got = M.decode_jpeg_gray(M.encode_jpeg_corpus(mid))
        assert got is not None and got[:2] == (w, h)
        img = got[2]
        assert img.shape == (h, w)
        for x, y in [(0, 0), (w - 1, h - 1), (w // 2, h // 2), (8, 9)]:
            assert int(img[y, x]) == M.jpeg_corpus_pixel(mid, x, y)


def test_header_parser_agrees_with_codec():
    payload = M.encode_jpeg_corpus(5)
    assert M.jpeg_dimensions(payload) == M.jpeg_corpus_dims(5)


def test_non_baseline_and_foreign_payloads_return_none():
    assert M.decode_jpeg_gray(b"") is None
    assert M.decode_jpeg_gray(b"\x89PNG\r\n\x1a\n") is None
    payload = bytearray(M.encode_jpeg_corpus(1))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    assert M.decode_jpeg_gray(bytes(payload)) is None


def test_truncated_scan_raises_not_garbage():
    payload = M.encode_jpeg_corpus(2)
    with pytest.raises(ValueError):
        M.decode_jpeg_gray(payload[: len(payload) // 2])


def test_marker_byte_inside_scan_raises():
    payload = bytearray(M.encode_jpeg_corpus(4))
    sos = payload.index(b"\xff\xda")
    # Inject a bogus bare marker a few bytes into the entropy data.
    payload[sos + 12 : sos + 12] = b"\xff\xd9"
    with pytest.raises(ValueError):
        M.decode_jpeg_gray(bytes(payload))


# --- AVI / Motion-JPEG container (r8 extension) ---------------------------


def test_avi_header_facts_and_frame_ranges():
    frames = [M.encode_jpeg_from_seed(s, 25, 19) for s in (5, 6, 7)]
    payload = M.encode_avi_mjpeg(25, 19, frames, fps=24)
    info = M.avi_info(payload)
    assert info is not None
    assert (info["width"], info["height"]) == (25, 19)
    assert info["handler"] == b"MJPG" and info["fps"] == 24
    assert info["n_frames_declared"] == 3 == len(info["frames"])
    for f, (off, size) in enumerate(info["frames"]):
        assert payload[off : off + size] == frames[f]


def test_avi_word_alignment_pads_odd_frames():
    # An odd-length frame chunk must be padded; the NEXT frame's range
    # must still be located correctly.
    frames = [M.encode_jpeg_from_seed(s, 17, 17) for s in (1, 2)]
    odd = next((f for f in frames if len(f) % 2), None)
    if odd is None:  # force an odd length via a COM-free tail tweak
        frames[0] += b"\x00"  # trailing pad after EOI is legal garbage
    payload = M.encode_avi_mjpeg(17, 17, frames)
    info = M.avi_info(payload)
    assert len(info["frames"]) == 2
    for f, (off, size) in enumerate(info["frames"]):
        assert payload[off : off + size] == frames[f]


def test_avi_corpus_sampled_frames_match_formula():
    vid = 4
    payload = M.encode_avi_corpus(vid)
    info = M.avi_info(payload)
    w, h = M.avi_corpus_dims(vid)
    for f in range(0, M.avi_corpus_n_frames(vid), 3):
        off, size = info["frames"][f]
        _, _, img = M.decode_jpeg_gray(payload[off : off + size])
        s = M.avi_frame_seed(vid, f)
        for x, y in [(0, 0), (w - 1, h - 1), (w // 2, h // 3)]:
            assert int(img[y, x]) == M.jpeg_seed_pixel(s, x, y)


def test_avi_rejects_foreign_payloads():
    assert M.avi_info(b"") is None
    assert M.avi_info(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert M.avi_info(M.encode_jpeg_corpus(0)) is None


def test_avi_frame_content_differs_across_frames():
    # Distinct per-frame seeds: a frame-indexing bug cannot cancel.
    payload = M.encode_avi_corpus(2)
    info = M.avi_info(payload)
    imgs = [
        M.decode_jpeg_gray(payload[o : o + s])[2].tobytes()
        for o, s in info["frames"][:3]
    ]
    assert len(set(imgs)) == 3
