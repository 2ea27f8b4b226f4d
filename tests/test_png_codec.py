"""Real-PNG codec invariants (r8, r7 verdict item 2).

The registered query multimodal_resize_execute hash-checks the whole
pipeline against DuckDB's arithmetic replay; these tests pin the
codec pieces in isolation so a parity failure localizes fast.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sp500_stock_etl_spark.operators import multimodal as M


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    base_filter=st.integers(0, 4),
)
def test_roundtrip_random_pixels(w, h, seed, base_filter):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    filters = [(base_filter + y) % 5 for y in range(h)]
    png = M.encode_png(w, h, rgb, filters)
    assert M.decode_png(png) == (w, h, rgb)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_type_roundtrips(ftype):
    w, h = 7, 5
    rgb = bytes((x * 13 + 7) % 256 for x in range(w * h * 3))
    png = M.encode_png(w, h, rgb, [ftype] * h)
    assert M.decode_png(png) == (w, h, rgb)


def test_filter_unfilter_inverse_per_scanline():
    raw = bytes((i * 31 + 5) % 256 for i in range(30))
    prev = bytes((i * 17 + 3) % 256 for i in range(30))
    for ftype in range(5):
        filt = M._filter_scanline(ftype, raw, prev, 3)
        assert M._unfilter_scanline(ftype, filt, prev, 3) == raw


def test_paeth_predictor_tie_breaking():
    # Spec: ties resolve left, then up, then upleft.
    assert M._paeth(10, 10, 10) == 10
    # p = a + b - c; a=0,b=4,c=2 -> p=2, pa=2, pb=2, pc=0 -> upleft wins
    assert M._paeth(0, 4, 2) == 2
    # (a distinct-value left/up tie is impossible: pa == pb with the
    # same sign forces a == b, opposite signs make pc win) — pin the
    # plain winners instead:
    assert M._paeth(1, 2, 2) == 1  # left exact (pa = 0)
    assert M._paeth(2, 1, 2) == 1  # up exact (pb = 0)


def test_corrupt_idat_crc_raises():
    w, h = M.png_corpus_dims(5)
    png = bytearray(M.encode_png(w, h, M._formula_pixels(5, w, h)))
    png[50] ^= 0xFF  # inside the first IDAT's data
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png(bytes(png))


def test_truncated_and_foreign_payloads_return_none():
    w, h = M.png_corpus_dims(3)
    png = M.encode_png(w, h, M._formula_pixels(3, w, h))
    assert M.decode_png(png[:40]) is None  # header-only prefix
    assert M.decode_png(b"RIFF....WAVE") is None
    # the legacy synthetic_media image payloads (zero-CRC IHDR, no
    # IDAT) must parse dimensions but decline pixel decode
    assert M.decode_png(M._PNG_PREFIX + b"\x00" * 30) is None


def test_header_parser_agrees_with_codec():
    for mid in (0, 11, 29):
        w, h = M.png_corpus_dims(mid)
        png = M.encode_png(w, h, M._formula_pixels(mid, w, h))
        assert M.png_dimensions(png) == (w, h)


def test_multi_idat_split_is_real():
    w, h = M.png_corpus_dims(20)
    png = M.encode_png(w, h, M._formula_pixels(20, w, h))
    assert png.count(b"IDAT") == 2


def test_resize_nearest_indexing():
    # 2x2 -> 4x4: each source pixel becomes a 2x2 block (floor map).
    rgb = bytes(range(12))
    out = M.resize_nearest(rgb, 2, 2, 4, 4)
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(2, 2, 3)
    for y in range(4):
        for x in range(4):
            assert (out[y, x] == img[(y * 2) // 4, (x * 2) // 4]).all()
    # downscale keeps exact floor mapping too: 4x1 -> 2x1 picks cols 0,2
    rgb4 = bytes(range(12))
    out2 = M.resize_nearest(rgb4, 4, 1, 2, 1)
    img4 = np.frombuffer(rgb4, dtype=np.uint8).reshape(1, 4, 3)
    assert (out2[0, 0] == img4[0, 0]).all()
    assert (out2[0, 1] == img4[0, 2]).all()


def test_deflate_stream_is_genuine():
    # The IDAT payload must be a real zlib stream of the filtered
    # scanlines — inflate it independently of decode_png.
    w, h = M.png_corpus_dims(7)
    png = M.encode_png(w, h, M._formula_pixels(7, w, h))
    idat = b""
    i = 8
    while i + 12 <= len(png):
        clen = int.from_bytes(png[i : i + 4], "big")
        if png[i + 4 : i + 8] == b"IDAT":
            idat += png[i + 8 : i + 8 + clen]
        i += 12 + clen
    raw = zlib.decompress(idat)
    assert len(raw) == h * (1 + w * 3)


# --- r8: WAV PCM codec (the audio execute twin) ---------------------------


def test_wav_pcm_roundtrip_and_header_facts():
    import numpy as np

    for mid in (0, 6, 13, 35):
        wav = M.encode_wav_pcm(mid)
        info = M.wav_info(wav)
        n = M.wav_corpus_duration_ms(mid) * 8
        assert info["duration_ms"] == M.wav_corpus_duration_ms(mid)
        assert info["n_samples"] == n
        assert info["data_offset"] == 44
        s = np.frombuffer(
            wav, dtype="<i2", count=info["data_size"] // 2,
            offset=info["data_offset"],
        ).astype(np.int64)
        assert (s == M._formula_samples(mid, n)).all()


def test_wav_info_data_offset_on_reordered_chunks():
    # data chunk placed after an extra chunk: offset must track it.
    body = (100).to_bytes(2, "little") * 8
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    wav = (
        b"RIFF" + (36 + len(extra) + len(body)).to_bytes(4, "little")
        + b"WAVEfmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + extra
        + b"data" + len(body).to_bytes(4, "little") + body
    )
    info = M.wav_info(wav)
    assert info["data_offset"] == 44 + len(extra)
    assert info["n_samples"] == 8


def test_pcm_chunk_features_partial_last_chunk(spark):
    rows = (
        M.wav_pcm_chunk_features(M.synthetic_wav_corpus(spark, 3), chunk_ms=700)
        .collect()
    )
    import numpy as np

    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rs in by_media.items():
        dur = M.wav_corpus_duration_ms(mid)
        assert len(rs) == (dur + 699) // 700
        rs.sort(key=lambda r: r.chunk_idx)
        # full chunks carry 700*8 samples; the last is the remainder
        for r in rs[:-1]:
            assert r.n_samples == 700 * 8
        assert rs[-1].n_samples == (dur - (len(rs) - 1) * 700) * 8
        # features equal the direct formula fold
        n = dur * 8
        s = M._formula_samples(mid, n)
        assert sum(r.sum_s for r in rs) == int(s.sum())
        assert sum(r.sum_sq for r in rs) == int((s * s).sum())


def test_pcm_chunk_features_skips_planner_only_payloads(spark):
    # The legacy synthetic_media WAVs declare a duration but truncate
    # the body — the execute stage must skip them, not mis-decode.
    media = M.synthetic_media(spark, 12).where("kind = 'audio'").select(
        "media_id", "payload"
    )
    assert M.wav_pcm_chunk_features(media).count() == 0
