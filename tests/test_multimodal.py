"""Multimodal plumbing unit tests: resize contract, frame fan-out,
decoder stub gating (operators/multimodal.py)."""

from __future__ import annotations

import pytest

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators.multimodal import (
    decode_image,
    resize_payload,
    sample_frames,
    synthesize_media,
)

SF = "/root/testdata/sf0.001"


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_resize_bounds_every_payload(spark):
    media = synthesize_media(load_table(spark, SF, "documents"))
    resized = resize_payload(media, target_bytes=64)
    # binary in, binary out (same columns/types; nullability may differ)
    assert [(f.name, f.dataType) for f in resized.schema.fields] == [
        (f.name, f.dataType) for f in media.schema.fields
    ]
    rows = resized.collect()
    assert rows and all(r.byte_len <= 64 for r in rows)
    assert all(len(bytes(r.payload)) == r.byte_len for r in rows)


def test_resize_accepts_injected_resizer(spark):
    media = synthesize_media(load_table(spark, SF, "documents")).limit(5)
    # a "real" resizer would decode+scale; the contract is bytes->bytes
    padded = resize_payload(
        media, target_bytes=10, resizer=lambda b, n: (b + b"\x00" * n)[:n]
    )
    assert all(r.byte_len == 10 for r in padded.collect())


def test_frame_sample_fanout_matches_formula(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    media = synthesize_media(docs)
    frames = sample_frames(media, frame_bytes=16, stride=4).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    for aid, blen in [(r.asset_id, r.byte_len) for r in media.collect()]:
        n_frames = max(1, -(-blen // 16))
        expected = len(range(0, n_frames, 4))
        assert len(by_asset[aid]) == expected, aid
        # every sampled frame except possibly the tail is full-width
        for fr in by_asset[aid]:
            assert fr.frame_len == 16 or fr.frame_idx == n_frames - 1


def test_arrow_byte_stats_empty_and_sliced(spark):
    """mapInArrow buffer math must survive empty payloads and sliced
    arrays (nonzero arr.offset after internal batch slicing)."""
    from clean_census_acs_data_spark.operators.multimodal import arrow_byte_stats

    rows = [(1, b""), (2, b"AB"), (3, b"\x00\xff"), (4, b"x" * 1000)]
    media = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r.asset_id: (r.byte_len, r.ascii_sum) for r in arrow_byte_stats(media).collect()}
    assert got == {
        1: (0, 0),
        2: (2, ord("A") + ord("B")),
        3: (2, 255),
        4: (1000, 1000 * ord("x")),
    }
