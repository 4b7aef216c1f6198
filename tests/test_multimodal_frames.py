from __future__ import annotations

import hashlib

from sressentials_spark.operators.multimodal import attach_payload, sample_frames


def test_frame_windows_and_stride(spark):
    # 600 ASCII bytes, frame_bytes=100, stride=2 → 6 frames, keep 0/2/4.
    text = "x" * 600
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {
        r["frame_idx"]: r
        for r in sample_frames(attach_payload(df), frame_bytes=100, stride=2).collect()
    }
    assert sorted(rows) == [0, 2, 4]
    for i, r in rows.items():
        assert r["n_frames"] == 6
        assert r["byte_start"] == i * 100
        assert r["byte_len"] == 100
        expect = hashlib.md5(
            text.encode()[i * 100 : i * 100 + 100].hex().upper().encode()
        ).hexdigest()
        assert r["frame_md5"] == expect


def test_partial_last_frame(spark):
    # 250 bytes, frame_bytes=100, stride=1 → frames of 100/100/50.
    df = spark.createDataFrame([(1, "y" * 250)], "doc_id long, text string")
    rows = {
        r["frame_idx"]: r
        for r in sample_frames(attach_payload(df), frame_bytes=100, stride=1).collect()
    }
    assert [rows[i]["byte_len"] for i in (0, 1, 2)] == [100, 100, 50]


def test_multibyte_payload_slices_bytes_not_chars(spark):
    # 3-byte UTF-8 chars: 40 chars = 120 bytes → 2 frames at 100 bytes;
    # the second frame window is 20 bytes and may split a codepoint —
    # byte semantics, exactly like a real binary payload.
    text = "€" * 40  # EURO SIGN, 3 bytes each
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {
        r["frame_idx"]: r
        for r in sample_frames(attach_payload(df), frame_bytes=100, stride=1).collect()
    }
    assert rows[0]["byte_len"] == 100 and rows[1]["byte_len"] == 20
    raw = text.encode()
    for i in (0, 1):
        expect = hashlib.md5(
            raw[i * 100 : i * 100 + 100].hex().upper().encode()
        ).hexdigest()
        assert rows[i]["frame_md5"] == expect


def test_resize_truncates_and_pads(spark):
    import hashlib
    from sressentials_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, "short"), (2, "y" * 300)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in resize_media(attach_payload(df), target_bytes=100).collect()
    }
    assert rows[1]["n_bytes_in"] == 5 and rows[1]["n_bytes_out"] == 100
    assert rows[2]["n_bytes_in"] == 300 and rows[2]["n_bytes_out"] == 100
    short = b"short".ljust(100, b" ")
    assert rows[1]["resized_md5"] == hashlib.md5(short.hex().upper().encode()).hexdigest()
    long = (b"y" * 100)
    assert rows[2]["resized_md5"] == hashlib.md5(long.hex().upper().encode()).hexdigest()
