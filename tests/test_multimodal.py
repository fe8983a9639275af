from __future__ import annotations

import pytest

from casf_spark.multimodal import binary as MM


@pytest.fixture(scope="module")
def payloads(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "world!!"), (3, "")],
        "doc_id long, text string")
    return MM.with_payload(df, "doc_id", "text")


def test_payload_metadata_jvm_only(spark, payloads):
    meta = {r.doc_id: r for r in MM.payload_metadata(payloads).collect()}
    assert meta[1].n_bytes == 5
    assert meta[1].header_hex == "68656c6c"  # 'hell'
    assert meta[3].n_bytes == 0
    assert meta[2].mime == "application/octet-stream"


def test_extract_features_deterministic(spark, payloads):
    a = {r.doc_id: tuple(r) for r in MM.extract_features(payloads).collect()}
    b = {r.doc_id: tuple(r) for r in MM.extract_features(payloads).collect()}
    assert a == b
    assert a[1][1] == 5                       # n_bytes
    assert a[1][2] == ord("h")                # first_byte
    assert a[1][3] == sum(b"hello") % 997     # byte_sum_mod
    assert a[3][2] is None                    # empty payload -> null first byte


def test_real_decoder_gate(spark, payloads):
    with pytest.raises(NotImplementedError):
        MM.extract_features(payloads, real_decoder=True)


def test_resize_images_stub_shape(spark, payloads):
    out = {r.doc_id: r for r in
           MM.resize_images(payloads, width=4, height=3).collect()}
    assert len(out) == payloads.count()          # 1:1 rows
    assert all(r.width == 4 and r.height == 3 for r in out.values())
    assert all(len(r.resized) == 12 for r in out.values())
    assert out[1].resized[:5] == b"hello"        # deterministic fake raster
    with pytest.raises(NotImplementedError):
        MM.resize_images(payloads, real_decoder=True)


def test_sample_frames_explodes_rows(spark, payloads):
    rows = MM.sample_frames(payloads, n_frames=4).collect()
    n_docs = payloads.count()
    assert len(rows) == 4 * n_docs               # 1 -> n_frames explosion
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(r.frame_idx for r in by_doc[1]) == [0, 1, 2, 3]
    # frames reassemble a prefix of the original payload, in order:
    # "hello" with 4 frames -> step 1 -> b"h", b"e", b"l", b"l"
    joined = b"".join(r.frame for r in sorted(by_doc[1],
                                              key=lambda r: r.frame_idx))
    assert joined == b"hell"
    with pytest.raises(NotImplementedError):
        MM.sample_frames(payloads, real_decoder=True)
