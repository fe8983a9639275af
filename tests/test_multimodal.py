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
