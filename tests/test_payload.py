"""T1/T2/T3 parity tests: decode dispatch, metadata projection, and the
exact properties-JSON shape (PulsarUtils.java:144-157)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.functions.payload import (
    decode_payload,
    encode_properties_json,
    normalize_content_type,
    project_metadata,
)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("application/json; charset=utf-8", "application/json"),
        ("TEXT/PLAIN", "text/plain"),
        ("text/csv;charset=ISO-8859-1", "text/csv"),
        ("application/xml", "application/xml"),
    ],
)
def test_normalize_content_type(raw, expected):
    # strip ';charset' like PulsarMessageConsumer.java:518-519, but NPE-safe
    assert normalize_content_type(raw) == expected


def _msg_frame(spark):
    return spark.createDataFrame(
        [
            ('{"id": 1, "amount": 2.5}', "t0", "1", "k1", 0, {"a": "1", "b": "2"}),
            ('{"id": 2, "amount": 0.5}', "t1", "2", None, 3, {}),
        ],
        "value string, topic string, message_id string, key string, "
        "redelivery_count int, properties map<string,string>",
    )


def test_decode_json(spark):
    out = decode_payload(_msg_frame(spark), "application/json; charset=utf-8", "id INT, amount DOUBLE")
    rows = out.select("message_id", "body.id", "body.amount").orderBy("message_id").collect()
    assert [tuple(r) for r in rows] == [("1", 1, 2.5), ("2", 2, 0.5)]


def test_decode_csv(spark):
    df = spark.createDataFrame([("7,hello",)], "value string")
    out = decode_payload(df, "text/csv", "id INT, word STRING")
    r = out.select("body.id", "body.word").first()
    assert tuple(r) == (7, "hello")


def test_decode_xml(spark):
    df = spark.createDataFrame([("<m><id>9</id></m>",)], "value string")
    out = decode_payload(df, "application/xml", "id INT")
    assert out.select("body.id").first()[0] == 9


def test_decode_text_passthrough(spark):
    df = spark.createDataFrame([("plain payload",)], "value string")
    out = decode_payload(df, "text/plain")
    assert out.select("body").first()[0] == "plain payload"


def test_decode_unknown_type_yields_error_column_not_failure(spark):
    # unlike the reference's SOAP fallback, unknown types must not kill
    # the stream — null body + decode_error column
    df = spark.createDataFrame([("blob",)], "value string")
    out = decode_payload(df, "application/octet-stream")
    row = out.first()
    assert row["body"] is None
    assert "unsupported content type application/octet-stream" in row["decode_error"]


def test_decode_json_without_schema_raises(spark):
    with pytest.raises(ValueError, match="requires a schema"):
        decode_payload(_msg_frame(spark), "application/json")


def test_metadata_projection_columns(spark):
    # T2 — PulsarUtils.java:121-130 names and order
    out = project_metadata(_msg_frame(spark))
    assert out.columns == ["topicNames", "msgId", "key", "redeliveryCount", "properties", "value"]
    row = out.orderBy("msgId").first()
    assert (row["topicNames"], row["msgId"], row["key"], row["redeliveryCount"]) == (
        "t0",
        "1",
        "k1",
        0,
    )


def test_properties_json_exact_shape(spark):
    # T3 — array of SINGLE-KEY objects, not one object:
    # [{"a":"1"},{"b":"2"}] per PulsarUtils.java:144-157
    out = _msg_frame(spark).select(
        "message_id", encode_properties_json("properties").alias("pj")
    )
    rows = {r["message_id"]: r["pj"] for r in out.collect()}
    assert rows["1"] == '[{"a":"1"},{"b":"2"}]'
    assert rows["2"] == "[]"


def test_properties_json_empty_and_special_chars(spark):
    df = spark.createDataFrame(
        [({"k": 'va"l'},)], "properties map<string,string>"
    )
    assert df.select(encode_properties_json().alias("p")).first()["p"] == '[{"k":"va\\"l"}]'
