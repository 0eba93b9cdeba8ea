"""Parity of the oracle-side XXH64 with Spark's xxhash64 builtin."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kgp.ids import SPARK_XXHASH_SEED, _signed64, stable_id, xxh64


# Known-answer vectors from the published XXH64 spec (seed 0)
def test_xxh64_known_vectors():
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", seed=0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", seed=0) == 0x44BC2CF5AD770999


@given(st.text(max_size=64))
@settings(max_examples=200, deadline=None)
def test_xxh64_pure_python_stable(s):
    # determinism + 64-bit range
    h = xxh64(s.encode("utf-8"))
    assert 0 <= h < (1 << 64)
    assert h == xxh64(s.encode("utf-8"))


def test_stable_id_matches_spark(spark):
    from pyspark.sql import functions as F

    from kgp.ids import spark_stable_id_expr

    rows = [
        ("conv-000001", 0, 2, 4),
        ("conv-000042", 17, 0, 1),
        ("", 0, 0, 0),
        ("unicode-émoji-☃", 123456789, 5, 99),
        ("x" * 100, 2**31 - 1, 7, 8),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, s int, e int")
    got = (
        df.select(
            "conv_id",
            "turn_idx",
            "s",
            "e",
            spark_stable_id_expr("conv_id", "turn_idx", "s", "e").alias("id"),
        )
        .orderBy("conv_id")
        .collect()
    )
    for r in got:
        assert r["id"] == stable_id(r["conv_id"], r["turn_idx"], r["s"], r["e"])


def test_signed_conversion():
    assert _signed64((1 << 63)) == -(1 << 63)
    assert _signed64((1 << 63) - 1) == (1 << 63) - 1
