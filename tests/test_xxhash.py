"""Python XXH64 must be bit-identical to Spark's xxhash64 expression —
the driver-side bucket routing depends on it."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sifter_mrc_search_engine_spark.constants import TERM_BUCKETS
from sifter_mrc_search_engine_spark.functions.xxhash import (
    term_bucket,
    xxhash64_signed,
)

EDGE = ["", "a", "ab", "abc", "abcd", "x" * 7, "x" * 8, "x" * 31, "x" * 32,
        "x" * 33, "x" * 100, "한국어", "가나다라마바사아자차카타파하", "mixed 가 1"]


def test_parity_with_spark(spark):
    df = spark.createDataFrame([(t,) for t in EDGE], "t string")
    rows = df.select(
        "t",
        F.xxhash64("t").alias("h"),
        F.pmod(F.xxhash64("t"), F.lit(TERM_BUCKETS)).cast("int").alias("b"),
    ).collect()
    for r in rows:
        assert xxhash64_signed(r["t"]) == r["h"], repr(r["t"])
        assert term_bucket(r["t"], TERM_BUCKETS) == r["b"], repr(r["t"])


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=300, deadline=None)
def test_hash_stable_and_bucket_in_range(s):
    h = xxhash64_signed(s)
    assert -(2**63) <= h < 2**63
    assert 0 <= term_bucket(s, 64) < 64
    assert xxhash64_signed(s) == h  # deterministic


def test_fuzz_parity_with_spark(spark):
    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789가나다라 "
    samples = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 60))) for _ in range(200)]
    df = spark.createDataFrame([(t,) for t in samples], "t string")
    rows = df.select("t", F.xxhash64("t").alias("h")).collect()
    for r in rows:
        assert xxhash64_signed(r["t"]) == r["h"], repr(r["t"])
