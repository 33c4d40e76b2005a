"""Varint + delta-gap codec round-trips (property-based, FIXTURES §4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lsearch_spark.codec import (
    decode_ids,
    decode_positions,
    delta_decode,
    delta_encode,
    encode_ids,
    encode_positions,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**28, 2**35, 2**63, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)
    assert varint_encode(np.array([1], dtype=np.uint64)) == b"\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**62), max_size=400))
def test_ids_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(decode_ids(encode_ids(arr)), arr)


def test_ids_edge_shapes():
    # singleton, dense run, gaps > 2^28 forcing 5-byte varints (FIXTURES §4)
    for ids in ([7], list(range(1000)), [0, 2**28 + 1, 2**29, 2**60]):
        arr = np.array(ids, dtype=np.uint64)
        assert np.array_equal(decode_ids(encode_ids(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sets(st.integers(min_value=0, max_value=100000), min_size=1, max_size=50), max_size=30))
def test_positions_roundtrip(pos_sets):
    pos_lists = [np.array(sorted(s), dtype=np.uint64) for s in pos_sets]
    tfs = np.array([len(p) for p in pos_lists], dtype=np.int64)
    out = decode_positions(encode_positions(pos_lists), tfs)
    assert len(out) == len(pos_lists)
    for a, b in zip(out, pos_lists):
        assert np.array_equal(a, b)


def test_delta_roundtrip():
    arr = np.array([5, 6, 100, 2**40], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_xxhash64_matches_jvm(spark):
    """The pure-Python XXH64 twin must be byte-compatible with Spark's
    xxhash64 (seed 42, UTF-8 bytes) — the query planner computes term
    buckets driver-side with it."""
    import random
    import string

    from pyspark.sql import functions as F

    from lsearch_spark.codec import xxhash64

    rng = random.Random(7)
    cases = ["", "a", "the", "É", "中文", "x" * 7, "y" * 8, "z" * 31, "w" * 32, "v" * 33]
    cases += ["".join(rng.choices(string.printable, k=rng.randint(0, 80))) for _ in range(120)]
    cases += ["é中" * rng.randint(1, 20) for _ in range(10)]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h"), F.pmod(F.xxhash64("s"), F.lit(8)).alias("b")).collect()
    for r in rows:
        assert xxhash64(r["s"]) == r["h"], r["s"]
        assert xxhash64(r["s"]) % 8 == r["b"], r["s"]
