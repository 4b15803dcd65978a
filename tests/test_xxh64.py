"""Bit-parity of the numpy XXH64 (functions.xxh64) with Spark's
``xxhash64`` expression — the foundation the r10 minhash/simhash kernels
stand on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wine_label_ocr_spark.functions.xxh64 import (spark_xxhash64_str,
                                                  xxh64_int, xxh64_long,
                                                  xxh64_strings)


@pytest.fixture(scope="module")
def sample_strings():
    import random
    rnd = random.Random(3)
    out = ["", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh",
           "0123456789abcdef",  # 16: two 8-byte words
           "0123456789abcdef0123456789abcde",   # 31: longest non-stripe
           "0123456789abcdef0123456789abcdef",  # 32: one stripe
           "x" * 33, "y" * 63, "z" * 64, "w" * 100,
           "unicode éü字 🎉 mixed", "字" * 20]
    alphabet = "abcdefghijklmnop qrstuvwxyz0123456789éü字"
    out += ["".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, 90)))
            for _ in range(200)]
    return out


def test_string_hash_matches_spark(spark, sample_strings):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(sample_strings)],
                               "i int, s string")
    want = {r["i"]: r["h"]
            for r in df.select("i", F.xxhash64("s").alias("h")).collect()}
    got = xxh64_strings(sample_strings).view(np.int64)
    for i in range(len(sample_strings)):
        assert int(got[i]) == want[i], repr(sample_strings[i])


def test_chained_int_literal_matches_spark(spark, sample_strings):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(sample_strings)],
                               "i int, s string")
    for seed in (0, 1, 7, 15):
        want = {r["i"]: r["h"] for r in
                df.select("i", F.xxhash64("s", F.lit(seed)).alias("h"))
                .collect()}
        got = spark_xxhash64_str(sample_strings,
                                 extra_int_seed=seed).view(np.int64)
        for i in range(len(sample_strings)):
            assert int(got[i]) == want[i], (seed, repr(sample_strings[i]))


def test_long_input_matches_spark(spark):
    vals = [0, 1, -1, 42, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i int, v long")
    want = {r["i"]: r["h"]
            for r in df.select("i", F.xxhash64("v").alias("h")).collect()}
    got = xxh64_long(np.array(vals, dtype=np.int64).view(np.uint64),
                     np.uint64(42)).view(np.int64)
    for i, v in enumerate(vals):
        assert int(got[i]) == want[i], v


def test_null_string_skipped_like_spark(spark):
    # xxhash64(NULL, lit(p)) skips the null input → hashInt(p, 42)
    df = spark.createDataFrame([(1,)], "i int")
    for p in (0, 3):
        want = df.select(F.xxhash64(F.lit(None).cast("string"),
                                    F.lit(p)).alias("h")).collect()[0]["h"]
        got = int(np.int64(np.uint64(xxh64_int(p, np.uint64(42)))))
        assert got == want
