"""Spark's built-in soundex vs the from-scratch RE2-safe SQL
implementation (the q185 oracle), fuzzed over random letter strings."""
from __future__ import annotations

import random
import string

import duckdb

from pyspark.sql import functions as F

_SQL = """
WITH w AS (SELECT unnest($words) AS word),
s AS (SELECT word, upper(regexp_replace(word, '[^A-Za-z]', '', 'g')) AS u
      FROM w),
c0 AS (SELECT word, u,
              translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                        '01230129022455012623019202') AS c FROM s),
c1 AS (SELECT word, u,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    c, '0(9*0)+','0','g'), '1(9*1)+','1','g'), '2(9*2)+','2','g'),
       '3(9*3)+','3','g'), '4(9*4)+','4','g'), '5(9*5)+','5','g'),
       '6(9*6)+','6','g'), '9(9*9)+','9','g') AS c FROM c0)
SELECT word, substr(u, 1, 1) ||
       substr(replace(replace(substr(c, 2), '9', ''), '0', '') || '000',
              1, 3) AS sdx
FROM c1
"""


def _duck(words):
    return dict(duckdb.sql(_SQL, params={"words": words}).fetchall())


def _spark(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    return {r["word"]: r["sdx"]
            for r in df.select("word", F.soundex("word").alias("sdx"))
            .collect()}


def test_classic_vectors(spark):
    words = ["Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
             "Pfister", "Honeyman", "Washington", "Lee", "Gutierrez",
             "Jackson", "Wu", "Czarkowska", "a", "aaa"]
    assert _spark(spark, words) == _duck(words)


def test_random_fuzz(spark):
    rng = random.Random(29)
    words = list({"".join(rng.choice(string.ascii_lowercase)
                          for _ in range(rng.randrange(1, 12)))
                  for _ in range(400)})
    got_s, got_d = _spark(spark, words), _duck(words)
    diff = {w for w in words if got_s[w] != got_d[w]}
    assert not diff, sorted(diff)[:10]
