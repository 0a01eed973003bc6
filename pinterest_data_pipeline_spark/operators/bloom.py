"""Bloom-filter build + probe as pure relational algebra — the shuffle
eliminator for selective joins.

At 100 TB the dominant join cost is shuffling the big side; when the
probe-relevant key set is a small fraction of the big side's rows, a
Bloom filter of the small side's keys — broadcast, checked map-side —
drops non-matching rows BEFORE the exchange (the same idea as Spark's
own runtime row-level bloom pruning, `spark.sql.optimizer.runtime.
bloomFilter.enabled`, but engine-portable and inspectable). This
implementation is md5-derived end to end, so the filter and its false
positives are BIT-REPRODUCIBLE in any engine: the DuckDB oracle rebuilds
the identical word table and must agree on every membership verdict.

Shapes:
- build: one explode (k bit positions per key) + one hash aggregate
  whose grouping domain is <= m/32 words — partial aggregation collapses
  map-side, the shuffle carries at most m/32 rows per task.
- probe: the word table (<= m/32 longs, bounded BY CONSTRUCTION) folds
  into ONE nested array literal — the same bounded-collect discipline as
  the IVF/PQ training samples — and membership becomes a pure
  whole-stage-codegen expression: element_at + bitwise AND per hash, no
  join, no shuffle, nothing leaves the map side.

32-bit words (bit value 2^(bit % 32) as a long) keep every word far
inside BIGINT range in any engine — the same signed-overflow reasoning
as ``similarity.sign_pack_words``. 2^(bit%32) is computed via exact
``F.pow(2.0, k)`` (double-exact for exponents <= 31) because
``F.shiftleft`` requires a literal shift count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .litutil import fast_array_literal


def _bit_position(c: Column, j: int, m_bits: int, salt: str) -> Column:
    """Bit index of key ``c`` under hash ``j``: md5-derived, engine-portable.

    DuckDB dual: ``CAST(('0x' || substring(md5(v::VARCHAR || salt || j),
    1, 8)) AS UBIGINT) % m_bits``.
    """
    salted = F.concat(c.cast("string"), F.lit(salt), F.lit(str(j)))
    h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    return (h % m_bits).cast("int")


def _pow2(bit_in_word: Column) -> Column:
    """2^(bit % 32) as a long — exact in double for exponents <= 31."""
    return F.pow(F.lit(2.0), bit_in_word.cast("double")).cast("long")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Build the Bloom word table (word_idx, word) from a key column.

    Output is <= m_bits/32 rows regardless of input size; word is the
    bitwise OR of 2^(bit % 32) over every (key, hash) landing in that
    32-bit word. Filters over disjoint corpora merge by per-word OR.
    NULL keys are not members (md5(NULL) is NULL in both engines, so a
    NULL would otherwise produce a NULL word_idx group); ``m_bits`` must
    be word-aligned or trailing bits would silently vanish.
    """
    if m_bits % 32:
        raise ValueError(f"bloom_build: m_bits {m_bits} not divisible by 32")
    bits = F.explode(
        F.array(
            *[
                _bit_position(F.col(key_col), j, m_bits, salt).alias("bit")
                for j in range(k_hashes)
            ]
        )
    ).alias("bit")
    return (
        keys.filter(F.col(key_col).isNotNull())
        .select(bits)
        .select(
            (F.col("bit") / 32).cast("int").alias("word_idx"),
            _pow2(F.col("bit") % 32).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_words_literal(words: DataFrame, m_bits: int) -> list[int]:
    """Materialize the word table as a dense Python list of m_bits/32 longs.

    ONE bounded action: the word table cannot exceed m_bits/32 rows no
    matter the input, so this collect is constant-size (128 longs at the
    4096-bit default) — the broadcast-variable shape without a join.
    """
    dense = [0] * (m_bits // 32)
    for r in words.collect():
        dense[r["word_idx"]] = r["word"]
    return dense


def bloom_maybe_expr(
    key: Column,
    dense_words: list[int],
    m_bits: int,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> Column:
    """Membership expression: true iff ALL k bits of ``key`` are set.

    Guaranteed superset semantics: every key fed to :func:`bloom_build`
    evaluates true; non-members are true only on an all-k-bit collision
    (rate ~ (1 - e^{-kn/m})^k). Compiles to k md5 hashes + k element_at
    + bitwise ANDs inside whole-stage codegen — a pure map-side filter.
    """
    words_lit = fast_array_literal([int(w) for w in dense_words])
    verdict = F.lit(True)
    for j in range(k_hashes):
        bit = _bit_position(key, j, m_bits, salt)
        word = F.element_at(words_lit, ((bit / 32).cast("int") + F.lit(1)))
        verdict = verdict & (word.bitwiseAND(_pow2(bit % 32)) != 0)
    # NULL keys hash to NULL -> three-valued logic would return NULL;
    # pin the contract to "NULL is not a member" (matches bloom_build,
    # which never inserts NULLs)
    return F.coalesce(verdict, F.lit(False))
