"""Deduplication operators for LLM training-data pipelines.

Four families, all expressed with DataFrame built-ins (no Python UDFs):

* **Exact**: content-hash groupBy. One shuffle on the hash — at 100 TB the
  shuffle carries only (hash, id), never the document bytes.
* **MinHash + LSH**: shingle -> k-minhash signature -> banded bucket join.
  Candidate generation is an equi-join on (band, band_hash) — a plain hash
  shuffle Catalyst/AQE handles — followed by exact Jaccard verification on
  the candidates only. Cost is O(candidates), not O(n²).
* **SimHash**: 64-bit bitstring signature; pigeonhole chunk join bounds the
  candidate set for small Hamming radii.
* **N-gram Jaccard**: the exact verifier, usable standalone on any pair set.

Reference has only full-row ``dropDuplicates()`` (SURVEY.md §2.4 A6); these
are the north-star extensions (BASELINE.json) built on the same shuffle
machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import shingles, stable_hash64

# --- exact dedup ------------------------------------------------------------


def content_key(c: Column) -> Column:
    """Deterministic content hash (md5 hex) of a text/binary column."""
    return F.md5(c)


def exact_dedup_summary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct content: kept id (min), duplicate count."""
    return (
        df.select(F.col(id_col), content_key(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("copy_count"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly the min-id row per distinct content (stable winner).

    Implemented as groupBy + semi-join rather than a window so the heavy
    payload columns never enter the shuffle: only (hash, id) pairs move.
    """
    winners = exact_dedup_summary(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(winners, id_col, "left_semi")


# --- n-gram Jaccard ---------------------------------------------------------


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (set semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, distinct shingle array) — the input to MinHash and Jaccard."""
    return df.select(
        F.col(id_col), F.array_distinct(shingles(F.col(text_col), n)).alias("shingle_set")
    )


def ngram_jaccard_pairs(
    pairs: DataFrame, left_shingles: str = "shingle_set_a", right_shingles: str = "shingle_set_b"
) -> DataFrame:
    """Score a candidate-pair frame with exact n-gram Jaccard."""
    return pairs.withColumn(
        "jaccard_sim", F.round(jaccard(F.col(left_shingles), F.col(right_shingles)), 4)
    )


# --- MinHash + LSH ----------------------------------------------------------


def minhash_signature(shingle_set: Column, k: int = 32) -> Column:
    """k-permutation MinHash signature as an array<long>.

    Permutation j is simulated by ``xxhash64(shingle, j)`` — JVM-native,
    vectorized, no Python. Empty sets get MAX_LONG sentinels.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.coalesce(
            F.array_min(F.transform(shingle_set, lambda s: F.xxhash64(s, j))),
            F.lit(2**63 - 1),
        ),
    )


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str, k: int = 32, bands: int = 8
) -> DataFrame:
    """Banded LSH: explode signatures into (band, band_hash) buckets and
    self-join. Returns distinct (id_a, id_b) candidate pairs, id_a < id_b.

    The self-join is a plain equi-join on the bucket key: Catalyst plans a
    shuffled hash join; AQE splits skewed buckets (a hot bucket = a common
    band pattern) automatically.
    """
    rows_per_band = k // bands
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bucket"),
    ).select(id_col, "bucket.band", "bucket.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates + exact-Jaccard verify.

    Output: (id_a, id_b, jaccard_sim) for verified near-duplicate pairs.
    """
    sets_ = shingle_sets(df, text_col, id_col, shingle_n)
    sigs = sets_.withColumn("signature", minhash_signature(F.col("shingle_set"), k))
    cands = minhash_lsh_candidates(sigs.select(id_col, "signature"), id_col, k, bands)
    scored = (
        cands.join(
            sets_.select(F.col(id_col).alias("id_a"), F.col("shingle_set").alias("shingle_set_a")),
            "id_a",
        )
        .join(
            sets_.select(F.col(id_col).alias("id_b"), F.col("shingle_set").alias("shingle_set_b")),
            "id_b",
        )
        .withColumn(
            "jaccard_sim",
            F.round(jaccard(F.col("shingle_set_a"), F.col("shingle_set_b")), 4),
        )
    )
    return scored.filter(F.col("jaccard_sim") >= threshold).select(
        "id_a", "id_b", "jaccard_sim"
    )


# --- SimHash ----------------------------------------------------------------


def simhash(df: DataFrame, text_col: str, id_col: str, n_bits: int = 64) -> DataFrame:
    """(id, simhash bitstring): explode tokens, vote per bit, reassemble.

    The explode + groupBy formulation keeps every step in codegen'd
    aggregates: per (doc, bit) the vote is sum(±1), then bits concatenate
    ordered by position. Shuffle key is the doc id — same partitioning any
    downstream per-doc op reuses.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).withColumn("h", F.xxhash64("token"))
    bit_votes = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(n_bits)
    ]
    votes = toks.groupBy(id_col).agg(*bit_votes)
    bits = F.concat(
        *[F.when(F.col(f"b{b}") > 0, "1").otherwise("0") for b in range(n_bits)]
    )
    return votes.select(F.col(id_col), bits.alias("simhash"))


def hamming_bitstring(a: Column, b: Column) -> Column:
    """Hamming distance between equal-length bitstrings."""
    return F.size(
        F.filter(
            F.zip_with(
                F.split(a, ""),
                F.split(b, ""),
                lambda x, y: F.when(x != y, F.lit(1)).otherwise(F.lit(0)),
            ),
            lambda v: v == 1,
        )
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 3,
    n_bits: int = 64,
    n_chunks: int | None = None,
) -> DataFrame:
    """Near-dups by SimHash: pigeonhole chunk join + exact Hamming verify.

    With ``n_chunks > max_distance`` any pair within ``max_distance`` leaves
    at least one chunk untouched, so it must collide on that chunk —
    candidate generation is an equi-join on (chunk_idx, chunk_value). The
    default derives n_chunks = max_distance + 1 to keep that guarantee;
    chunk boundaries absorb the division remainder so all n_bits are
    covered.
    """
    if n_chunks is None:
        n_chunks = min(max_distance + 1, n_bits)
    base_len, rem = divmod(n_bits, n_chunks)
    bounds = []
    start = 1  # substring() is 1-based
    for i in range(n_chunks):
        ln = base_len + (1 if i < rem else 0)
        bounds.append((i, start, ln))
        start += ln
    sigs = simhash(df, text_col, id_col, n_bits)
    chunked = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.substring(F.col("simhash"), s, ln).alias("chunk_val"),
                    )
                    for i, s, ln in bounds
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_idx", "c.chunk_val")
    a = chunked.alias("a")
    b = chunked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", hamming_bitstring(F.col("sim_a"), F.col("sim_b")))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )
