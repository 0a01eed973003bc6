"""Approximate-nearest-neighbor search over embedding columns.

Three tiers, increasing scale-fitness:

* ``cosine_topk`` — brute force: broadcast the (small) query set, score every
  corpus vector with built-in array lambdas (``zip_with`` + ``aggregate`` —
  JVM-side, no Python), rank per query. Exact baseline; O(n·q·d) but embar-
  rassingly parallel with zero shuffle until the final per-query top-k.
* ``cosine_topk_quantized`` — same plan on integer-quantized components;
  bit-exact across engines, so it carries the DuckDB oracle for the family.
* ``lsh_topk`` — random-hyperplane LSH: sign-bit bucket key per vector,
  candidates = bucket collisions with the query (multi-probe over 1-bit
  flips), exact re-rank on candidates. At 100 TB the bucket join replaces
  the full scan; recall is tunable via n_planes/probes.

Hyperplanes are derived from a seeded RNG at plan-build time and inlined as
literal arrays — every run and every engine sees identical planes.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns via zip_with + aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def as_double(a: Column) -> Column:
    return F.transform(a, lambda v: v.cast("double"))


def quantize(a: Column, scale: int = 1000) -> Column:
    """Integer-quantize an embedding: round(x*scale) per component.

    float32 -> double -> round is deterministic and identical in Spark and
    DuckDB, which makes integer dot products bit-exact cross-engine.
    """
    return F.transform(a, lambda v: F.round(v.cast("double") * scale).cast("long"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for every query vector (brute-force baseline).

    ``queries`` must be small (it is broadcast); the corpus scan is a single
    narrow pass. The only shuffle is the per-query rank, keyed on query_id.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("query_vec")
    )
    scored = (
        corpus.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine_sim",
            F.round(cosine(as_double(F.col(vec_col)), as_double(F.col("query_vec"))), 6),
        )
        .select(query_id_col, id_col, "cosine_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cosine_sim", F.col("rk").alias("rank"))
    )


def cosine_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = 1000,
) -> DataFrame:
    """Top-k by integer-quantized dot product — the oracle-exact variant."""
    q = queries.select(
        F.col(id_col).alias(query_id_col), quantize(F.col(vec_col), scale).alias("query_vec")
    )
    scored = (
        corpus.select(F.col(id_col), quantize(F.col(vec_col), scale).alias("qvec"))
        .join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "dot_q",
            F.aggregate(
                F.zip_with(F.col("qvec"), F.col("query_vec"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        .select(query_id_col, id_col, "dot_q")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("dot_q"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "dot_q", F.col("rk").alias("rank"))
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 1234) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket key: one char per hyperplane ('1' if dot >= 0)."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(w) for w in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 8,
    probes: int = 1,
    seed: int = 1234,
) -> DataFrame:
    """ANN top-k: hyperplane-LSH candidate buckets + exact cosine re-rank.

    ``probes`` > 0 additionally probes buckets at Hamming distance 1 from the
    query's bucket (all 1-bit flips), trading compute for recall. The corpus
    is bucketed once; at scale you would persist/bucketBy the bucketed
    corpus and reuse it across query batches.
    """
    planes = _hyperplanes(n_planes, dim, seed)
    bucketed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(as_double(F.col(vec_col)), planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("query_vec"),
        hyperplane_bucket(as_double(F.col(vec_col)), planes).alias("qbucket"),
    )
    if probes:
        # expand each query to its bucket + all 1-bit-flip buckets
        flips = F.array(
            F.col("qbucket"),
            *[
                F.concat(
                    F.substring(F.col("qbucket"), 1, i),
                    F.when(F.substring(F.col("qbucket"), i + 1, 1) == "1", "0").otherwise("1"),
                    F.substring(F.col("qbucket"), i + 2, n_planes - i - 1),
                )
                for i in range(n_planes)
            ],
        )
        qb = qb.withColumn("bucket", F.explode(flips)).drop("qbucket")
    else:
        qb = qb.withColumnRenamed("qbucket", "bucket")
    cands = bucketed.join(F.broadcast(qb), "bucket").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cands.withColumn(
        "cosine_sim",
        F.round(cosine(as_double(F.col(vec_col)), as_double(F.col("query_vec"))), 6),
    ).select(query_id_col, id_col, "cosine_sim").distinct()
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cosine_sim", F.col("rk").alias("rank"))
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    sample_size: int = 512,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[list[float]]:
    """Train IVF coarse centroids on a deterministic corpus sample.

    Standard IVF practice: centroids are fit on a small sample (k-means on
    the driver — the sample is tiny by construction), while the expensive
    parts — cell assignment and probing — run distributed. The sample is
    the ``sample_size`` rows with smallest ``xxhash64(id, seed)``: stable
    across runs and partitionings, no RNG on the executors.
    """
    sample = (
        corpus.select(F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(sample_size)
        .collect()
    )
    import numpy as np

    x = np.array([list(map(float, r[0])) for r in sample])
    rng = np.random.RandomState(seed)
    centroids = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return [[round(float(v), 6) for v in c] for c in centroids]


def nearest_cells_pandas(centroids: list[list[float]], n: int = 1):
    """Arrow-batched nearest-cell kernel: one numpy matmul per batch.

    The expression form (:func:`nearest_cells`) evaluates
    ``cells × dim`` multiply-adds per row through interpreted higher-order
    lambdas; for dense numeric scoring the Pandas UDF path is the fast one —
    the whole Arrow batch hits BLAS as ``X @ C.T``. Returns a pandas UDF
    mapping an ``array<float/double>`` column to the top-``n`` cell indices.
    """
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64).T  # dim × cells

    @pandas_udf("array<int>")
    def kernel(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy())  # rows × dim
        scores = x @ c  # rows × cells
        top = np.argsort(-scores, axis=1, kind="stable")[:, :n]
        return pd.Series(list(top.astype("int32")))

    return kernel


def nearest_cells(vec: Column, centroids: list[list[float]], n: int = 1) -> Column:
    """Array of the ``n`` nearest centroid indices by dot product (vectors
    near-normalized -> dot order ~ cosine order). Pure built-in expressions:
    centroids inline as literals, scored per row, ranked via array sort."""
    scored = F.array(
        *[
            F.struct(
                dot(vec, F.array(*[F.lit(w) for w in c])).alias("score"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    ranked = F.reverse(F.array_sort(scored))
    return F.transform(F.slice(ranked, 1, n), lambda s: s["cell"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN top-k: assign corpus to coarse cells once, probe the query's
    ``n_probe`` nearest cells, exact cosine re-rank on the candidates.

    Cell assignment is a narrow projection through the Arrow/numpy kernel
    (``nearest_cells_pandas`` — dense scoring is the one place the Pandas
    UDF path beats built-ins); the probe is an equi-join on cell id. At
    100 TB the assigned corpus is written once partitioned by cell
    (``partitionBy("cell")``) and every query batch scans only its probed
    cells (partition pruning).
    """
    assign1 = nearest_cells_pandas(centroids, 1)
    assignp = nearest_cells_pandas(centroids, n_probe)
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        assign1(F.col(vec_col))[0].alias("cell"),
    )
    qcells = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("query_vec"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    cands = assigned.join(F.broadcast(qcells), "cell").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = (
        cands.withColumn(
            "cosine_sim",
            F.round(cosine(as_double(F.col(vec_col)), as_double(F.col("query_vec"))), 6),
        )
        .select(query_id_col, id_col, "cosine_sim")
        .distinct()
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cosine_sim", F.col("rk").alias("rank"))
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    seed: int = 99,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH self-join + exact verify.

    Pairs whose cosine >= threshold almost surely share a sign-bit bucket
    (for high thresholds); the bucket self-join keeps the candidate set
    near-linear. Returns (id_a, id_b, cosine_sim).
    """
    planes = _hyperplanes(n_planes, dim, seed)
    bucketed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(as_double(F.col(vec_col)), planes).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "cosine_sim",
            F.round(
                cosine(as_double(F.col(f"a.{vec_col}")), as_double(F.col(f"b.{vec_col}"))), 6
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine_sim",
        )
    )
