"""Text-analysis operators for LLM training-data pipelines.

Everything here is built from ``pyspark.sql.functions`` built-ins — split /
higher-order array lambdas / regex — so the hot path stays inside
WholeStageCodegen with zero Python row transfer. At 100 TB each operator is a
single projection (no shuffle): it scales linearly with input splits.

Operators: token counting, quality scoring (length/punct/stopword ratios),
n-gram heuristic language ID, and rolling-hash document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Function-word marker sets per language for the n-gram/stopword heuristic
# language ID. Deterministic and tiny on purpose: the operator's contract is
# "same text -> same label", not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "ein", "eine", "mit"],
}

# English stopwords for the quality-score ratio.
STOPWORDS = ["the", "a", "an", "of", "and", "or", "to", "in", "is", "it", "for", "on"]


def tokens(c: Column) -> Column:
    """Whitespace tokenization (single-space; wire format is space-joined)."""
    return F.split(c, " ")


def token_count(c: Column) -> Column:
    """Number of whitespace tokens."""
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token count: words + digit runs + punctuation marks.

    A cheap stand-in for a BPE tokenizer budget estimate: counts maximal
    letter runs, digit runs, and individual punctuation characters.
    """
    pieces = F.split(F.trim(c), r"\s+")
    per_word = F.transform(
        pieces,
        lambda w: F.size(
            F.filter(
                F.split(F.regexp_replace(w, r"([a-zA-Z]+|\d+|[^a-zA-Z\d])", "$1\x00"), "\x00"),
                lambda p: p != "",
            )
        ),
    )
    return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)


def stable_hash64(c: Column) -> Column:
    """Deterministic cross-engine 60-bit hash: first 15 hex chars of md5.

    DuckDB dual: ``('0x' || substring(md5(x), 1, 15))::bigint`` — used by
    every oracle-checked hashing operator (fingerprints, exact dedup buckets)
    so Spark and the oracle agree bit-for-bit. For rows-only operators the
    faster JVM-native ``xxhash64`` is preferred.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def shingles(c: Column, n: int = 3) -> Column:
    """Word n-gram shingle strings from a text column (empty-safe).

    Two equivalent implementations, chosen per row:

    * FAST (the corpus path): for single-spaced text — no leading/trailing/
      double spaces, no non-space whitespace — overlapping n-grams come from
      ONE codegen'd ``regexp_extract_all`` pass using a zero-width
      lookahead anchored at each token start (``(?<= )(?=(tok{n}))``).
      Higher-order array lambdas run interpreted (~10x tax, NOTES.md); this
      moves the shingle build inside WholeStageCodegen and cut the sf0.1
      MinHash signature stage 1.95s -> 0.85s (2.3x) with a bit-identical
      result.
    * SLOW (sloppy text): the HOF slice+join over the documented
      single-space tokenization, preserving exact semantics for inputs
      where space-runs produce empty tokens (``tokens()``'s wire-format
      contract, mirrored by the DuckDB duals' ``string_split(text, ' ')``).

    The ``CASE WHEN`` evaluates lazily per row, so corpus rows never pay
    the interpreted branch.
    """
    toks = tokens(c)
    sloppy = c.rlike(r"(^ )|( $)|(  )|[^\S ]")
    fast = F.regexp_extract_all(
        F.concat(F.lit(" "), c),
        F.lit(r"(?<= )(?=((?:\S+ ){%d}\S+))" % (n - 1)),
        1,
    )
    slow = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) < n, F.array(c)).otherwise(
        F.when(sloppy, slow).otherwise(fast)
    )


def rolling_fingerprint(c: Column, n: int = 3) -> Column:
    """Document fingerprint: min rolling-shingle hash (MinHash with k=1).

    Near-identical documents (small edits) collide with high probability on
    at least one shingle, and identical documents always produce the same
    fingerprint. Cross-engine deterministic via ``stable_hash64``.
    """
    return F.array_min(F.transform(shingles(c, n), stable_hash64))


def punct_ratio(c: Column) -> Column:
    """Fraction of characters that are punctuation."""
    n_punct = F.length(F.regexp_replace(c, r"[^.!?,;:'\"()\[\]{}-]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def _word_count_pattern(words: list[str]) -> str:
    """Regex counting tokens equal to any of ``words`` in space-separated
    text: zero-width boundaries keep adjacent matches countable, and the
    alternation + lookahead backtracks correctly for prefix pairs (a/an).
    Exactly equivalent to filtering ``split(text, ' ')`` for membership as
    long as the text's only whitespace is the space character."""
    return r"(?:^|(?<= ))(?:" + "|".join(words) + r")(?= |$)"


def stopword_ratio(c: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords.

    Counted with one JVM ``regexp_count`` pass rather than a per-token
    higher-order filter: HOF lambdas run interpreted (outside codegen), a
    10×-ish tax on the hottest text operator at corpus scale.
    """
    n_sw = F.regexp_count(F.lower(c), F.lit(_word_count_pattern(stopwords or STOPWORDS)))
    n_toks = token_count(c)
    return F.when(n_toks > 0, n_sw / n_toks).otherwise(F.lit(0.0))


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic for training-data filtering.

    Rewards moderate length and word size, penalizes punctuation soup and
    stopword-free keyword stuffing — the standard cheap pre-filter before
    model-based scoring. Weights are fixed so scores are reproducible.
    """
    n_chars = F.length(c)
    n_toks = token_count(c)
    avg_word = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    len_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_term = F.when((avg_word >= 3) & (avg_word <= 10), 1.0).otherwise(0.5)
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 5, F.lit(1.0))
    sw = stopword_ratio(c)
    sw_term = F.when((sw >= 0.1) & (sw <= 0.6), 1.0).otherwise(0.6)
    return F.round(
        0.3 * len_term + 0.2 * word_term + 0.2 * punct_term + 0.3 * sw_term, 4
    )


def lang_scores(c: Column) -> dict[str, Column]:
    """Marker-hit count per candidate language (one regexp pass each)."""
    lowered = F.lower(c)
    return {
        lang: F.regexp_count(lowered, F.lit(_word_count_pattern(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(c: Column) -> Column:
    """Heuristic language ID: argmax marker-hit count, 'und' when all zero.

    Ties break by the fixed language order en > es > fr > de (greatest-so-far
    scan), making the label deterministic and oracle-expressible.
    """
    scores = lang_scores(c)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in LANG_MARKERS:  # insertion order = priority order
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def normalize_text(c: Column) -> Column:
    """Canonical form for content comparison: casefold, strip punctuation,
    collapse whitespace, trim.

    The standard pre-pass before exact/near dedup — "Hello,  World!" and
    "hello world" hash identically afterwards. Pure codegen projection
    (lower + two regex passes); engine-portable semantics so the DuckDB
    oracle applies the identical pipeline.
    """
    lowered = F.lower(c)
    no_punct = F.regexp_replace(lowered, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(no_punct, r"\s+", " "))


def make_sentence_splitter_udtf():
    """Python UDTF (Spark 4): explode text into (sentence, n_words) rows.

    The UDTF extension point is the engine's answer for table-generating
    logic too irregular for ``explode``+builtins — here a deliberately
    simple sentence splitter so the DuckDB oracle can mirror it exactly.
    ``useArrow=True`` moves the JVM<->Python transfer onto Arrow batches
    (``ArrowEvalPythonUDTF`` in the plan) instead of per-row pickling —
    the same ~10-100x serialization win the Pandas UDF path gets; the
    ``eval``-per-row API is unchanged. Anything expressible with array
    builtins should still stay JVM-side instead (SURVEY §2.10).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence: string, n_words: int", useArrow=True)
    class SentenceSplitter:
        def eval(self, text: str):
            if text is None:
                return
            for s in text.replace("!", ".").replace("?", ".").split("."):
                s = s.strip()
                if s:
                    yield s, len(s.split())

    return SentenceSplitter


# --- PII redaction + repetition metrics (round 5) ---------------------------

# Patterns deliberately restricted to syntax shared by Java regex (Spark)
# and RE2 (DuckDB): char classes, \d, bounded repetition — no backrefs or
# lookbehind, so both engines see identical semantics.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}",
    "ssn": r"\d{3}-\d{2}-\d{4}",
}


def pii_counts(c: Column) -> dict[str, Column]:
    """Match count per PII class (one JVM regexp pass each)."""
    return {kind: F.regexp_count(c, F.lit(pat)) for kind, pat in PII_PATTERNS.items()}


def redact_pii(c: Column) -> Column:
    """Replace each PII class with a typed placeholder token.

    Chained codegen ``regexp_replace`` passes — order matters (emails are
    redacted before phones so a phone-like digit run inside an address
    never double-matches); the fixed order keeps output deterministic and
    oracle-expressible.
    """
    out = c
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def duplicate_ngram_fraction(c: Column, n: int = 3) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram —
    the Gopher-style repetition signal (high values mean boilerplate or
    degenerate loops). 0.0 for documents shorter than n words."""
    sh = shingles(c, n)
    total = F.size(sh)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(sh)) / total,
    ).otherwise(F.lit(0.0))


def utf8_byte_stats_arrow(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document byte/char counts through ``mapInArrow`` — the
    zero-copy Arrow-native UDF surface (one step below the pandas layer:
    no Series materialization, ``pyarrow.compute`` kernels straight on
    the RecordBatch buffers). Used here for a deliberately SQL-checkable
    computation (octet/char length) so the Arrow path itself is
    oracle-certified; the same shape is where a real pipeline puts
    tokenizer/codec kernels that consume Arrow buffers natively.

    Narrow projection, no shuffle; batch size follows
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            text = tbl.column(text_col)
            yield pa.RecordBatch.from_arrays(
                [
                    tbl.column(id_col).combine_chunks(),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()).combine_chunks(),
                    pc.cast(pc.utf8_length(text), pa.int64()).combine_chunks(),
                ],
                names=[id_col, "n_bytes", "n_chars_utf8"],
            )

    return df.select(id_col, text_col).mapInArrow(
        kernel, schema=f"{id_col} long, n_bytes long, n_chars_utf8 long"
    )


def winnowing_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    salt: str = "winnow",
):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS local-fingerprinting algorithm): hash every k-token
    shingle, slide a w-position window over the hash sequence, and keep
    each window's MINIMUM hash. The selection guarantee is the point:
    any shared run of >= w + k - 1 tokens between two documents shares
    at least one selected fingerprint — detection of long verbatim
    overlap without comparing full texts, at a ~2/(w+1) sampling rate.

    Fully relational: posexplode of the k-gram hashes, one per-document
    sliding-min window (rowsBetween 0..w-1), distinct. Hashes are the
    repo's md5-derived ``uniform_hash``, so the fingerprint sets — and
    any join built on them — carry an exact cross-engine dual. One
    shuffle on the document key; rows ~ tokens per doc.

    Returns (id_col, fingerprint) distinct rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .sampling import uniform_hash

    grams = F.expr(
        f"transform(slice(split({text_col}, ' '), 1,"
        f" greatest(size(split({text_col}, ' ')) - {k - 1}, 0)),"
        f" (x, i) -> array_join(slice(split({text_col}, ' '), i + 1, {k}), ' '))"
    )
    pos = df.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    ).select(
        id_col, "pos", uniform_hash(F.col("gram"), salt).alias("h")
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        pos.withColumn("n_pos", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
        .withColumn("fp", F.min("h").over(win))
        # windows that would extend past the last position are suffixes of
        # the final full window — dropping them keeps the guarantee and the
        # DuckDB dual identical (its ROWS frame would silently shrink)
        .filter(F.col("pos") <= F.col("n_pos") - w)
        .select(id_col, F.col("fp").alias("fingerprint"))
        .distinct()
    )
