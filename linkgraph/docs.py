"""Document-corpus operators — the training-data-pipeline side of the
engine (deduplication, text quality, fingerprinting) over a
``documents(doc_id, text, lang, source, n_chars)`` table.

Everything in the gate path is built-in Spark SQL expressions (JVM-side,
whole-stage-codegen); the near-dup operators use xxhash64 (JVM built-in)
for shingle hashing — no Python in any hot path.

Scale notes: exact dedup is one hash-aggregate on the full text (at 100 TB
one would group on sha2(text) first to shrink shuffle rows — provided as
``exact_dedup(by_hash=True)``). MinHash/LSH is the scale path for
near-dup: shingle → k minhashes → b bands → bucket join; candidate pairs
are verified with exact Jaccard only within buckets, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "of", "and", "a", "to", "in", "is", "it", "that", "for")

_TOKENIZE = "split(lower(trim(text)), '\\\\s+')"


def exact_dedup(documents: DataFrame, by_hash: bool = False) -> DataFrame:
    """One row per distinct text: (doc_id = min id of the group, n = group
    size). ``by_hash`` groups on sha2(text) instead of the full text —
    same result (modulo sha2 collisions), far smaller shuffle rows at
    100 TB scale."""
    key = F.sha2(F.col("text"), 256) if by_hash else F.col("text")
    return (
        documents.groupBy(key.alias("k"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n"))
        .select("doc_id", "n")
    )


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-document text-quality metrics, all JVM-side expressions:
    token count (whitespace), char count, mean token length, stopword
    ratio — the standard quality-scoring features."""
    toks = F.expr(_TOKENIZE)
    n_toks = F.size(toks)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(f"size(filter({_TOKENIZE}, t -> t IN ({stop_list})))")
    tok_chars = F.expr(
        f"aggregate(transform({_TOKENIZE}, t -> length(t)), 0, (a, x) -> a + x)"
    )
    return documents.select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            tok_chars / F.nullif(n_toks.cast("double"), F.lit(0.0)), 6
        ).alias("mean_token_len"),
        F.round(n_stop / F.nullif(n_toks.cast("double"), F.lit(0.0)), 6).alias(
            "stopword_ratio"
        ),
    )


def shingles(documents: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, shingle) — k-gram token shingles, deduped per doc."""
    return (
        documents.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, greatest(size({_TOKENIZE}) - {k}, 0)), "
                    f"i -> array_join(slice({_TOKENIZE}, i + 1, {k}), ' '))"
                )
            ).alias("shingle"),
        )
        .dropDuplicates(["doc_id", "shingle"])
    )


def minhash_signatures(documents: DataFrame, num_hashes: int = 32, k: int = 5) -> DataFrame:
    """(doc_id, sig: array<long>) — per-doc minhash signature.

    h_i(s) = xxhash64(shingle, seed=i); sig[i] = min over the doc's
    shingles. One explode + one groupBy — the signature aggregate is
    ``array(min(h_0), ..., min(h_{n-1}))``, all map-side combinable.
    """
    sh = shingles(documents, k=k)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_candidate_pairs(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
) -> DataFrame:
    """LSH near-dup candidates: (doc_a, doc_b, est_jaccard), doc_a < doc_b.

    Signatures are split into ``bands`` bands of num_hashes/bands rows;
    docs sharing any band land in a bucket; bucket self-join emits pairs.
    est_jaccard = fraction of matching signature positions. The bucket
    join is the only shuffle over pairs — never an all-pairs product.
    """
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes ({num_hashes}) — "
            f"otherwise trailing hashes are silently ignored (or, with "
            f"bands > num_hashes, every doc lands in ONE bucket and the "
            f"bucket join degenerates to an all-pairs product)"
        )
    rows = num_hashes // bands
    sig = minhash_signatures(documents, num_hashes=num_hashes, k=k)
    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col("sig")[b * rows + r] for r in range(rows)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(
        F.col("band"), F.col("bucket"), F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")
    )
    b = banded.select(
        F.col("band"), F.col("bucket"), F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        "0, (acc, v) -> acc + v)"
    ) / F.lit(float(num_hashes))
    return pairs.select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))


def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash: long) — 64-bit SimHash over whitespace tokens.

    Per token, xxhash64 gives 64 bits; each bit votes +1/-1 weighted by
    term frequency; the sign vector is the fingerprint. Expressed as one
    explode + groupBy with per-bit conditional sums (JVM expressions)."""
    toks = documents.select(
        "doc_id", F.explode(F.expr(_TOKENIZE)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.expr(f"shiftright(h, {i}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    bit_terms = [
        F.when(
            F.col(f"b{i}") > 0, F.expr(f"shiftleft(CAST(1 AS BIGINT), {i})")
        ).otherwise(F.lit(0).cast("long"))
        for i in range(bits)
    ]
    fingerprint = bit_terms[0]
    for t in bit_terms[1:]:
        fingerprint = fingerprint.bitwiseOR(t)
    return agg.select("doc_id", fingerprint.alias("simhash"))


def ngram_jaccard_pairs(
    documents: DataFrame, k: int = 5, min_jaccard: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard over shingle sets, restricted to pairs sharing
    ≥1 shingle (inverted-index join — no all-pairs product):
    (doc_a, doc_b, jaccard), doc_a < doc_b, jaccard ≥ min_jaccard."""
    sh = shingles(documents, k=k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("shingle"), F.col("doc_id").alias("doc_a"))
    b = sh.select(F.col("shingle"), F.col("doc_id").alias("doc_b"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# --------------------------------------------------------------- language id
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un", "es", "por"),
}


def language_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_guess, lang_score) — stopword-marker language ID.

    Pure JVM expressions: per language, count marker-token hits in the
    whitespace-tokenized text; guess = argmax hit count, ties broken by
    declaration order in _LANG_MARKERS (so zero-hit documents get the
    first language, "en"); score = hits/tokens. A heuristic, not a model —
    the deterministic n-gram approach the engine contract asks for; swap
    in a real classifier as a pandas UDF behind the same schema.
    """
    tok_expr = f"split(lower(trim({text_col})), '\\\\s+')"
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            F.expr(f"size(filter({tok_expr}, t -> t IN ({lst})))").alias(f"_s_{lang}")
        )
    n_toks = F.expr(f"size({tok_expr})")
    scored = documents.select("doc_id", n_toks.alias("_n"), *scores)
    # struct comparison is field-by-field: (hits, -declaration_index) makes
    # array_max prefer higher hits, then EARLIER language on ties
    pairs = F.array(
        *[
            F.struct(
                F.col(f"_s_{lang}").alias("hits"),
                F.lit(-i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(_LANG_MARKERS)
        ]
    )
    best = F.array_max(pairs)
    return scored.select(
        "doc_id",
        best["lang"].alias("lang_guess"),
        F.round(
            best["hits"] / F.nullif(F.col("_n").cast("double"), F.lit(0.0)), 6
        ).alias("lang_score"),
    )
