"""Large-scale text deduplication operators (north-star extension beyond
the reference surface — BASELINE.json: dedup for training-data pipelines).

Four legs, all pure DataFrame ops designed for the 100 TB shape:

- exact:        hash-groupBy on md5(text) (see plans/dedup_queries.py d2)
- MinHash+LSH:  shingle → k min-hashes → banded signatures → bucket
                self-join → exact-Jaccard verify. Candidate generation is
                the banded join (near-linear); the quadratic verify runs
                only on bucket collisions.
- SimHash:      per-token hash bit-votes → compact fingerprint; hamming
                pairs via fingerprint self-join.
- n-gram Jaccard: pairs sharing ≥1 shingle (inverted-index join) →
                exact Jaccard. No LSH; exact but heavier — the verify
                stage of MinHash standalone.

Determinism/parity: token hashes come from md5 hex (first 8 hex chars →
bigint), reproducible across engines and runs — NOT Spark's murmur
`hash()`, which DuckDB can't mirror. All Jaccards are ratios of ints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash32(c: Column, seed: int | None = None) -> Column:
    """Portable 32-bit hash: first 8 hex chars of md5 as bigint.
    DuckDB twin: CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)."""
    x = F.concat(F.lit(f"{seed}:"), c) if seed is not None else c
    return F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("bigint")


def shingle_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document. One narrow explode —
    linear in corpus size, no shuffle until the consumer aggregates."""
    words = F.split(F.lower(F.col(text_col)), "\\s+")
    nw = F.size(words)
    idx = F.when(nw >= n, F.sequence(F.lit(1), nw - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.concat_ws(
        " ", *[F.element_at(F.col("__w"), F.col("i") + j) for j in range(n)]
    )
    return (
        docs.select(id_col, F.explode(idx).alias("i"), words.alias("__w"))
        .select(id_col, gram.alias("shingle"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = 8) -> DataFrame:
    """k min-hashes per doc in ONE groupBy (k md5s per shingle, single
    shuffle on doc id — the scalable shape; no per-seed re-explosion)."""
    return shingles.groupBy(id_col).agg(
        *[
            F.min(hash32(F.col("shingle"), seed=i)).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )


def lsh_band_signatures(minhashes: DataFrame, id_col: str = "doc_id",
                        rows_per_band: int = 2, num_hashes: int = 8) -> DataFrame:
    """Banded LSH signatures: md5 over each band's minhash tuple.
    Docs agreeing on ANY band become candidates."""
    num_bands = num_hashes // rows_per_band
    bands = []
    for b in range(num_bands):
        cols = [
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        bands.append(
            minhashes.select(
                id_col,
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws(",", *cols)).alias("sig"),
            )
        )
    out = bands[0]
    for df in bands[1:]:
        out = out.unionByName(df)
    return out


def lsh_candidate_pairs(band_sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Self-join on (band_id, sig): the candidate pairs. The join key is a
    128-bit signature → uniform, no skew; output is near-linear for
    non-pathological corpora."""
    a = band_sigs.select(
        F.col(id_col).alias("doc_a"), "band_id", "sig"
    )
    b = band_sigs.select(
        F.col(id_col).alias("doc_b"), "band_id", "sig"
    )
    return (
        a.join(b, ["band_id", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(candidates: DataFrame, shingles: DataFrame,
                   id_col: str = "doc_id", threshold: float = 0.6) -> DataFrame:
    """Exact Jaccard over candidate pairs via the shingle inverted index.
    |A∩B| from a shingle-equality join, |A∪B| = |A|+|B|-|A∩B| — integer
    arithmetic, engine-reproducible."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = shingles.select(F.col(id_col).alias("doc_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", threshold: float = 0.6) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: (doc_a, doc_b, jaccard)."""
    sh = shingle_docs(docs, id_col, text_col)
    mh = minhash_signatures(sh, id_col)
    cand = lsh_candidate_pairs(lsh_band_signatures(mh, id_col), id_col)
    return jaccard_verify(cand, sh, id_col, threshold)


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash: tokens vote ±1 per bit of their 32-bit hash; positive-sum
    bits set the fingerprint bit. One explode + one groupBy."""
    tok = docs.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), "\\s+")).alias("w")
    ).withColumn("h", hash32(F.col("w")))
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return votes.select(id_col, fp.cast("bigint").alias("simhash"))
