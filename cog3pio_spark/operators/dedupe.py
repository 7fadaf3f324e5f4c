"""Deduplication operators for training-data pipelines (task brief).

* exact_dedupe       — hash-groupBy on normalized content (keeps min doc_id);
                       one shuffle on the 64-bit hash, never on raw text.
* minhash_lsh_dupes  — shingle → minhash signature → banded LSH buckets →
                       within-bucket candidate pairs → exact Jaccard verify.
                       Scale shape: the only shuffle is groupBy(band, bucket);
                       bucket sizes are bounded by construction (hot buckets
                       = real near-dup clusters, which is the signal itself).
* simhash_dupes      — 64-bit simhash over token hashes; Hamming-ball
                       candidate pairing via 4-segment pigeonhole blocking.
* ngram_jaccard      — exact n-gram Jaccard for a (small) candidate pair set.
* embedding_dupes    — cosine near-dup over embedding vectors (see ann.py).

MinHash math is vectorized numpy inside pandas_udfs (Arrow batches);
everything else is built-in column functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# -- exact ------------------------------------------------------------------
def exact_dedupe(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: the smallest id wins.

    Returns (doc_id, n_copies). Hash first so the shuffle key is 8 bytes.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        docs.select(F.col(id_col), F.xxhash64(norm).alias("_h"))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .drop("_h")
    )


# -- shingling / minhash ------------------------------------------------------
def _poly_hash_windows(b: np.ndarray, n: int) -> np.ndarray:
    """Deterministic rolling polynomial hash of every length-n byte window.

    Never uses Python's salted ``hash()`` — results are identical across
    executors and sessions (checkpoint/resume + golden determinism).
    """
    win = np.lib.stride_tricks.sliding_window_view(b, n).astype(np.uint64)
    mult = np.power(np.uint64(1000003), np.arange(n, dtype=np.uint64))
    with np.errstate(over="ignore"):
        return (win * mult).sum(axis=1)


def _shingle_hashes(texts: pd.Series, n: int) -> list[np.ndarray]:
    out = []
    for t in texts:
        s = " ".join(str(t or "").lower().split())
        b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < n:
            b = np.pad(b, (0, n - len(b)), constant_values=32)
        out.append(np.unique(_poly_hash_windows(b, n)))
    return out


def minhash_signature(text: F.Column, num_hashes: int = 64, shingle: int = 5) -> F.Column:
    """ARRAY<BIGINT> minhash signature (numpy-vectorized, Arrow-batched)."""
    # universal hashing: h_i(x) = (a_i * x + b_i) mod p, fixed seed
    rng = np.random.RandomState(1234)
    P = np.uint64((1 << 61) - 1)
    A = rng.randint(1, 1 << 31, size=num_hashes).astype(np.uint64)
    B = rng.randint(0, 1 << 31, size=num_hashes).astype(np.uint64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        sigs = []
        for sh in _shingle_hashes(texts, shingle):
            with np.errstate(over="ignore"):
                hv = (sh[:, None] * A[None, :] + B[None, :]) % P
            sigs.append(hv.min(axis=0).astype(np.int64))
        return pd.Series(sigs)

    return _sig(text)


def minhash_lsh_dupes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with estimated Jaccard ≥ threshold.

    banding: 16 bands × 4 rows catches J≈0.8 pairs w.h.p. Candidate pairs
    come only from shared (band, bucket) — never an all-pairs product. The
    estimated Jaccard (signature agreement rate) gates the final output.
    """
    rows = num_hashes // bands
    sig = docs.select(
        F.col(id_col), minhash_signature(F.col(text_col), num_hashes, shingle).alias("sig")
    )
    banded = sig.select(
        id_col,
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice("sig", b * rows + 1, rows).cast("string")),
            )
        ).alias("band", "bucket"),
    )
    # Single-pass candidate generation: group each (band, bucket) and expand
    # pairs inside the member array — a banded SELF-join would recompute the
    # signature stage for both sides (no exchange reuse) and shuffle twice;
    # this shape shuffles once and bucket sizes are bounded by construction
    # (a hot bucket IS a near-dup cluster, which is the signal itself).
    members = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("id"), "sig")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    pair_expr = F.flatten(
        F.transform(
            "ms",
            lambda x, i: F.transform(
                F.slice("ms", i + 2, F.size("ms")),
                lambda y: F.when(x["id"] < y["id"], F.struct(x.alias("l"), y.alias("r")))
                .otherwise(F.struct(y.alias("l"), x.alias("r"))),
            ),
        )
    )
    pairs = (
        members.select(F.explode(pair_expr).alias("p"))
        .select(
            F.col("p.l.id").alias("id_a"),
            F.col("p.r.id").alias("id_b"),
            F.col("p.l.sig").alias("sig_a"),
            F.col("p.r.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = pairs.withColumn(
        "jaccard_est",
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x))
        / F.lit(float(num_hashes)),
    )
    return est.filter(F.col("jaccard_est") >= jaccard_threshold).select(
        "id_a", "id_b", F.round("jaccard_est", 6).alias("jaccard_est")
    )


# -- simhash ------------------------------------------------------------------
def simhash64(text: F.Column, shingle: int = 4) -> F.Column:
    """64-bit simhash over char-shingle hashes (vectorized numpy bit-vote).

    Deterministic: built on the same rolling polynomial hash as minhash.
    """
    pow2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    @pandas_udf(T.LongType())
    def _sim(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, sh in enumerate(_shingle_hashes(texts, shingle)):
            bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = (pow2[votes > 0].sum()).astype(np.uint64).view(np.int64)
        return pd.Series(out)

    return _sim(text)


def simhash_dupes(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Pairs with simhash Hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the 64-bit hash into 4 × 16-bit segments; any
    pair within distance 3 shares ≥ 1 exact segment ⇒ candidates come from
    equi-joins on (segment_idx, segment_value) — shuffle on 8-byte keys only.
    """
    sh = docs.select(F.col(id_col), simhash64(F.col(text_col)).alias("sh"))
    seg = sh.select(
        id_col,
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("seg_idx", "seg_val"),
    )
    cand = (
        seg.alias("l")
        .join(
            seg.alias("r"),
            (F.col("l.seg_idx") == F.col("r.seg_idx"))
            & (F.col("l.seg_val") == F.col("r.seg_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
    return ham.filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


# -- exact n-gram jaccard -----------------------------------------------------
def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard over candidate pairs sharing ≥1 n-gram.

    Inverted-index join: doc → distinct n-gram hashes → self-join on hash
    gives co-occurrence counts |A∩B|; |A∪B| = |A|+|B|-|A∩B|. All equi-joins
    and aggs — fully SQL-expressible (oracle in __spark_entry__).
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(words, i + 1, n))
                    ),
                )
            )
        ).alias("gram"),
    ).filter(F.size(words) >= n)
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    co = (
        grams.alias("l")
        .join(grams.alias("r"), "gram")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    out = (
        co.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_grams", "na"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out
