"""Text-analysis operators for training-data pipelines (task brief).

All built-in ``pyspark.sql.functions`` column math — JVM-side, codegen,
no Python boundary. Each has an ANSI-SQL oracle in __spark_entry__.py so the
driver's DuckDB gate checks values, not just shapes.

* token_count      — whitespace tokenization count
* quality_score    — length / punctuation-ratio / stopword-ratio features
* lang_id          — stopword-hit heuristic over a fixed marker table
* fingerprint      — rolling/content hash for exact-dup detection
* pack_sequences   — fixed token-budget pack assembly (hash buckets × FFD)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic marker sets (tiny, language-characteristic function words)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "de"],
}

STOPWORDS = LANG_MARKERS["en"]


def token_count(text: Column) -> Column:
    """Whitespace tokens; empty/blank string → 0; NULL text → NULL.

    The explicit null branch makes the semantics ANSI-config-independent
    (r4 review, verified live: under spark.sql.ansi.enabled=false the old
    when() fell through to size(split(NULL)) = -1 via legacy sizeOfNull —
    a NEGATIVE count flowing into corpus token sums; ANSI-on gave NULL)."""
    t = F.trim(text)
    return (
        F.when(text.isNull(), F.lit(None).cast("int"))
        .when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
    )


# BPE-ish pre-tokenizer pattern (GPT-2 style, simplified to the subset both
# Java regex and DuckDB's RE2 support — no lookahead): common English
# contraction suffixes, space-prefixed letter runs, digit runs, and
# punctuation runs. Whitespace itself is not a token.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column) -> Column:
    """Tokenizer-shaped count: matches of the BPE-ish pre-tokenizer regex
    (task brief: "token counting (whitespace + a BPE-ish regex)"). Pure
    JVM-side regexp_count — codegen, no UDF. NULL text → NULL (r5 review:
    the old coalesce('') returned 0, conflating unknown-length docs with
    empty ones — the exact distinction the pack_sequences nulltokens fix
    preserves for n_tokens)."""
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(
        F.regexp_count(text, F.lit(BPE_PATTERN))
    )


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    """NULL text → NULL (r5 review, verified live: under ANSI-off legacy
    sizeOfNull both sizes are -1, so NULL text returned -1/1 = -1.0 — a
    config-dependent NEGATIVE ratio; ANSI-on gave NULL)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(
        hits / F.greatest(F.size(words), F.lit(1))
    )


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + punctuation + stopwords.

    Deterministic rubric (not a model): docs of reasonable length with
    moderate punctuation and non-zero stopword mass score high.
    """
    n = F.length(text)
    len_score = F.when(n < 10, 0.0).when(n > 20000, 0.3).otherwise(1.0)
    p = punct_ratio(text)
    punct_score = F.when(p > 0.3, 0.2).otherwise(1.0 - p)
    s = stopword_ratio(text)
    stop_score = F.when(s > 0.0, 1.0).otherwise(0.5)
    return F.round((len_score * 0.4 + punct_score * 0.3 + stop_score * 0.3), 6)


def _marker_hits(words: Column, marks: list[str]) -> Column:
    mk = list(marks)
    return F.size(F.filter(words, lambda w: w.isin(*mk)))


def lang_id(text: Column) -> Column:
    """Most-hits language over the marker table; ties → lexicographic;
    NULL text → 'und' (r5 review, verified live: under ANSI-off legacy
    sizeOfNull every marker count is -1, so best==-1 passed the best==0
    guard and the first when() branch fired — NULL text got the
    valid-looking label 'de', config-dependently)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    scores = [
        (lang, _marker_hits(words, marks)) for lang, marks in sorted(LANG_MARKERS.items())
    ]
    best = scores[0][1]
    for _, sc in scores[1:]:
        best = F.greatest(best, sc)
    out = F.lit("und")
    # reverse order so earlier (lexicographic) languages win ties
    for lang, sc in reversed(scores):
        out = F.when(sc == best, F.lit(lang)).otherwise(out)
    return F.when(text.isNull() | (best <= 0), F.lit("und")).otherwise(out)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: sha2 over whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.sha2(norm, 256)


def text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.withColumns(
        {
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_token_count(t),
            "punct_ratio": F.round(punct_ratio(t), 6),
            "stopword_ratio": F.round(stopword_ratio(t), 6),
            "quality": quality_score(t),
            "lang_pred": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )


# -- sequence packing (r4) ----------------------------------------------------
def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 1024,
) -> DataFrame:
    """(<id_col>, n_tokens, pack_id, pack_tokens) — assemble documents into
    packs
    of at most ``max_tokens`` total tokens (LLM-training sequence packing:
    fixed-budget context windows assembled from whole documents).

    Scale shape: docs hash into ``n_buckets`` independent buckets (salted
    xxhash64 of the id — deterministic, layout-independent), and each
    bucket packs locally with first-fit-decreasing inside ONE
    applyInPandas group. Packing is embarrassingly parallel across
    buckets; at 10¹² docs the knob is n_buckets (each bucket holds
    ~corpus/n_buckets rows — size it so a bucket fits an Arrow batch).
    FFD within a bucket wastes at most ~1/4 of the budget on typical doc
    mixes, and cross-bucket waste is bounded by one non-full pack per
    bucket — the price of not shuffling the corpus into a single ordered
    stream.

    Contract: every doc appears in exactly one pack; every pack's
    pack_tokens ≤ max_tokens EXCEPT single-doc packs for oversize docs
    (n_tokens > max_tokens), which come out flagged as their own pack with
    pack_id suffix '-oversize' — the caller decides truncate/split/drop
    (this operator never silently drops). Deterministic for fixed inputs
    (seeded hash buckets; stable (tokens desc, id) order inside a bucket).
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1: {max_tokens}")
    import pandas as pd
    from pyspark.sql import types as T

    # caller's id column keeps its NAME and DTYPE end-to-end (r5 review:
    # the old shape returned a hardcoded string 'id' column — the same
    # query-id preservation defect r4 fixed for pq/ivfpq; the bucket hash
    # still uses the string cast for determinism)
    id_type = docs.schema[id_col].dataType
    sel = docs.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(41)), F.lit(n_buckets))
        .alias("_bucket"),
    )

    schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("pack_id", T.StringType()),
            T.StructField("pack_tokens", T.LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["_bucket"].iloc[0])
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        packs: list[tuple[int, list[int]]] = []  # (remaining, row indices)
        out_pack = [""] * len(pdf)
        oversize = 0
        nulls = 0
        for i, (tok) in enumerate(pdf["n_tokens"]):
            if pd.isna(tok):
                # null token count (null text upstream): own flagged pack —
                # never a silent drop, never a NaN→int crash (r4 review)
                out_pack[i] = f"b{bucket}-n{nulls}-nulltokens"
                nulls += 1
                continue
            t = int(tok)
            if t > max_tokens:
                out_pack[i] = f"b{bucket}-o{oversize}-oversize"
                oversize += 1
                continue
            for p_i, (rem, members) in enumerate(packs):
                if t <= rem:
                    members.append(i)
                    packs[p_i] = (rem - t, members)
                    break
            else:
                packs.append((max_tokens - t, [i]))
        for p_i, (_, members) in enumerate(packs):
            for i in members:
                out_pack[i] = f"b{bucket}-p{p_i}"
        pdf = pdf.assign(pack_id=out_pack)
        totals = pdf.groupby("pack_id")["n_tokens"].transform("sum").astype("Int64")
        # ADVICE r4: pandas' skipna sum turns a single-NaN nulltokens pack
        # into pack_tokens=0, silently conflating unknown-length docs with
        # empty ones in any token-budget accounting — keep unknown NULL.
        totals = totals.mask(pdf["pack_id"].str.endswith("-nulltokens"))
        return pdf.assign(pack_tokens=totals)[
            [id_col, "n_tokens", "pack_id", "pack_tokens"]
        ]

    return sel.groupBy("_bucket").applyInPandas(_pack, schema)
