"""Salted cell-prefix range join (SURVEY §2.B joins).

Problem shape: probe rows carry an S2 cell id; build rows carry id *ranges*
[range_min, range_max] (e.g. compacted coverings, partition manifests).
A naive theta join (lo ≤ cell ≤ hi) is a broadcast-nested-loop in Catalyst.

Band-join rewrite (cf. PAPERS.md band-join pattern): both sides key on the
coarse S2 prefix (parent at ``prefix_level``) — every range shorter than one
prefix cell lands on 1-2 prefixes (ranges spanning multiple prefixes are
exploded on the build side via sequence()) — converting the theta join into
an equi-join on prefix + residual range filter.

Skew: Zipf-hot prefixes are salted — probe rows get salt =
pmod(xxhash64(row), n_salt); the build side is exploded × n_salt so every
(prefix, salt) bucket exists. AQE skew-split stays on as backstop for
residual imbalance (session.py). Salting multiplies the *small* side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cog3pio_spark.functions import cells as C


def cell_prefix_range_join(
    probe: DataFrame,
    ranges: DataFrame,
    prefix_level: int = 6,
    n_salt: int = 8,
    cell_col: str = "s2_cell",
    lo_col: str = "range_lo",
    hi_col: str = "range_hi",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi+theta rewrite of ``probe.cell BETWEEN ranges.lo AND ranges.hi``.

    Returns probe columns + the matching range row's columns.

    ``salt_cols``: explicit probe columns to hash for the skew salt. Default:
    every ATOMIC probe column (sorted by name). Pass the cell column plus a
    stable row-discriminating column (an id) when you need bucket assignment
    to stay fixed as unrelated probe columns are added or dropped.
    """
    # salt hashes probe ROW content, not just the cell value (r4 review:
    # a cell-value salt sends every row of one hot cell id — a sentinel
    # location, a dominant tile — to a single (prefix, salt) bucket,
    # defeating the salting for duplicate-VALUE skew while the build side
    # still pays the n_salt-fold explode). Rows identical in every salt
    # column still collide, but those are true duplicates; deterministic
    # (no rand) so resume/goldens reproduce.
    if salt_cols is None:
        # ADVICE r4: xxhash64 over *probe.columns fails at analysis for
        # unhashable types (MapType) and silently reshuffles buckets when
        # unrelated columns change — restrict to atomic columns, sorted so
        # projection ORDER can't change the assignment either.
        from pyspark.sql.types import AtomicType

        salt_cols = sorted(
            f.name for f in probe.schema.fields if isinstance(f.dataType, AtomicType)
        )
        if not salt_cols:
            salt_cols = [cell_col]
    p = probe.withColumn("_prefix", C.s2_parent(F.col(cell_col), prefix_level)).withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt)
        ).cast("int"),
    )
    # A range spanning the face 3|4 boundary flips sign in the signed-int64
    # carrier (lo > hi as signed), which would break both sequence() and the
    # final BETWEEN filter (ADVICE r1). Split such ranges at the sign flip
    # into two same-sign sub-ranges before the prefix explode.
    crosses = F.col(lo_col) > F.col(hi_col)
    splits = F.when(
        crosses,
        F.array(
            F.struct(F.col(lo_col).alias("_lo"), F.lit((1 << 63) - 1).alias("_hi")),
            F.struct(F.lit(-(1 << 63)).alias("_lo"), F.col(hi_col).alias("_hi")),
        ),
    ).otherwise(
        F.array(F.struct(F.col(lo_col).alias("_lo"), F.col(hi_col).alias("_hi")))
    )
    # explode build ranges across every prefix cell they overlap
    r = (
        ranges.withColumn("_rng", F.explode(splits))
        .withColumn("_p_lo", C.s2_parent(F.col("_rng._lo"), prefix_level))
        .withColumn("_p_hi", C.s2_parent(F.col("_rng._hi"), prefix_level))
        # S2 sibling prefixes at a fixed level differ by a constant stride =
        # 2 * lsb(level); sequence() enumerates the covered prefixes.
        .withColumn(
            "_prefix",
            F.explode(
                F.sequence(
                    F.col("_p_lo"),
                    F.col("_p_hi"),
                    F.lit(2 ** (2 * (30 - prefix_level) + 1)),
                )
            ),
        )
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
        .withColumn("_salt", F.col("_salt").cast("int"))
    )
    joined = p.join(r, ["_prefix", "_salt"], "inner").filter(
        (F.col(cell_col) >= F.col("_rng._lo")) & (F.col(cell_col) <= F.col("_rng._hi"))
    )
    return joined.drop("_prefix", "_salt", "_p_lo", "_p_hi", "_rng")
