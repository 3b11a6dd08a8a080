"""Declarative data-quality checks — the validation stage of the
reference pipeline (clean/validate before load) as an engine
operator.

``run_checks`` evaluates a rule list in ONE aggregation pass over
the table (plus one left join per referential rule): every rule
becomes a conditional-sum column, and the wide 1-row result is
stacked to (rule, n_violations) rows. Never one scan per rule — at
100 TB a 10-rule suite costs the same scan as a 1-rule suite.

Rule kinds:
- ``not_null(col)``
- ``unique(*cols)``      — count minus countDistinct
- ``in_range(col, lo, hi)``
- ``in_set(col, values)``
- ``ref(col, dim_df, dim_col)`` — FK violation via broadcast left
  join (null dim side after join = dangling key)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class Rule:
    name: str
    kind: str
    cols: tuple
    extra: dict = field(default_factory=dict)


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", "not_null", (col,))


def unique(*cols: str) -> Rule:
    return Rule("unique_" + "_".join(cols), "unique", cols)


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"range_{col}", "in_range", (col,), {"lo": lo, "hi": hi})


def in_set(col: str, values) -> Rule:
    return Rule(f"set_{col}", "in_set", (col,), {"values": tuple(values)})


def ref(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(f"ref_{col}", "ref", (col,), {"dim": dim, "dim_col": dim_col})


def run_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule, n_violations) long frame."""
    probe = df
    aggs = []
    for r in rules:
        c = F.col(r.cols[0]) if r.cols else None
        if r.kind == "not_null":
            aggs.append(F.sum(c.isNull().cast("long")).alias(r.name))
        elif r.kind == "unique":
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(x) for x in r.cols]))
                .alias(r.name)
            )
        elif r.kind == "in_range":
            bad = ~c.between(r.extra["lo"], r.extra["hi"]) | c.isNull()
            aggs.append(F.sum(bad.cast("long")).alias(r.name))
        elif r.kind == "in_set":
            bad = ~c.isin(*r.extra["values"]) | c.isNull()
            aggs.append(F.sum(bad.cast("long")).alias(r.name))
        elif r.kind == "ref":
            marker = f"__ref_ok_{r.name}"
            dim = (
                r.extra["dim"]
                .select(F.col(r.extra["dim_col"]).alias(r.cols[0]))
                .distinct()
                .withColumn(marker, F.lit(1))
            )
            probe = probe.join(F.broadcast(dim), on=r.cols[0], how="left")
            aggs.append(F.sum(F.col(marker).isNull().cast("long")).alias(r.name))
        else:
            raise ValueError(f"unknown rule kind {r.kind!r}")
    wide = probe.agg(*aggs)
    stacked = ", ".join(f"'{r.name}', `{r.name}`" for r in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {stacked}) as (rule, n_violations)")
    ).orderBy("rule")


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    batch_ts: str,
    eff_from: str = "valid_from",
    eff_to: str = "valid_to",
    open_marker: str = "9999-12-31",
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a change batch to a
    versioned dimension, preserving history.

    ``current`` carries [keys, attrs, valid_from, valid_to] with the
    open version marked by ``valid_to = open_marker``. For each
    change row whose attrs differ from the open version (or whose
    key is new), the open version closes at ``batch_ts`` and a new
    open version is appended. Unchanged rows and closed history pass
    through untouched.

    Plan: ONE broadcast join of the change batch against the open
    slice, a tri-state split (close / insert / passthrough), and a
    union — the closed-history majority of a 100 TB dimension is
    never joined at all, only the open slice shuffles. Deterministic:
    re-applying the same batch at the same ``batch_ts`` is a no-op
    (attrs then match the new open version).
    """
    # presence markers: after a full outer join, a struct of all-null
    # columns is still a NON-null struct, so side presence must be
    # tracked explicitly, not inferred from attr nullness.
    cmp_old = F.struct(*[F.col(f"__o_{a}") for a in attr_cols])
    cmp_new = F.struct(*[F.col(a) for a in attr_cols])

    open_slice = current.where(F.col(eff_to) == open_marker)
    closed = current.where(F.col(eff_to) != open_marker)

    ch = changes.select(
        *key_cols, *[F.col(a) for a in attr_cols]
    ).withColumn("__c_present", F.lit(1))
    old_renamed = open_slice.select(
        *key_cols,
        *[F.col(a).alias(f"__o_{a}") for a in attr_cols],
        F.col(eff_from).alias("__o_from"),
        F.lit(1).alias("__o_present"),
    )
    j = ch.join(F.broadcast(old_renamed), on=key_cols, how="full_outer")

    has_new = F.col("__c_present").isNotNull()
    has_old = F.col("__o_present").isNotNull()
    is_changed = has_new & has_old & ~cmp_new.eqNullSafe(cmp_old)
    untouched_open = j.where(
        (has_old & ~has_new) | (has_new & has_old & cmp_new.eqNullSafe(cmp_old))
    ).select(
        *key_cols,
        *[F.col(f"__o_{a}").alias(a) for a in attr_cols],
        F.col("__o_from").alias(eff_from),
        F.lit(open_marker).alias(eff_to),
    )
    closed_now = j.where(is_changed).select(
        *key_cols,
        *[F.col(f"__o_{a}").alias(a) for a in attr_cols],
        F.col("__o_from").alias(eff_from),
        F.lit(batch_ts).alias(eff_to),
    )
    new_open = j.where(is_changed | (has_new & ~has_old)).select(
        *key_cols,
        *attr_cols,
        F.lit(batch_ts).alias(eff_from),
        F.lit(open_marker).alias(eff_to),
    )
    return closed.unionByName(untouched_open).unionByName(closed_now).unionByName(
        new_open
    )
