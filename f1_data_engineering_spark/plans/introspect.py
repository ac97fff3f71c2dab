"""Physical-plan capture and assertions (SURVEY.md §4.2 enforcement)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "count_exchanges",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_column_pruned",
    "assert_no_cartesian",
    "attach_audit",
]


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string `df.explain(mode)` would print."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (reused
    exchanges count once — matching actual shuffle work)."""
    plan = physical_plan(df, "simple")
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a scan's PushedFilters list —
    i.e. the predicate prunes parquet row groups instead of filtering
    post-scan."""
    plan = physical_plan(df, "formatted")
    pushed = " ".join(re.findall(r"PushedFilters: \[(.*?)\]", plan))
    for frag in fragments:
        if frag not in pushed:
            raise AssertionError(
                f"filter {frag!r} not pushed to scan; PushedFilters=[{pushed}]\n{plan}"
            )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    """Assert the plan contains >= N BroadcastHashJoins (small dims must
    broadcast, never shuffle the fact side)."""
    plan = physical_plan(df, "simple")
    n = plan.count("BroadcastHashJoin")
    if n < at_least:
        raise AssertionError(f"expected >= {at_least} BroadcastHashJoin, found {n}\n{plan}")


def assert_column_pruned(df: DataFrame, table_fragment: str, max_cols: int) -> None:
    """Assert the scan of a table reads at most ``max_cols`` columns
    (ReadSchema pruning)."""
    plan = physical_plan(df, "formatted")
    for m in re.finditer(r"Location:.*?" + re.escape(table_fragment) + r".*?ReadSchema: struct<(.*?)>", plan, re.S):
        ncols = len([c for c in m.group(1).split(",") if c.strip()])
        if ncols > max_cols:
            raise AssertionError(
                f"scan of {table_fragment} reads {ncols} cols (> {max_cols}): {m.group(1)}"
            )
        return
    raise AssertionError(f"no scan of {table_fragment} found in plan\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert no CartesianProduct / BroadcastNestedLoopJoin survives —
    the failure mode of un-bucketized range joins."""
    plan = physical_plan(df, "simple")
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise AssertionError(f"plan contains {bad}\n{plan}")


def attach_audit(df: DataFrame, name: str, *key_columns: str):
    """Attach zero-extra-pass pipeline audit metrics via
    ``Observation``: row count plus per-key null counts ride the job's
    existing action (no second scan, no collect of data rows).

    Returns ``(df, observation)`` — after any action on ``df``,
    ``observation.get`` yields the metric dict.  This is the engine's
    answer to the reference's log-and-hope error accounting
    (try/except-with-log around every stage, e.g.
    f1_dataTransformer.py:202-207): audits are exact, computed where
    the data is, and cost one expression per metric.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in key_columns:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    return df.observe(obs, *metrics), obs
