"""Physical-plan introspection — make the 100 TB contract testable.

A query that is correct at sf0.01 but re-plans into a full-scan
sort-merge cartesian at scale is a latent outage. These helpers parse
``df._jdf.queryExecution().executedPlan()`` / explain output so tests
can pin the properties that matter:

- filters/columns pushed into the parquet scan (PushedFilters/ReadSchema)
- join strategy (BroadcastHashJoin vs SortMergeJoin vs BNLJ)
- number of exchanges (shuffles) — the scale currency
- top-k compiling to TakeOrderedAndProject (no global sort)

They read the *pre-execution* physical plan (AQE may still improve it
at runtime; it won't make it worse).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def scans(df: DataFrame) -> list[dict]:
    """Parquet scans in the plan: [{'location':..., 'pushed': [...],
    'schema_cols': [...]}]."""
    txt = plan_string(df, "formatted")
    out = []
    for block in re.split(r"\n\(\d+\) ", txt):
        if not block.startswith("Scan parquet"):
            continue
        loc = re.search(r"Location: \S+ \[(.*?)\]", block)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block, re.S)
        out.append(
            {
                "location": loc.group(1) if loc else "",
                # keep as one string: filters like EqualTo(c,v) contain commas
                "pushed": pushed.group(1) if pushed else "",
                "schema_cols": [
                    c.split(":")[0].strip()
                    for c in schema.group(1).split(",")
                    if ":" in c
                ]
                if schema
                else [],
            }
        )
    return out


def join_strategies(df: DataFrame) -> list[str]:
    """Join exec nodes in plan order, e.g. ['BroadcastHashJoin',
    'SortMergeJoin']."""
    txt = plan_string(df, "simple")
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        txt,
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded) —
    each one is a full materialize+network hop at scale. (\\bExchange
    does not match BroadcastExchange: no word boundary after 't'.)"""
    txt = plan_string(df, "simple")
    return len(re.findall(r"\bExchange ", txt))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in plan_string(df, "simple")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if any scan's PushedFilters mentions ``fragment``."""
    return any(fragment in s["pushed"] for s in scans(df))


def assert_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    joins: list[str] | None = None,
    pushed: list[str] | None = None,
    read_cols_at_most: dict[str, int] | None = None,
    take_ordered: bool | None = None,
) -> None:
    """One-call plan contract for tests; raises AssertionError with
    the offending plan attached."""
    problems = []
    if max_shuffles is not None:
        n = count_exchanges(df)
        if n > max_shuffles:
            problems.append(f"{n} shuffles > allowed {max_shuffles}")
    if joins is not None:
        got = join_strategies(df)
        if got != joins:
            problems.append(f"join strategies {got} != expected {joins}")
    for frag in pushed or []:
        if not has_pushed_filter(df, frag):
            problems.append(f"filter not pushed to scan: {frag}")
    for loc_frag, max_cols in (read_cols_at_most or {}).items():
        for s in scans(df):
            if loc_frag in s["location"] and len(s["schema_cols"]) > max_cols:
                problems.append(
                    f"scan {loc_frag} reads {len(s['schema_cols'])} cols "
                    f"({s['schema_cols']}) > {max_cols} — column pruning failed"
                )
    if take_ordered is not None and has_take_ordered(df) != take_ordered:
        problems.append(f"TakeOrderedAndProject expected={take_ordered}")
    if problems:
        raise AssertionError(
            "plan contract violated:\n- " + "\n- ".join(problems) + "\n\n" + plan_string(df, "simple")
        )
