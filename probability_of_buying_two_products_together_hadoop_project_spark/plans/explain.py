"""Plan introspection helpers: assert the physical plan has the shape we
want (the '100 TB posture' checks from the build brief).

Used by tests to guard against plan regressions: pushdown reaching the
scan, broadcast joins staying broadcast, shuffle counts staying at the
designed number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan.

    Counts the numbered detail headers "(N) Exchange" of the formatted
    plan — the partitioning arguments live on a separate line, so
    matching them on the same line (the original implementation) silently
    counted zero for every plan.
    """
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


_BOUNDED_MARKERS = (
    "Aggregate",  # HashAggregate/SortAggregate/ObjectHashAggregate reduce first
    "LocalTableScan",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "ExistingRDD",  # localCheckpoint-pinned (bounded-by-contract) inputs
    "ReusedExchange",
)


def unbounded_single_partition_exchanges(df: DataFrame) -> list[int]:
    """Node ids of ``Exchange SinglePartition`` operators whose input
    subtree shows NO boundedness marker — the scale-killer class (a bare
    ``Window.orderBy`` / global sort funneling unreduced data through one
    task). Bounded-by-construction single-partition hops are fine and
    excluded: inputs that were already aggregated (an *Aggregate* below
    the exchange, e.g. the <= n_buckets offsets table of the parallel
    prefix-sum), limited (TakeOrderedAndProject / GlobalLimit), local, or
    localCheckpoint-pinned small state (Scan ExistingRDD).

    The check is a structural heuristic over the formatted plan tree —
    use it as a regression tripwire (assert == []), not as proof of
    scale-worthiness.
    """
    import re

    plan = formatted_plan(df)
    lines = plan.splitlines()
    # Details section: "(N) Operator" headers followed by attribute lines.
    single_ids: set[int] = set()
    cur_id: int | None = None
    cur_is_exchange = False
    for ln in lines:
        m = re.match(r"^\((\d+)\) (.+?)(?: \[codegen.*)?$", ln)
        if m:
            cur_id = int(m.group(1))
            cur_is_exchange = m.group(2).strip().startswith("Exchange")
            continue
        if cur_is_exchange and ln.startswith("Arguments:") and "SinglePartition" in ln:
            single_ids.add(cur_id)
    if not single_ids:
        return []
    # Tree section: indentation encodes structure; node name ends "(N)".
    tree: list[tuple[int, int, str]] = []  # (depth, id, opname)
    for ln in lines:
        m = re.search(r"([*A-Za-z][^()]*)\((\d+)\)\s*$", ln)
        if m and not ln.startswith("("):
            name = m.group(1).strip().lstrip("* ").strip()
            depth = m.start(1)
            tree.append((depth, int(m.group(2)), name))
    flagged: list[int] = []
    for i, (depth, nid, _name) in enumerate(tree):
        if nid not in single_ids:
            continue
        bounded = False
        for d2, _nid2, name2 in tree[i + 1 :]:
            if d2 <= depth:
                break
            if any(mk in name2 for mk in _BOUNDED_MARKERS):
                bounded = True
                break
        if not bounded:
            flagged.append(nid)
    return flagged


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [
        line.strip()
        for line in plan.splitlines()
        if "PushedFilters" in line and "[]" not in line
    ]
