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

    Boundedness is judged RECURSIVELY over the exchange's input tree,
    not by scanning the whole subtree for any marker (ADVICE r10 — a
    marker in just one branch of a join silenced the tripwire): a node
    is bounded iff it IS a boundedness marker (aggregate / limit /
    local / pinned-checkpoint scan / broadcast build side), or it is a
    join/union/generate whose children are ALL bounded (bounded x
    bounded stays bounded; one unbounded branch poisons the node), or
    it is a single-child operator over a bounded child. A raw parquet
    scan or Range leaf is unbounded.

    The check is a structural heuristic over the formatted plan tree —
    use it as a regression tripwire (assert == []), not as proof of
    scale-worthiness. Known residual blind spot, by design: an
    *Aggregate* directly below the exchange bounds the input only down
    to its GROUP-KEY cardinality — a groupBy over a corpus-sized key
    still funnels that many rows through one task; the marker accepts
    it because every legitimate single-partition hop in this repo sits
    above an aggregation whose key set is structurally small (buckets,
    digits, rounds), and that contract is reviewed per query, not here.
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
    def children(i: int) -> list[int]:
        """Direct children of tree[i]: the minimum-depth nodes of its
        subtree (pre-order with indentation-encoded nesting)."""
        d = tree[i][0]
        sub = []
        for j in range(i + 1, len(tree)):
            if tree[j][0] <= d:
                break
            sub.append(j)
        if not sub:
            return []
        dmin = min(tree[j][0] for j in sub)
        return [j for j in sub if tree[j][0] == dmin]

    def bounded(i: int) -> bool:
        name = tree[i][2]
        if "BroadcastExchange" in name:
            return True  # planner-vetted small build side
        if any(mk in name for mk in _BOUNDED_MARKERS):
            return True
        kids = children(i)
        if not kids:
            return False  # raw leaf (Scan parquet, Range): data-sized
        # joins/unions/generates and single-child ops alike: bounded
        # iff EVERY input is bounded — one unbounded branch poisons it
        return all(bounded(j) for j in kids)

    flagged: list[int] = []
    for i, (_depth, nid, _name) in enumerate(tree):
        if nid not in single_ids:
            continue
        kids = children(i)
        if not (kids and all(bounded(j) for j in kids)):
            flagged.append(nid)
    return flagged


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [
        line.strip()
        for line in plan.splitlines()
        if "PushedFilters" in line and "[]" not in line
    ]
