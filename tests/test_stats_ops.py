"""Attribution credit accounting, chi-square independence, and the
deterministic Poisson bootstrap — python references recompute each
bit-for-bit."""

import hashlib
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

import __spark_entry__ as entry

POIS = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
)


def test_attribution_credit_conservation_and_splits(spark, tmp_path):
    # user 1: purchase at t=100min with views at 50min and 70min -> 1/2 each
    # user 2: purchase at t=30min with one view at 5min -> full credit
    # view at 200min: after every purchase -> no credit row
    m = 60_000_000
    rows = [
        (1, 1, "view", 50 * m), (2, 1, "view", 70 * m), (3, 1, "purchase", 100 * m),
        (4, 2, "view", 5 * m), (5, 2, "purchase", 30 * m), (6, 2, "view", 200 * m),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_micros("t_us").alias("ts"),
        F.lit(0.0).alias("value"), F.lit("{}").alias("props"),
    )
    sf = str(tmp_path / "attr_sf")
    import os
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = {
        r["event_id"]: (r["n_touches"], r["credit_units"])
        for r in entry.queries()["attribution_linear_credit"](spark, sf).collect()
    }
    assert out == {
        1: (1, 500_000_000_000),
        2: (1, 500_000_000_000),
        4: (1, 1_000_000_000_000),
    }
    # conservation: each purchase distributes n * (1e12 DIV n) <= 1e12 units
    assert sum(u for _, u in out.values()) == 2 * 10**12


def test_chi2_matches_python_reference(spark, sf_oracle):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_oracle}/documents.parquet'"
    )
    cells = con.execute(
        "SELECT source, lang, count(*) FROM documents GROUP BY 1, 2"
    ).fetchall()
    rt, ct, n = {}, {}, 0
    for s, l, o in cells:
        rt[s] = rt.get(s, 0) + o
        ct[l] = ct.get(l, 0) + o
        n += o
    units = 0
    for s, l, o in cells:
        e = rt[s] * float(ct[l]) / n
        e = float(rt[s]) * float(ct[l]) / float(n)
        term = (float(o) - e) * (float(o) - e) / e
        import math
        units += math.floor(term * 1e9)
    row = entry.queries()["chi2_source_lang"](spark, sf_oracle).collect()[0]
    assert row["chi2_units"] == units
    assert row["dof"] == (len(rt) - 1) * (len(ct) - 1)


def test_bootstrap_matches_python_reference(spark, sf_oracle):
    import duckdb

    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_orderkey, o_totalprice FROM '{sf_oracle}/orders.parquet'"
    ).fetchall()
    means = []
    for b in range(32):
        sd, sw = Decimal(0), 0
        for k, x in orders:
            h = int(hashlib.md5(f"{b}|{k}".encode()).hexdigest()[:8], 16)
            u = (h + 0.5) / float(1 << 32)
            w = 0
            for thr in POIS:
                if u < thr:
                    break
                w += 1
            if w:
                # Spark's double->decimal(18,4) cast: HALF_UP over the
                # shortest round-trip repr (the BM25 tie-contract lesson)
                sd += w * Decimal(str(x)).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
                sw += w
        means.append(float(sd) / float(sw))
    means.sort()
    lo = means[(5 * 32 + 99) // 100 - 1]
    hi = means[(95 * 32 + 99) // 100 - 1]
    row = entry.queries()["bootstrap_ci_totalprice"](spark, sf_oracle).collect()[0]
    assert row["n_replicates"] == 32
    assert row["ci_lo"] == lo and row["ci_hi"] == hi
    assert row["ci_lo"] < row["mean_price"] < row["ci_hi"]
