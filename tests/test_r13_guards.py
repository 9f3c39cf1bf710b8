"""Round-13 robustness guards (ADVICE r12): the _enc_numstr runtime
precondition check and the _LABEL_CKPT_EVERY env-parse fallback."""

import os
import subprocess
import sys

import pytest
from pyspark.errors import PySparkException

from probability_of_buying_two_products_together_hadoop_project_spark import (
    registry,
)


def _enc_roundtrip(spark, ids):
    df = spark.createDataFrame([(s,) for s in ids], "node string")
    enc = df.select(registry._enc_numstr("node"))
    return [r["node"] for r in enc.select(registry._dec_numstr("node")).collect()]


def test_enc_numstr_roundtrips_conforming_ids(spark):
    ids = ["0", "9", "10", "42", "9999999999999"]  # incl. 13-digit max
    assert sorted(_enc_roundtrip(spark, ids)) == sorted(ids)
    # python mirror agrees on the encoded values
    df = spark.createDataFrame([(s,) for s in ids], "node string")
    got = {
        r["node"] for r in df.select(registry._enc_numstr("node")).collect()
    }
    assert got == {registry._enc_numstr_py(s) for s in ids}


@pytest.mark.parametrize(
    "bad", ["12345678901234", "007", "01", "x9", "", None]
)
def test_enc_numstr_rejects_nonconforming_ids(spark, bad):
    """rpad silently TRUNCATES >13-char ids and leading zeros break
    injectivity — the encode must fail loudly, not corrupt results
    (the guard's raise_error, or the ANSI cast for non-numerics)."""
    df = spark.createDataFrame([(bad,)], "node string")
    with pytest.raises(PySparkException):
        df.select(registry._enc_numstr("node")).collect()


def test_label_ckpt_env_parse_falls_back_on_garbage():
    """A malformed SPARK_GRAFT_LABEL_CKPT (an A/B script typo) must not
    crash the operators.graph import."""
    code = (
        "from probability_of_buying_two_products_together_hadoop_project_spark"
        ".operators import graph; print(graph._LABEL_CKPT_EVERY)"
    )
    env = dict(os.environ, SPARK_GRAFT_LABEL_CKPT="4x")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "8"
