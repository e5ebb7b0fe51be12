"""SURVEY.md §4.2 item 4 (the optional Catalyst extension, implemented in
`jvm/GraftSparkExtensions.scala`): a native `cosine_sim` SQL function plus an
opt-in logical rewrite that turns `ORDER BY cosine_sim(col, lit) DESC LIMIT k`
into the sign-bucket-prefiltered plan — the engine-enforced twin of the
API-layer `llm_simsearch_lsh`.

The extension must be wired at SparkSession construction
(`spark.sql.extensions`), which the shared session fixture can't do, so a
single subprocess builds its own session with the jar and runs every check,
emitting one JSON verdict; the JVM startup (~15 s) is paid once.

Laws pinned here:
  1. value law — cosine_sim == numpy cosine to 1e-6 on real fixture rows;
  2. default-off — with the extension loaded but the flag unset, the
     optimized plan of the ANN idiom contains NO sign filter;
  3. plan pin — with the flag on, the sign filter (bits conjuncts of
     element_at sign tests) appears below the sort;
  4. contract law — the rewritten result is EXACTLY the manually
     prefiltered brute force (the documented API-layer plan), at bits=4;
  5. brute-equality law — at bits=2 with query vector vec_id=15 (measured:
     one of the 8 fixture vectors whose true top-5 is bucket-complete at
     2 bits), the rewritten top-5 equals the UNRESTRICTED brute force —
     recall@5 = 1.0 on this fixture, the honest statement of what an LSH
     prefilter can promise;
  6. guard laws — no rewrite for ASC sorts or non-foldable query vectors,
     and the DataFrame `orderBy(expr.desc)` path (no alias Project) also
     fires.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUBPROC = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from tools.build_extension import ensure_jar
jar = ensure_jar()
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.jars", jar)
         .config("spark.driver.extraClassPath", jar)
         .config("spark.sql.extensions", "graft.spark.GraftExtensions")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from event_streaming_bnpl_demo_spark.sources import load_table
e = load_table(spark, %(sf)r, "embeddings")
e.createOrReplaceTempView("emb")

def qlit(vec):
    return "array(" + ",".join(f"CAST({x} AS FLOAT)" for x in vec) + ")"

def opt_plan(df):
    return df._jdf.queryExecution().optimizedPlan().toString()

def sign_filter_lines(plan):
    # the injected prefilter is a Filter whose condition sign-tests
    # element_at(embedding, i) against 0.0; the cosine PROJECTION also
    # contains element_at, so detection must be per-Filter-line
    return [ln for ln in plan.splitlines()
            if "Filter" in ln and "element_at" in ln
            and (">= 0.0" in ln or "< 0.0" in ln)]

def ann_sql(vec, k=5):
    return (f"SELECT vec_id, cosine_sim(embedding, {qlit(vec)}) AS cos "
            f"FROM emb WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT {k}")

out = {}

# 1. value law vs numpy
import math
rows = e.filter("vec_id IN (1, 2)").orderBy("vec_id").collect()
v1, v2 = rows[0]["embedding"], rows[1]["embedding"]
got = spark.sql(
    f"SELECT cosine_sim({qlit(v1)}, {qlit(v2)}) AS c").first()["c"]
dot = sum(a * b for a, b in zip(v1, v2))
ref = dot / (math.sqrt(sum(a * a for a in v1)) * math.sqrt(sum(b * b for b in v2)))
out["value_abs_err"] = abs(got - ref)

q0 = e.filter("vec_id = 0").first()["embedding"]

# 2. default-off: no sign filter in the plan
plan_off = opt_plan(spark.sql(ann_sql(q0)))
out["off_has_sign_filter"] = bool(sign_filter_lines(plan_off))
res_off = [r["vec_id"] for r in spark.sql(ann_sql(q0)).collect()]

# 3. plan pin with the flag on (bits=4 default)
spark.conf.set("spark.graft.ann.rewrite.enabled", "true")
df_on = spark.sql(ann_sql(q0))
plan_on = opt_plan(df_on)
flt = sign_filter_lines(plan_on)
out["on_has_sign_filter"] = bool(flt)
out["on_sign_tests"] = sum(ln.count("element_at") for ln in flt)
res_on = [r["vec_id"] for r in df_on.collect()]

# 4. contract law: rewrite == the manual API-layer prefilter (bits=4)
signs = [">=" if x >= 0 else "<" for x in q0[:4]]
pred = " AND ".join(
    f"CAST(element_at(embedding, {i+1}) AS DOUBLE) {s} 0.0"
    for i, s in enumerate(signs))
spark.conf.set("spark.graft.ann.rewrite.enabled", "false")
manual = [r["vec_id"] for r in spark.sql(
    f"SELECT vec_id, cosine_sim(embedding, {qlit(q0)}) AS cos FROM emb "
    f"WHERE vec_id <> 0 AND {pred} ORDER BY cos DESC, vec_id LIMIT 5"
).collect()]
out["contract_equal"] = (res_on == manual)

# 5. brute-equality law at bits=2, query = vec 15 (bucket-complete fixture)
q15 = e.filter("vec_id = 15").first()["embedding"]
brute = [r["vec_id"] for r in spark.sql(
    f"SELECT vec_id, cosine_sim(embedding, {qlit(q15)}) AS cos FROM emb "
    f"WHERE vec_id <> 0 AND vec_id <> 15 "
    f"ORDER BY cos DESC, vec_id LIMIT 5").collect()]
spark.conf.set("spark.graft.ann.rewrite.enabled", "true")
spark.conf.set("spark.graft.ann.rewrite.bits", "2")
rewritten = [r["vec_id"] for r in spark.sql(
    f"SELECT vec_id, cosine_sim(embedding, {qlit(q15)}) AS cos FROM emb "
    f"WHERE vec_id <> 0 AND vec_id <> 15 "
    f"ORDER BY cos DESC, vec_id LIMIT 5").collect()]
out["brute_equal_bits2"] = (rewritten == brute)
spark.conf.set("spark.graft.ann.rewrite.bits", "4")

# 6a. guard: ASC sort — no rewrite
plan_asc = opt_plan(spark.sql(
    f"SELECT vec_id, cosine_sim(embedding, {qlit(q0)}) AS cos "
    f"FROM emb WHERE vec_id <> 0 ORDER BY cos ASC, vec_id LIMIT 5"))
out["asc_untouched"] = not sign_filter_lines(plan_asc)

# 6b. guard: non-foldable query side — no rewrite
plan_nf = opt_plan(spark.sql(
    "SELECT vec_id, cosine_sim(embedding, embedding) AS cos "
    "FROM emb ORDER BY cos DESC LIMIT 5"))
out["nonfoldable_untouched"] = not sign_filter_lines(plan_nf)

# 6c. DataFrame orderBy path (sort key holds the call, no alias Project)
dfq = (e.filter("vec_id <> 0")
       .orderBy(F.expr(f"cosine_sim(embedding, {qlit(q0)})").desc(),
                F.col("vec_id"))
       .limit(5).select("vec_id"))
out["df_api_fires"] = bool(sign_filter_lines(opt_plan(dfq)))
out["df_api_equal"] = [r["vec_id"] for r in dfq.collect()] == res_on

out["off_result_is_brute"] = res_off == [365, 334, 387, 423, 73]

# 7. the catalog entry rides the rewrite: llm_simsearch_ann_native on a
# native session must (a) opt into the rewrite itself (flag starts
# false), (b) show the injected sign filter in its optimized plan,
# (c) restore the session flag, and (d) hash-match its own DuckDB
# oracle — the same compare the driver gate runs on the fallback path.
from event_streaming_bnpl_demo_spark.plans import all_queries
catq = all_queries()["llm_simsearch_ann_native"]
spark.conf.set("spark.graft.ann.rewrite.enabled", "false")
df_cat = catq.fn(spark, %(sf)r)
out["catalog_plan_has_sign_filter"] = bool(sign_filter_lines(opt_plan(df_cat)))
out["catalog_conf_restored"] = (
    spark.conf.get("spark.graft.ann.rewrite.enabled") == "false")
got = sorted(tuple(map(str, r)) for r in df_cat.collect())
import duckdb
con = duckdb.connect()
con.execute("CREATE VIEW embeddings AS SELECT * FROM "
            + repr(%(sf)r + "/embeddings.parquet"))
exp = sorted(tuple(map(str, r)) for r in con.execute(catq.oracle).fetchall())
out["catalog_matches_oracle"] = got == exp

# 8. native jaro_winkler_sim: bit-equal to the pandas-UDF reference
# algorithm on adversarial pairs (incl. supplementary-plane code
# points), and the scalar_jaro_winkler catalog entry on a native
# session drops the Python worker (no EvalPython node) while still
# hash-matching its own DuckDB oracle.
import tests.test_ext12_semantics as ref
jw_pairs = [("", ""), ("a", ""), ("", "b"), ("a", "a"), ("abab", "baba"),
            ("DIXON", "DICKSONX"), ("MARTHA", "MARHTA"), ("CRATE", "TRACE"),
            ("aaaa", "aaab"), ("ab", "ba"), ("\U0001F600ab", "\U0001F600abc"),
            ("prefix boost here", "prefix boost here!"), ("x" * 30, "x" * 29 + "y")]
jw_df = spark.createDataFrame(jw_pairs, "a string, b string")
jw_got = spark.sql(
    "SELECT a, b, jaro_winkler_sim(a, b) AS jw FROM {d}", d=jw_df).collect()
out["jw_value_equal"] = all(r["jw"] == ref._jw(r["a"], r["b"]) for r in jw_got)

jwq = all_queries()["scalar_jaro_winkler"]
df_jw = jwq.fn(spark, %(sf)r)
jw_plan = df_jw._jdf.queryExecution().executedPlan().toString()
out["jw_no_python_worker"] = "EvalPython" not in jw_plan
con.execute("CREATE VIEW part AS SELECT * FROM "
            + repr(%(sf)r + "/part.parquet"))
jw_exp = sorted(tuple(map(str, r)) for r in con.execute(jwq.oracle).fetchall())
jw_res = sorted(tuple(map(str, r)) for r in df_jw.collect())
out["jw_catalog_matches_oracle"] = jw_res == jw_exp
print("VERDICT:" + json.dumps(out))
"""


@pytest.fixture(scope="module")
def verdict():
    try:
        from tools.build_extension import ensure_jar
        ensure_jar()
    except Exception as exc:  # no compiler in env -> honest skip
        pytest.skip(f"extension jar unavailable: {exc}")
    script = _SUBPROC % {"repo": REPO, "sf": "/root/testdata/sf0.01"}
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=600,
                          cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("VERDICT:")][-1]
    return json.loads(line[len("VERDICT:"):])


def test_cosine_sim_value(verdict):
    assert verdict["value_abs_err"] < 1e-6


def test_rewrite_off_by_default(verdict):
    assert not verdict["off_has_sign_filter"]
    assert verdict["off_result_is_brute"]


def test_rewrite_plan_pin(verdict):
    assert verdict["on_has_sign_filter"]
    # 4 sign tests on the data side (the query side folded at rewrite time)
    assert verdict["on_sign_tests"] >= 4


def test_rewrite_contract_equals_manual_prefilter(verdict):
    assert verdict["contract_equal"]


def test_rewrite_equals_brute_force_on_fixture(verdict):
    assert verdict["brute_equal_bits2"]


def test_rewrite_guards(verdict):
    assert verdict["asc_untouched"]
    assert verdict["nonfoldable_untouched"]


def test_rewrite_fires_for_dataframe_api(verdict):
    assert verdict["df_api_fires"]
    assert verdict["df_api_equal"]


def test_catalog_ann_query_uses_rewrite(verdict):
    """r7 verdict ask #6: the oracled catalog entry's plan carries the
    engine-injected sign-bucket filter below the sort, the query opts
    in (and back out) of the rewrite flag itself, and the native-path
    result hash-matches the same DuckDB oracle the driver gate runs."""
    assert verdict["catalog_plan_has_sign_filter"]
    assert verdict["catalog_conf_restored"]
    assert verdict["catalog_matches_oracle"]


def test_native_jaro_winkler(verdict):
    """r7 verdict ask #7: the Scala jaro_winkler_sim is bit-equal to
    the pandas-UDF reference, and scalar_jaro_winkler on a native
    session runs with NO Python worker while matching its oracle."""
    assert verdict["jw_value_equal"]
    assert verdict["jw_no_python_worker"]
    assert verdict["jw_catalog_matches_oracle"]
