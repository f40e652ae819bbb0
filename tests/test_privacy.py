"""Privacy operators (operators/privacy.py). Oracle parity is covered
in the differential suite (where the synthetic corpus contains no PII —
the zero-count case); here we plant real PII and verify the rewrite,
and pin the pseudonymization contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from twitter_social_triangle_mapreduce_spark.operators import privacy


def test_redaction_rewrites_planted_pii(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact me at jane.doe+x@example.co.uk or +1 (555) 123-4567 ok"),
            (2, "no pii here just words"),
            (3, "two mails a@b.io c@d.org and a number 0049 171 2345678 end"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in privacy.redact_text(docs).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert "[EMAIL]" in got[1]["text"] and "[PHONE]" in got[1]["text"]
    assert "example.co.uk" not in got[1]["text"]
    assert "555" not in got[1]["text"]
    assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 0
    assert got[2]["text"] == "no pii here just words"
    assert got[3]["n_emails"] == 2 and got[3]["n_phones"] == 1
    assert got[3]["text"].count("[EMAIL]") == 2


def test_pseudonymize_is_deterministic_and_salt_sensitive(spark):
    df = spark.createDataFrame(
        [(7, "a"), (7, "b"), (9, "c")], "user_id long, x string"
    )
    t1 = privacy.pseudonymize(df, ["user_id"], salt="s1")
    rows = t1.collect()
    toks = {r["x"]: r["user_id"] for r in rows}
    # same key -> same token (joins/groupBys survive)
    assert toks["a"] == toks["b"] != toks["c"]
    # token is exactly sha256(salt|key)
    assert toks["a"] == hashlib.sha256(b"s1|7").hexdigest()
    # rotating the salt unlinks
    t2 = {
        r["x"]: r["user_id"]
        for r in privacy.pseudonymize(df, ["user_id"], salt="s2").collect()
    }
    assert t2["a"] != toks["a"]


def test_pseudonymize_plan_is_scan_project_only(spark):
    df = spark.createDataFrame([(1, "a")], "user_id long, x string")
    plan = (
        privacy.pseudonymize(df, ["user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure per-row rewrite, no shuffle
