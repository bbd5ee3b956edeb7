"""Wave-11 operators: PII-style scrubbing and the Gopher-rule flag."""

import re

from pyspark.sql import functions as F

from nyxus_spark.functions import (
    SCRUB_EMAIL,
    SCRUB_LONGNUM,
    SCRUB_URL,
    gopher_pass_expr,
    scrub_exprs,
)

TEXTS = [
    "plain words only here",
    "mail me at a.b_c@ex.org now",
    "see https://x.io/p?q=1 and http://y.z/2 ref 1234567 code 99887766",
    "",
    "edge@case.io https://a.b 123456",
]


def _py_scrub(t):
    n_url = len(re.findall(SCRUB_URL, t))
    n_email = len(re.findall(SCRUB_EMAIL, t))
    n_num = len(re.findall(SCRUB_LONGNUM, t))
    s = re.sub(SCRUB_URL, "<URL>", t)
    s = re.sub(SCRUB_EMAIL, "<EMAIL>", s)
    s = re.sub(SCRUB_LONGNUM, "<NUM>", s)
    return n_url, n_email, n_num, len(s)


def test_scrub_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id int, text string")
    e = scrub_exprs("text")
    rows = df.select("doc_id", *[v.alias(k) for k, v in e.items()]).collect()
    for r in rows:
        want = _py_scrub(TEXTS[r.doc_id])
        assert (r.n_url, r.n_email, r.n_longnum, r.scrub_len) == want, r.doc_id


def test_scrub_duckdb_twin_agrees(spark):
    """The exact CTE shape the oracle uses must reproduce the Spark values
    on the same strings (regex subset shared by Java and RE2)."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
                + ") v(doc_id, text)")
    exp = con.execute("""
        SELECT doc_id,
               len(regexp_extract_all(text, 'https?://[^ ]+')) AS n_url,
               len(regexp_extract_all(text, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+')) AS n_email,
               len(regexp_extract_all(text, '[0-9]{6,}')) AS n_longnum,
               length(regexp_replace(regexp_replace(regexp_replace(text,
                  'https?://[^ ]+', '<URL>', 'g'),
                  '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
                  '[0-9]{6,}', '<NUM>', 'g')) AS scrub_len
        FROM t ORDER BY doc_id""").fetchall()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id int, text string")
    e = scrub_exprs("text")
    got = {r.doc_id: (r.n_url, r.n_email, r.n_longnum, r.scrub_len)
           for r in df.select("doc_id", *[v.alias(k) for k, v in e.items()]).collect()}
    for doc_id, nu, ne, nn, sl in exp:
        assert got[doc_id] == (nu, ne, nn, sl), doc_id


def test_gopher_pass_boolean_algebra(spark):
    df = spark.createDataFrame(
        [(1, 10, 5.0, 0.1, 0.2, 1),
         (2, 3, 5.0, 0.1, 0.2, 0),     # too few words
         (3, 10, 1.5, 0.1, 0.2, 0),    # words too short
         (4, 10, 13.0, 0.1, 0.2, 0),   # words too long
         (5, 10, 5.0, 0.5, 0.2, 0),    # too repetitive
         (6, 10, 5.0, 0.1, 0.0, 0)],   # no stopwords
        "doc_id int, n_words long, mean_word_len double, "
        "rep_dup_ratio double, stopword_ratio double, want int",
    )
    rows = df.withColumn("gp", gopher_pass_expr()).collect()
    for r in rows:
        assert r.gp == r.want, r.doc_id
