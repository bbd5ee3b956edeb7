"""The /verify drive: fresh process, entry() + one oracle-parity query."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyxus_spark.session import get_spark
import __spark_entry__ as m

spark = get_spark("verify", cores=8)
df = m.entry(spark)
rows = df.collect()
assert len(rows) > 0
assert not [r for r in rows if r["matched_ts"] and r["matched_ts"] > r["ts"]]
import duckdb

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')"
    )
name = "asof_join"
got = m.queries()[name](spark, "/root/testdata/sf0.01").toPandas()
exp = con.execute(m.oracle_sql()[name]).df()
assert len(got) == len(exp)
spark.stop()
print("VERIFY-OK")
