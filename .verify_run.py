import sys; sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession
import __spark_entry__ as e
import duckdb, math

spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)                      # smoke: flagship at sf0.001
assert df.count() > 0

sf = "/root/testdata/sf0.01"             # driver's correctness SF
con = duckdb.connect(); con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if v is None or
                          (isinstance(v,float) and math.isnan(v))
                          else (repr(v) if isinstance(v,float) else str(v)))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

Q, O = e.queries(), e.oracle_sql()
fails = []
for name in sorted(O):
    got, want = norm(Q[name](spark, sf).toPandas()), norm(con.execute(O[name]).fetchdf())
    if not (len(got)==len(want) and got.equals(want)): fails.append(name)
    spark.catalog.clearCache()
for name in sorted(set(Q)-set(O)):       # rows-only queries
    assert Q[name](spark, sf).count() >= 0, name
    spark.catalog.clearCache()
print("FAIL", fails) if fails else print("PASS all", len(Q))
