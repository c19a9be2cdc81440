"""Generate a one-off deterministic ~sf1 (10x sf0.1) table set under
/tmp/sf1 for the r14 headline linearity stress (r13 verdict item #5).
documents/embeddings are synthesized fresh (same vocab/shape/stat
profile as the driver fixtures, hash-seeded — NOT replicated copies,
so dedup pair statistics scale naturally); orders/lineitem are 10
key-shifted copies (10x the edges for the graph entries; the copies
are disjoint subgraphs, which leaves plan shape and per-edge cost
unchanged); small dims and events are copied as-is."""
import shutil
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .getOrCreate())

import duckdb
vocab = [r[0] for r in duckdb.connect().execute(
    f"SELECT DISTINCT w FROM (SELECT unnest(string_split(text,' ')) w "
    f"FROM '{SRC}/documents.parquet') WHERE w <> '' ORDER BY 1").fetchall()]
print("vocab", len(vocab))

N_DOCS, N_EMB, K = 50_000, 20_000, 10

# ---- documents: hash-sampled word soup from the fixture vocab
varr = F.array(*[F.lit(w) for w in vocab])
langs = F.array(*[F.lit(x) for x in
                  ["en", "en", "en", "de", "es", "fr", "zh"]])
docs = (spark.range(N_DOCS)
        .select(F.col("id").alias("doc_id"))
        .withColumn("_len", (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(1)),
                                    F.lit(31)) + 40).cast("int"))
        .withColumn("text", F.array_join(F.transform(
            F.sequence(F.lit(1), F.col("_len")),
            lambda i: F.element_at(
                varr, (F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(2)),
                              F.lit(len(vocab))) + 1).cast("int"))), " "))
        .withColumn("lang", F.element_at(
            langs, (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(3)),
                           F.lit(7)) + 1).cast("int")))
        .withColumn("source", F.concat(
            F.lit("src"), F.pmod(F.xxhash64(F.col("doc_id"), F.lit(4)),
                                 F.lit(20)).cast("string")))
        .withColumn("n_chars", F.length("text"))
        .drop("_len"))
docs.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

# ---- embeddings: 64-dim hash-uniform in [-0.4, 0.4]
emb = (spark.range(N_EMB).select(F.col("id").alias("vec_id"))
       .withColumn("embedding", F.transform(
           F.sequence(F.lit(1), F.lit(64)),
           lambda i: ((F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(5)),
                              F.lit(2001)) - 1000) / 2500.0).cast("float")))
       .withColumn("label", F.pmod(F.col("vec_id"), F.lit(10)).cast("int")))
emb.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

# ---- orders/lineitem: 10 key-shifted copies
o = spark.read.parquet(f"{SRC}/orders.parquet")
li = spark.read.parquet(f"{SRC}/lineitem.parquet")
copies_o = [o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * 150_000))
             .withColumn("o_custkey", F.col("o_custkey") + F.lit(k * 15_000))
            for k in range(K)]
copies_l = [li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 150_000))
              .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * 1_000))
            for k in range(K)]
out_o = copies_o[0]
for c in copies_o[1:]:
    out_o = out_o.unionByName(c)
out_l = copies_l[0]
for c in copies_l[1:]:
    out_l = out_l.unionByName(c)
out_o.write.mode("overwrite").parquet(f"{DST}/orders.parquet")
out_l.write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

# ---- small dims + events: copy as-is
for t in ["region", "nation", "customer", "supplier", "part", "events"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

for t in ["documents", "embeddings", "orders", "lineitem"]:
    print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())
print("GEN DONE")
