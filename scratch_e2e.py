# scratch: run in the persistent REPL via exec(open('scratch_e2e.py').read())
import importlib
import sys
import time

for m in sorted([m for m in sys.modules if m.startswith("dedupe_spark")], key=lambda s: -s.count(".")):
    importlib.reload(sys.modules[m])

from pyspark.sql import functions as F

from dedupe_spark import fixtures, pipeline

t0 = time.time()
N = 1000
tr = fixtures.transcripts(spark, n_conv=N).persist()
print("turns:", tr.count(), "convs:", tr.select("conv_id").distinct().count(), f"{time.time()-t0:.1f}s")

res = pipeline.run(tr)
clusters = res.clusters.persist()
print("clusters computed", f"{time.time()-t0:.1f}s")

# --- F1 against labeled pairs: predicted dup iff same cluster ---
lp = fixtures.labeled_pairs(spark, n_conv=N)
ca = clusters.withColumnRenamed("conv_id", "conv_id_a").withColumnRenamed("cluster_id", "cl_a")
cb = clusters.withColumnRenamed("conv_id", "conv_id_b").withColumnRenamed("cluster_id", "cl_b")
ev = (
    lp.join(ca, "conv_id_a").join(cb, "conv_id_b")
    .withColumn("pred", F.col("cl_a") == F.col("cl_b"))
)
agg = ev.agg(
    F.sum(F.when(F.col("is_dup") & F.col("pred"), 1).otherwise(0)).alias("tp"),
    F.sum(F.when(~F.col("is_dup") & F.col("pred"), 1).otherwise(0)).alias("fp"),
    F.sum(F.when(F.col("is_dup") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
).collect()[0]
tp, fp_, fn = agg["tp"], agg["fp"], agg["fn"]
prec = tp / (tp + fp_) if tp + fp_ else 0.0
rec = tp / (tp + fn) if tp + fn else 0.0
f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
print(f"tp={tp} fp={fp_} fn={fn} precision={prec:.4f} recall={rec:.4f} F1={f1:.4f}")

# error breakdown by dup_class
ev.groupBy("dup_class", "is_dup", "pred").count().orderBy("dup_class", "is_dup", "pred").show(30)
res.metrics.show(truncate=False)
print(f"total {time.time()-t0:.1f}s")
