# inspect score distribution by label class
from pyspark.sql import functions as F

sc_pairs = res.scored_pairs.withColumnRenamed("id_a", "conv_id_a").withColumnRenamed("id_b", "conv_id_b")
j = lp.join(sc_pairs, ["conv_id_a", "conv_id_b"], "left")
j.groupBy("dup_class").agg(
    F.count("*").alias("n"),
    F.count("jaccard").alias("n_scored"),
    F.round(F.min("jaccard"), 3).alias("min_jac"),
    F.round(F.expr("percentile(jaccard, 0.05)"), 3).alias("p05_jac"),
    F.round(F.avg("jaccard"), 3).alias("avg_jac"),
    F.round(F.max("jaccard"), 3).alias("max_jac"),
    F.round(F.max("jw"), 3).alias("max_jw"),
).orderBy("dup_class").show()

# the false negatives specifically
fn_pairs = (
    lp.where("is_dup")
    .join(sc_pairs, ["conv_id_a", "conv_id_b"], "left")
    .where(F.col("jaccard").isNull() | (~F.col("is_dup_score") if False else ~F.coalesce(F.col("jaccard") >= 0.72, F.lit(False))))
)
lp_fn = (
    lp.where("is_dup")
    .join(ca, "conv_id_a").join(cb, "conv_id_b")
    .where(F.col("cl_a") != F.col("cl_b"))
    .join(sc_pairs.select("conv_id_a", "conv_id_b", "jaccard", "jw"), ["conv_id_a", "conv_id_b"], "left")
)
lp_fn.show(20, truncate=False)
