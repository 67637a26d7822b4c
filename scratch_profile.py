# phase-level wall-time profile of the pipeline
import importlib, sys, time
for m in sorted([m for m in sys.modules if m.startswith("dedupe_spark")], key=lambda s: -s.count(".")):
    importlib.reload(sys.modules[m])
from pyspark.sql import functions as F
from dedupe_spark import fixtures
from dedupe_spark.operators import blocking, clustering, lifecycle, minhash, normalize, scoring

N = 1000
t0 = time.time()
tr = fixtures.transcripts(spark, n_conv=N).persist()
n_turns = tr.count()
print(f"fixture {n_turns} turns {time.time()-t0:.1f}s")

t = time.time()
ut, mem = lifecycle.register_turns(tr)
ut.persist().count(); mem.persist().count()
print(f"register_turns {time.time()-t:.1f}s")

t = time.time()
docs = normalize.conversation_docs(tr).withColumn("exact_fp", F.md5("doc"))
docs = minhash.with_minhash_bands(docs, "doc").persist()
docs.count()
print(f"docs+minhash {time.time()-t:.1f}s")

t = time.time()
exact_edges = blocking.exact_key_pairs(docs, "conv_id", "exact_fp").persist()
exact_edges.count()
print(f"exact_edges {time.time()-t:.1f}s")

t = time.time()
blocks = blocking.bloom_preprune(blocking.explode_blocks(docs, "conv_id", "bands"))
cands = blocking.candidate_pairs(blocks)
cands = cands.join(
    exact_edges.withColumnRenamed("id_a", "ea").withColumnRenamed("id_b", "eb"),
    (F.col("id_a") == F.col("ea")) & (F.col("id_b") == F.col("eb")), "left_anti").persist()
cands.count()
print(f"candidates {time.time()-t:.1f}s")

t = time.time()
scored = scoring.score_pairs(cands, docs.select("conv_id", "doc", "doc_len")).persist()
scored.count()
print(f"scoring {time.time()-t:.1f}s")

t = time.time()
edges = exact_edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).union(
    scored.where("is_dup").select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
cc = clustering.connected_components(edges)
clusters = clustering.clusters_with_singletons(docs.select("conv_id"), cc)
clusters.count()
print(f"cc+clusters {time.time()-t:.1f}s")
print(f"TOTAL {time.time()-t0:.1f}s")
