# plan inspection: pushdown, broadcast, codegen spans
import importlib, sys
for m in sorted([m for m in sys.modules if m.startswith("dedupe_spark")], key=lambda s: -s.count(".")):
    importlib.reload(sys.modules[m])
import __spark_entry__ as em
importlib.reload(em)

SF = "/root/testdata/sf0.01"

print("===== q01 pricing summary (pushdown check) =====")
em.q01_pricing_summary(spark, SF).explain("formatted")

print("===== q03 broadcast chain =====")
em.q03_region_customer_counts(spark, SF).explain("formatted")

print("===== q21 minhash lsh pairs =====")
em.q21_minhash_lsh_pairs(spark, SF).explain("formatted")
