import sys, time, os
tree = sys.argv[1]
sys.path.insert(0, tree)
os.chdir(tree)
from dask_patternsearch_spark.queries import all_queries
from dask_patternsearch_spark.session import get_spark
spark = get_spark("ab-canon")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
fn = all_queries()["canonicalize_corpus"]
fn(spark, SF).count()  # warm-up (JIT/codegen/worker pool)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    fn(spark, SF).count()
    ts.append(time.perf_counter() - t0)
print(f"RESULT {tree} median={sorted(ts)[1]:.3f} runs={[round(t,2) for t in ts]}")
spark.stop()
