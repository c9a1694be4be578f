"""r17 scaling datapoint: heavy queries at sf1.0, cores from argv."""
import os, sys, time
sys.path.insert(0, "/root/repo")
cpus = sys.argv[1]
os.environ["SPARK_GRAFT_CPUS"] = cpus
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
from postgre_to_clickhouse_spark.queries import QUERIES
from postgre_to_clickhouse_spark.session import get_spark
from bench import FORCE_EVAL
spark = get_spark(f"scale-r17-{cpus}")
print("master", spark.sparkContext.master, "defaultParallelism", spark.sparkContext.defaultParallelism)
spark.range(1).count()
spark.read.parquet(os.path.join(sf_dir,"lineitem.parquet")).count()
par = spark.sparkContext.defaultParallelism
def _ident(b):
    yield from b
spark.range(par).repartition(par).mapInPandas(_ident, schema="id long").count()
NAMES = ["exact_substr_spans","suffix_array_rank","suffix_lcp_rank",
         "levenshtein_near_match","manifest_projection_read","dedup_components_knn"]
for name in NAMES:
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        if name in FORCE_EVAL: df = df.filter(FORCE_EVAL[name])
        n = df.count()
        ts.append(round(time.perf_counter()-t0,3))
    print(f"RESULT cpus={cpus} {name}: cold={ts[0]} warm={ts[1:]} warm_min={min(ts[1:])} rows={n}", flush=True)
spark.stop()
