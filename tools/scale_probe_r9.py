"""r9 scale probe (VERDICT r8 #6): 5x/20x exponent rows for the two
r7-late queries SCALE.md still lacked — dictget_customer_enrich (map
literal probes over an amplified customer table) and geo_funcs
(map-only transcendental scan over amplified documents) — plus the
bloom/token-bloom skip-index ATTACH cost (per-batch build seconds vs
the files x bits arithmetic).

Methodology matches tools/scale_smoke.py: amplify sf0.1 N x with
disjoint ids, wall-clock the operator, exponent = log(tB/tA)/log(B/A).
Both ops are map-only and finish under a second at the smoke's usual
5x/20x (fixed job overhead dominates → meaningless exponents), so this
probe defaults to 20x/80x and warms every op shape up at 1x first.

Usage: python tools/scale_probe_r9.py [AMPLIFY ...]  (default: 20 80)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [20, 80]
    ns = [1] + ns  # 1x pass = warm-up (codegen, parquet reader, Arrow)
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from postgre_to_clickhouse_spark.operators.dictionary import Dictionary
    from postgre_to_clickhouse_spark.session import get_spark
    from postgre_to_clickhouse_spark.sinks.manifest import ManifestTable

    spark = get_spark("scale-probe-r9")
    spark.range(1).count()
    out: dict[str, dict] = {}
    cust = spark.read.parquet(os.path.join(src, "customer.parquet"))
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    nat = spark.read.parquet(os.path.join(src, "nation.parquet"))
    reg = spark.read.parquet(os.path.join(src, "region.parquet"))
    c_n, d_n = cust.count(), docs.count()

    for n in ns:
        copies = spark.range(n).withColumnRenamed("id", "copy")
        cust_n = cust.crossJoin(F.broadcast(copies)).select(
            (F.col("c_custkey") + F.col("copy") * c_n).alias("c_custkey"),
            "c_nationkey",
            "c_acctbal",
        )
        docs_n = docs.crossJoin(F.broadcast(copies)).select(
            (F.col("doc_id") + F.col("copy") * d_n).alias("doc_id"), "text"
        )
        rec: dict = {"rows_customer": c_n * n, "rows_documents": d_n * n}

        # -- dictget_customer_enrich body (map-literal probes, no join)
        nation_dict = Dictionary.from_df(nat, "n_nationkey", ["n_name", "n_regionkey"])
        region_dict = Dictionary.from_df(reg, "r_regionkey", ["r_name"])
        tier_dict = Dictionary.from_df(
            nat.filter(F.col("n_nationkey") < 10), "n_nationkey", ["n_name"]
        )
        nkey = F.col("c_nationkey")
        t0 = time.time()
        enriched = cust_n.select(
            region_dict.get("r_name", nation_dict.get("n_regionkey", nkey)).alias("rn"),
            nation_dict.get("n_name", nkey).alias("nn"),
            F.when(tier_dict.has(nkey), F.lit("A")).otherwise(F.lit("B")).alias("tier"),
            "c_acctbal",
        )
        agg = enriched.groupBy("rn", "nn").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("s"),
            F.count(F.when(F.col("tier") == "A", 1)).alias("a"),
        )
        agg.filter("s IS NOT NULL OR a >= 0").count()
        rec["dictget_customer_enrich_s"] = round(time.time() - t0, 2)

        # -- geo_funcs body (map-only transcendental scan)
        lat = ((F.col("doc_id") * 73 % 160) - 80 + 0.5).cast("double")
        lon = ((F.col("doc_id") * 37 % 360) - 180 + 0.5).cast("double")
        plat, plon = 48.8566, 2.3522
        dist = 2 * 6371000.0 * F.asin(F.sqrt(
            F.pow(F.sin(F.radians(lat - plat) / 2), 2)
            + F.cos(F.radians(F.lit(plat))) * F.cos(F.radians(lat))
            * F.pow(F.sin(F.radians(lon - plon) / 2), 2)
        ))
        t0 = time.time()
        g = docs_n.select(
            "doc_id", F.round(dist, 2).alias("dist_m"),
            (lat.between(-10, 40) & lon.between(-20, 60)).alias("bb"),
        )
        g.filter("dist_m >= 0 OR bb IS NOT NULL").count()
        rec["geo_funcs_s"] = round(time.time() - t0, 2)

        # -- bloom + token-bloom attach cost: 4-batch part ingest of the
        # amplified docs, timing the WRITE path (bitset build included)
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix=f"p2c_bloom_cost_{n}x_")
        try:
            t = ManifestTable(
                path, key_col="doc_id", n_buckets=8,
                bloom_cols=("doc_id",), token_bloom_cols=("text",),
            )
            sink = t.append_parts(sort_key=("doc_id", "doc_id"), arrival=("doc_id",))
            t0 = time.time()
            for b in range(4):
                sink(docs_n.filter(F.pmod("doc_id", F.lit(4)) == b), b)
            rec["bloom_ingest_4batch_s"] = round(time.time() - t0, 2)
            m = t.current_manifest()
            rec["bloom_files"] = len(m["files"])
            bits = (
                len(m["files"]) * ManifestTable._BLOOM_BITS
                + len(m["files"]) * ManifestTable._TBLOOM_BITS
            )
            rec["bloom_bitset_bytes_total"] = bits // 8
        finally:
            shutil.rmtree(path, ignore_errors=True)
        out[f"{n}x"] = rec
        print(f"  {n}x: {rec}", file=sys.stderr)

    if len(ns) == 3:  # [warmup, A, B]
        import math

        a, b = out[f"{ns[1]}x"], out[f"{ns[2]}x"]
        ratio = math.log(ns[2] / ns[1])
        for k in ("dictget_customer_enrich_s", "geo_funcs_s", "bloom_ingest_4batch_s"):
            if a[k] > 0:
                out[f"exponent_{k[:-2]}"] = round(math.log(b[k] / a[k]) / ratio, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
