#!/usr/bin/env python3
"""10× scale-stress: generate a deterministic sf1-equivalent from sf0.1,
run the heaviest queries + the wired dedup chain at both scales, and
record per-query scaling ratios (SCALE_r6.json).

Purpose: catch fixed constants and accidental quadratic blow-ups BEFORE a
real cluster would — the cheapest local probe of the 100 TB posture. A
scale-path query should grow ~linearly in input size (ratio ≲ 10–15 on a
10× corpus, allowing shuffle/odometer overheads); the deliberately-bounded
all-pairs baselines (D2/D14) are excluded by design — they are documented
as NOT the scale path.

Replication is DECORRELATED so dedup/similarity semantics scale linearly
rather than quadratically (10 byte-identical copies of every doc would
turn each into a 10-clique in the candidate graph — a 45× pair blow-up
that says nothing about real scaling):

- documents: replica k rewrites every non-final token by suffixing the
  replica tag to it (space → "k ", so "foo bar" → "fook bar"), making
  cross-replica shingle Jaccard ≈ 0 while each replica keeps the
  corpus's internal planted-dup structure verbatim.
- embeddings: replica k sign-flips a k-dependent dimension pattern
  (deterministic ±1 mask), decorrelating cross-replica cosine while
  preserving norms and within-replica planted copies.
- events: event_id/user_id shifted per replica — 10× tasks over the same
  8-executor/4-app grid (same cluster, more traffic).
- orders/lineitem: orderkey-shifted replicas (custkey/suppkey/partkey
  unchanged: more orders per entity, the realistic growth axis).
- region/nation/customer/supplier/part: copied (dimensions don't scale).

Usage: python tools/scale_stress.py [OUT_JSON] [BASE_SF_DIR] [SCALE_DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from guidance_for_analytics_observability_on_aws_spark.plans.registry import (  # noqa: E402
    REGISTRY,
)
from guidance_for_analytics_observability_on_aws_spark.session import get_spark  # noqa: E402

REPLICAS = 10
COPY_TABLES = ("region", "nation", "customer", "supplier", "part")

#: The steady-state heaviest bench queries + the wired dedup chain
#: (D3 → D15 → P15) + the iterative/distributed shapes most likely to
#: hide a fixed constant.
HEAVY = [
    "dedup_minhash_lsh",
    "dedup_containment_banded",
    "dup_groups_star",
    "dup_groups",
    "corpus_curation_pipeline_v2",
    "dedup_minhash_estimate",
    "similarity_pq",
    "similarity_ivf_pq_residual",
    "obs_batch_flush",
    "obs_task_percentiles_distributed",
    "tpch_q21_waiting_supplier",
    "tpch_q9_profit",
    "text_tfidf_topk",
    "pack_sequences_distributed",
    "events_rolling_wau",
]


def generate(spark: SparkSession, base: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copyfile(f"{base}/{t}.parquet", f"{dst}/{t}.parquet")

    def reps(df, transform):
        out = None
        for k in range(REPLICAS):
            part = transform(df, k)
            out = part if out is None else out.unionByName(part)
        return out

    ev = spark.read.parquet(f"{base}/events.parquet")
    reps(
        ev,
        lambda df, k: df.select(
            (F.col("event_id") + k * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + k * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    ).coalesce(8).write.mode("overwrite").parquet(f"{dst}/_events")

    docs = spark.read.parquet(f"{base}/documents.parquet")
    reps(
        docs,
        lambda df, k: df.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            (
                F.col("text")
                if k == 0
                else F.regexp_replace("text", " ", f"{k} ")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        ),
    ).coalesce(8).write.mode("overwrite").parquet(f"{dst}/_documents")

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    # Flip mask ((i+1)*(k+1)) % 11 < 5: k+1 ∈ [2, 10] is never ≡ 0 mod 11,
    # so every replica's mask mixes signs (no fully-negated copy) and all
    # masks are pairwise distinct (no byte-identical replica pair).
    reps(
        emb,
        lambda df, k: df.select(
            (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
            (
                F.col("embedding")
                if k == 0
                else F.expr(
                    f"transform(embedding, (x, i) -> CAST(x * (CASE WHEN (i + 1) * {k + 1} % 11 < 5 THEN -1.0 ELSE 1.0 END) AS float))"
                )
            ).alias("embedding"),
            "label",
        ),
    ).coalesce(4).write.mode("overwrite").parquet(f"{dst}/_embeddings")

    orders = spark.read.parquet(f"{base}/orders.parquet")
    reps(
        orders,
        lambda df, k: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + k * 100_000_000
        ),
    ).coalesce(8).write.mode("overwrite").parquet(f"{dst}/_orders")

    li = spark.read.parquet(f"{base}/lineitem.parquet")
    reps(
        li,
        lambda df, k: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + k * 100_000_000
        ),
    ).coalesce(16).write.mode("overwrite").parquet(f"{dst}/_lineitem")

    # Collapse each multi-file dataset to the single-file layout the
    # loaders expect (<table>.parquet as ONE file path).
    import glob

    for t in ("events", "documents", "embeddings", "orders", "lineitem"):
        spark.read.parquet(f"{dst}/_{t}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{dst}/_{t}_one")
        part = glob.glob(f"{dst}/_{t}_one/part-*.parquet")[0]
        shutil.move(part, f"{dst}/{t}.parquet")
        shutil.rmtree(f"{dst}/_{t}")
        shutil.rmtree(f"{dst}/_{t}_one")


def timed(spark: SparkSession, name: str, sf: str) -> tuple[float, int]:
    t0 = time.perf_counter()
    df = REGISTRY[name].builder(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    return round(sec, 3), df.count()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE.json"
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "sf1",
    )
    spark = get_spark("gfaooa-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{dst}/lineitem.parquet"):
        print("generating 10x dataset ...", file=sys.stderr)
        generate(spark, base, dst)
    # warm codegen families once per scale so timings compare steady state
    for warm_sf in (base, dst):
        for warm in ("obs_cardinality", "docs_stats_by_source", "similarity_ivf"):
            REGISTRY[warm].builder(spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
    results = {}
    for name in HEAVY:
        b_sec, _ = timed(spark, name, base)
        x_sec, x_rows = timed(spark, name, dst)
        ratio = round(x_sec / b_sec, 2) if b_sec > 0 else None
        results[name] = {
            "base_sec": b_sec,
            "x10_sec": x_sec,
            "ratio": ratio,
            "x10_rows": x_rows,
        }
        print(f"  {name}: {b_sec}s -> {x_sec}s (x{ratio})", file=sys.stderr)
    payload = {
        "metric": "scale_stress_10x",
        "base_sf_dir": base,
        "scale_dir": dst,
        "replicas": REPLICAS,
        "queries": results,
        "sum_base_sec": round(sum(r["base_sec"] for r in results.values()), 3),
        "sum_x10_sec": round(sum(r["x10_sec"] for r in results.values()), 3),
    }
    payload["sum_ratio"] = round(
        payload["sum_x10_sec"] / payload["sum_base_sec"], 2
    )
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
