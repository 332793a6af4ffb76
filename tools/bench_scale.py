#!/usr/bin/env python
"""10x scale probe: replicate sf0.1 facts with disjoint keys and measure
how headline operators scale (wall-clock ratio vs data ratio). Not part
of the driver bench contract (bench.py is); this pins the scaling rows
in BASELINE.md reproducibly, like bench_streaming.py does for streaming.

Replication offsets keys so joins stay realistic; document/embedding
payloads repeat, which makes the dedup workload *dup-heavier* than
sf0.1 (every doc has 10 copies) — a harder, not easier, LSH case.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tigate_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SCALE_DIR", "/tmp/tigate-scale10x")
COPIES = int(os.environ.get("SCALE_COPIES", "10"))
OFF = 1_000_000_000

#: key columns to offset per copy (join keys stay consistent)
OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

QUERIES = [
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q21_waiting_suppliers", "cdc_pipeline_e2e", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "sim_cosine_topk", "embed_kmeans_clusters", "text_quality_score",
    # r05 additions: grouped craft fold, chunk explode, budget window
    "encoder_craft_batch_framed", "text_chunk_documents",
    "sample_source_token_budget",
    # late-r05 curation ops: cell-chunked semantic dedup, broadcast DSIR
    # scoring, broadcast fuzzy-decontamination, single-shuffle global
    # shuffle, lane-window seq protocol
    "dedup_semantic_semdedup", "sample_importance_dsir",
    "decontaminate_fuzzy_minhash", "corpus_shuffle_assign",
    "seq_gap_resets",
    # late-r05: PQ family (grouped Lloyd + broadcast ADC), integer BM25,
    # exact-integer PCA, craft consumer decode (Arrow mapInPandas)
    "embed_pq_encode", "sim_ivfpq_topk", "text_search_bm25_topk",
    "embed_pca_project", "decoder_craft_framed",
    # r06 additions: span-recurrence join, vocab-scale LM score joins,
    # gaps-and-islands merge round, real BMP parse (Arrow mapInPandas)
    "dedup_substring_spans", "text_lm_score", "bpe_merge_apply",
    "multimodal_binary_meta",
    # r07 additions: per-row rule gate, digest-keyed paragraph dedup,
    # K-round trainer (corpus rewrite per round), lane-grouped greedy
    # flush walk
    "text_gopher_quality_flags", "dedup_paragraph_fraction",
    "bpe_train_merges", "sink_txn_flush_batches",
    # r08 additions: batched top-M trainer (one collect + one rewrite
    # per round), digest-window keep-first excision, registry-framed
    # evolution encode (pure column expressions)
    "bpe_train_merges_batched", "dedup_c4_span_excise",
    "encoder_avro_registry_evolution",
    # r10 additions: CSVConfig dialect encode (univocity quoting path),
    # from-spec PNG decode (python-kernel mapInPandas hot path)
    "encoder_csv_configured", "multimodal_png_decode",
    # r11 additions: byte-exact TiDB checksum (crc32-over-concat
    # projection, zero exchange), compressed open wire (Arrow DEFLATE
    # kernel), claim-check fetch-back (broadcast join vs offload store),
    # from-spec JPEG decode (numpy-kernel mapInPandas)
    "projection_checksum_tidb", "encoder_open_compressed",
    "decoder_open_large_message", "multimodal_jpeg_decode",
    # late-r11: LZW + ADPCM decodes and the codec+kernel+dedup
    # composites (only (id, 16-char hash) rows shuffle)
    "multimodal_gif_decode", "multimodal_adpcm_decode",
    "dedup_image_ahash", "dedup_audio_fingerprint",
    # r12 additions: simple-protocol Avro binary wire (pure column
    # expressions; checksum variant composes the CRC fold), the
    # independent-reader consumer (Arrow mapInPandas), and the widened
    # compressed-wire decode with the binary frame parser
    "encoder_simple_avro", "encoder_simple_avro_checksum",
    "decoder_simple_avro", "decoder_open_compressed",
]


#: subset of OFFSETS tables to actually replicate (comma list); others
#: are copied flat — lets the 100x document-family probe skip building
#: a 60M-row lineitem it never reads
TABLES = set((os.environ.get("SCALE_TABLES")
              or ",".join(OFFSETS)).split(","))


def build(spark) -> None:
    stamp = f"copies={COPIES};tables={','.join(sorted(TABLES))}"
    marker = os.path.join(DST, "_BUILT")
    if os.path.isdir(DST) and os.path.exists(marker) \
            and open(marker).read() == stamp:
        return
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    for t in DIMS:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet"))
    for t, keys in OFFSETS.items():
        if t not in TABLES:
            shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                        os.path.join(DST, f"{t}.parquet"))
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        parts = []
        for i in range(COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFF))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # one flat file per table like the source layout (single dir is fine)
        out.coalesce(max(1, COPIES // 2)).write.mode("overwrite").parquet(
            os.path.join(DST, f"{t}.parquet")
        )
    open(marker, "w").write(stamp)


def _stages(spark) -> list:
    """Completed stages off the REST status API (needs spark.ui.enabled)."""
    import urllib.request

    url = spark.sparkContext.uiWebUrl
    if not url:
        return []
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
                f"{url}/api/v1/applications/{app}/stages") as r:
            return json.load(r)
    except Exception:
        return []


def _max_stage_id(spark) -> int:
    return max((s["stageId"] for s in _stages(spark)), default=-1)


def _shuffle_stats(spark, since_stage: int) -> dict:
    """Peak/total shuffle volume across stages newer than ``since_stage``
    — the 'where would a hidden quadratic or hot key surface' number the
    100x probe exists to pin."""
    new = [s for s in _stages(spark) if s["stageId"] > since_stage]
    if not new:
        return {}
    mb = 1e6
    return {
        "peak_stage_shuffle_write_mb": round(
            max(s.get("shuffleWriteBytes", 0) for s in new) / mb, 1),
        "total_shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in new) / mb, 1),
        "peak_stage_shuffle_read_mb": round(
            max(s.get("shuffleReadBytes", 0) for s in new) / mb, 1),
    }


def _join_classes(df) -> dict:
    """BHJ/SMJ counts in the initial physical plan — the size-class
    statement the 100x probe records (a dim that outgrows the broadcast
    threshold at 100x shows up as BHJ→SMJ here)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma list of catalog entries to probe")
    ap.add_argument("--headline", action="store_true",
                    help="probe the bench contract's headline (bench=True) "
                         "queries instead of the QUERIES survey list")
    ap.add_argument("--out", default=None,
                    help="also write the final JSON line to this file "
                         "(the committed BENCH_SCALE_r<N>.json artifact)")
    ap.add_argument("--runs", type=int,
                    default=int(os.environ.get("SCALE_RUNS", "1")),
                    help="timed passes per scale (best-of-N, default 1)")
    args = ap.parse_args()

    want_shuffle = os.environ.get("SCALE_SHUFFLE_METRICS") == "1"
    warm = os.environ.get("SCALE_WARM", "1") == "1"
    spark = get_spark(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={"spark.ui.enabled": "true",
                     "spark.ui.retainedStages": "5000"}
        if want_shuffle else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    from tigate_spark.catalog import get_catalog

    cat = get_catalog()
    results = {}
    names = QUERIES
    if args.headline:
        names = sorted(n for n, s in cat.items() if s.bench)
    if args.only:
        names = args.only.split(",")
    runs = max(1, args.runs)
    for name in names:
        fn = cat[name].builder

        def measure(sf_path):
            if warm:
                fn(spark, sf_path).write.format("noop").mode("overwrite").save()
            before = _max_stage_id(spark) if want_shuffle else -1
            sec = None
            extra = {}
            for i in range(runs):
                t0 = time.time()
                df = fn(spark, sf_path)
                df.write.format("noop").mode("overwrite").save()
                t = time.time() - t0
                sec = t if sec is None else min(sec, t)
                if i == 0 and want_shuffle:
                    # shuffle volume from the FIRST timed pass only —
                    # summing across all N passes would inflate
                    # total_shuffle_write_mb ~N× (r18 self-review)
                    extra = _shuffle_stats(spark, before)
            if want_shuffle:
                extra["joins"] = _join_classes(fn(spark, sf_path))
            return sec, extra

        base, base_extra = measure(SRC)
        scaled, scaled_extra = measure(DST)
        results[name] = {
            "sf0.1_sec": round(base, 2),
            f"{COPIES}x_sec": round(scaled, 2),
            "time_ratio": round(scaled / base, 1) if base > 0 else None,
        }
        if base_extra:
            results[name]["sf0.1"] = base_extra
            results[name][f"{COPIES}x"] = scaled_extra
        print(json.dumps({name: results[name]}), flush=True)
    final = {
        "metric": "scale_probe", "copies": COPIES, "runs": runs,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "results": results,
        # contract-shaped convenience block: the 10x walls per query
        "queries": {n: r[f"{COPIES}x_sec"] for n, r in results.items()},
        "value": round(sum(r[f"{COPIES}x_sec"] for r in results.values()), 3),
        "unit": "sec",
    }
    print(json.dumps(final))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(final, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
