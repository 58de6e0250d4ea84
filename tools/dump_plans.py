"""Regenerate PLANS.md: formatted physical plans of flagship queries.

Usage: python tools/dump_plans.py   (writes PLANS.md at the repo root)

Each entry is the ``explain('formatted')`` output at sf0.01 with a
one-line note on what the plan must show. Evidence companion to
SCALE.md: that file claims the shapes, this one shows them.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from kinesis_adapter_spark.plans.registry import QUERIES, load_all_modules  # noqa: E402
from kinesis_adapter_spark.session import build_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# key -> what to look for in the plan
SHOWCASE = {
    "incremental_mv_join": (
        "IVM: zero Exchange hashpartitioning — the staged view flows "
        "map-side; delta join and anti-join both broadcast"
    ),
    "dedup_image_phash": (
        "map-only mapInPandas decode+hash, then an equi self-join on "
        "the 16-char hash — pixels shuffle nowhere"
    ),
    "q6_forecast_revenue": (
        "all predicates in PushedFilters; 4-column ReadSchema; "
        "partial+final HashAggregate around a single-row exchange"
    ),
    "q3_shipping_priority": (
        "customer broadcast under the fact join; TakeOrderedAndProject "
        "instead of a global sort"
    ),
    "q18_large_orders": (
        "aggregate-before-join: lineitem HashAggregate feeds the joins, "
        "never the reverse"
    ),
    "q19_disjunctive_predicates": (
        "CNF residuals pushed to both scans while the OR-of-ANDs stays "
        "as the join filter"
    ),
    "join_bucket_colocated": (
        "no Exchange hashpartitioning — the shuffle was paid at "
        "bucket-write time"
    ),
    "agg_salted_skew": (
        "two HashAggregate pairs: partial over (key, salt), final over key"
    ),
    "scd2_intervals": (
        "both Window operators above ONE Exchange hashpartitioning"
    ),
    "merge_upsert": (
        "left-anti BroadcastHashJoin carrying only change-set keys, "
        "then a union"
    ),
    "contamination_ngram": (
        "benchmark gram set behind BroadcastExchange; fact side never "
        "shuffles before the join"
    ),
    "sim_topk": (
        "BroadcastNestedLoopJoin on the 1-row query vector; "
        "TakeOrderedAndProject top-k"
    ),
    "dedup_near_minhash": (
        "probe reads ONLY the staged signature parquet (no documents "
        "scan, no shingle recompute); column pruning splits the reads — "
        "band join scans (doc_id, h*), verify scans (doc_id, sh)"
    ),
    "dedup_exact_substring": (
        "r14 rolling-hash map stage: one JVM token pass (xxhash64 per "
        "token) into a single MapInPandas emitting (doc_id, h1, h2) — "
        "16 B/position keys, no O(n·L) window re-serialization; the "
        "tail is digest-keyed partial aggs + one left equi-join"
    ),
    "ann_ivf_partitioned": (
        "PartitionFilters: cell IN (nprobe ids) on the written IVF "
        "layout — the scan lists only the probed cell directories"
    ),
    "join_dpp_prune": (
        "dynamicpruningexpression in the partitioned fact scan's "
        "PartitionFilters — the runtime filter DPP injected from the "
        "aggregate-threshold dim side"
    ),
    "sample_weighted_hash": (
        "weighted score as a map-side Project; TakeOrderedAndProject "
        "top-k — no global sort of the corpus"
    ),
    "ts_anomaly_zscore": (
        "partial+final HashAggregate collapse events to the (type, "
        "hour) grid BEFORE the stats Window — the window shuffles the "
        "rolled-up grid, never raw events"
    ),
    "delete_propagate": (
        "each table audited in one pass: broadcast left join against "
        "the tombstone set feeding a single HashAggregate"
    ),
    "q4_order_priority": (
        "EXISTS as ONE left-semi hash join on l_orderkey with the "
        "cross-table date comparison as residual — no fan-out+distinct"
    ),
    "q21_waiting_supplier": (
        "semi join (multi-supplier orders) + anti self-join of the "
        "late set, both hashed on l_orderkey with the supplier "
        "inequality as residual"
    ),
    # round-4 additions
    "dedup_containment": (
        "inverted-index equi-join on the shingle key (BHJ/SMJ, never "
        "CartesianProduct); the only nested-loop is the 1-row "
        "corpus-count broadcast of the stop-shingle cap"
    ),
    "pipeline_text_curation": (
        "quality filter fused into the scan projection; ONE exchange "
        "for the md5 dedup window + ONE for the (split, lang) "
        "aggregate — the 3-stage logical pipeline compiles to 2 "
        "exchanges"
    ),
    "join_lateral_topn": (
        "correlated LATERAL decorrelated to hash join + Window with "
        "WindowGroupLimit rank-pushdown — no per-outer-row subquery "
        "re-execution"
    ),
    "text_repetition_score": (
        "two stacked partial+final HashAggregate pairs; the token-"
        "scale shuffle carries (doc_id, word, partial-count), the "
        "second tier reuses the doc_id clustering"
    ),
    "quality_quantile_gate": (
        "one hashpartitioning exchange on lang feeding the "
        "percent_rank window; shuffle carries (doc_id, lang, quality) "
        "only — no text column"
    ),
    "user_streak_days": (
        "distinct DAU tier then island window, per-user aggregate and "
        "best-streak window all on the same user_id partitioning — "
        "at most 2 user_id exchanges, none on day/grp"
    ),
    "agg_weighted_stats": (
        "partial+final HashAggregate around one group-key exchange; "
        "the three weighted SUMs combine map-side"
    ),
    "agg_multi_distinct": (
        "Expand replicating rows per distinct column into a two-phase "
        "aggregate — one pass, no self-join per COUNT(DISTINCT)"
    ),
    "sql_surface_scalar_subquery": (
        "correlated scalar subqueries + EXISTS decorrelated to three "
        "straight joins (aggregate+outer, aggregate+outer, semi) — "
        "no ScalarSubquery node, no per-row re-execution"
    ),
    "ts_interpolate_linear": (
        "grid explode, left join, and all four prev/next ignorenulls "
        "windows share the user_id partitioning — no per-window "
        "re-shuffle"
    ),
    "join_cbo_reorder": (
        "ANALYZEd catalog tables: rowCount statistics drive the join "
        "order and both stats-sized dim sides broadcast"
    ),
    "plan_reuse_exchange": (
        "ReusedExchange: top and bottom branches consume ONE "
        "aggregation — a single events scan feeds both"
    ),
    "graph_triangle_count": (
        "degree-oriented adjacency intersection: equi-joins on src/dst "
        "with map-side array_intersect — no wedge-row materialization, "
        "no cartesian anywhere"
    ),
    "contamination_minhash": (
        "benchmark side broadcast into both the band join and the "
        "exact-Jaccard verify; probe reads only the signature artifact"
    ),
    # round-9 additions
    "graph_k_core": (
        "R single-reference peel rounds: each round ONE count "
        "aggregate over the edge relation joined to the previous "
        "alive set — linear plan growth (scan count pinned), no "
        "core-vs-itself self-join"
    ),
    "join_point_in_time": (
        "interval containment degenerated to as-of: union + ONE "
        "(user, t) sort window with last(ignorenulls) — no "
        "BroadcastNestedLoopJoin, no range join"
    ),
    "eval_auc_roc": (
        "compressed-domain rank statistic: partial+final "
        "HashAggregate collapse the corpus to distinct scores BEFORE "
        "the cumulative window; integer doubled-rank arithmetic to "
        "one final division"
    ),
    "anonymize_t_closeness": (
        "global sensitive-frequency table behind BroadcastExchange; "
        "TVD via the absent-category complement — no dense "
        "group x category grid anywhere"
    ),
    # r10 additions
    "pipeline_semantic_dedup": (
        "SemDeDup post-fit plan: intra-cluster pairs are ONE "
        "per-cluster vectorized scan (FlatMapGroupsInPandas on the "
        "cluster key — BLAS matmul inside, no CartesianProduct, no "
        "row-expanding self-join), and the persisted meta frame "
        "feeds the pair scan AND the audit base from "
        "InMemoryTableScan (one compute)"
    ),
    "skew_key_report": (
        "frequency tier materialized once (checkpoint boundary); "
        "downstream top-5 via TakeOrderedAndProject with zero "
        "re-shuffles of the tier"
    ),
    "vocab_unigram_encode": (
        "consumer half of the unigram trainer: one corpus explode "
        "joined to the vocabulary-sized token-count table via "
        "BroadcastExchange, then a per-doc partial+final aggregate — "
        "no type-sized training shuffle in the read path"
    ),
    # r11 additions
    "cdc_apply_changelog": (
        "CDC fold: ONE SortAggregate pair (string max_by buffers "
        "disable hash agg; the partial instance still folds map-side "
        "before the key exchange, so the shuffle carries folded rows "
        "not changelog rows) — no Window anywhere"
    ),
    "eval_ngram_overlap_f1": (
        "clipped ROUGE overlap: per-order gram-count aggregates and "
        "(doc_id, g) equi-joins — SortMergeJoin/hash join on keys, "
        "no CartesianProduct; the ref/cand legs of each order share "
        "the exploded pair scan"
    ),
    "pipeline_quality_filter": (
        "learned quality gate: score+filter ride the documents scan "
        "map-side; exactly ONE Exchange hashpartitioning (the "
        "|langs|-row audit aggregate, partial-combined before it)"
    ),
    # r12 addition
    "model_logreg_score": (
        "map-only classifier scoring: fitted weights folded in as "
        "literals, one Project over the documents scan — zero "
        "Exchange (the production shape: the classifier rides the "
        "scan at 100 TB)"
    ),
    # late-r12 additions
    "pipeline_semantic_dedup_ivf": (
        "hierarchical SemDeDup: assignment is ONE MapInPandas routing "
        "pass (two-level coarse/fine argmin inside — no per-cell job "
        "loop), then the flat key's post-fit shape verbatim: "
        "per-cluster vectorized pair scan, persisted meta read from "
        "InMemoryTableScan"
    ),
    "sample_dsir_importance": (
        "DSIR selection: the 256-row log-ratio table reaches the "
        "token stream via BroadcastHashJoin on the bucket key; the "
        "only SinglePartition window runs over the DISTINCT-weight "
        "aggregate (compressed-domain threshold), and the boundary "
        "rank window is partitioned by weight class"
    ),
}

# keys whose registry function materializes a bounded result and
# returns a local frame (cache-hygiene pattern) — showcase the lazy
# inner plan helper instead of the LocalTableScan
LAZY_PLAN = {
    "q21_waiting_supplier": lambda spark: __import__(
        "kinesis_adapter_spark.operators.analytics", fromlist=["_q21_plan"]
    )._q21_plan(spark, SF),
    "pipeline_semantic_dedup": lambda spark: __import__(
        "kinesis_adapter_spark.operators.embeddings_ops",
        fromlist=["_semantic_dedup_plan"],
    )._semantic_dedup_plan(spark, SF),
    "skew_key_report": lambda spark: __import__(
        "kinesis_adapter_spark.operators.analytics",
        fromlist=["_skew_report_plan"],
    )._skew_report_plan(spark, SF),
    "pipeline_semantic_dedup_ivf": lambda spark: __import__(
        "kinesis_adapter_spark.operators.embeddings_ops",
        fromlist=["_semantic_dedup_plan"],
    )._semantic_dedup_plan(spark, SF, ivf=True),
}


def main() -> None:
    load_all_modules()
    spark = build_spark()
    out = [
        "# PLANS — physical plans of the flagship queries (generated)",
        "",
        f"Regenerate with `python tools/dump_plans.py` (sf0.01, "
        f"local mode). Companion evidence for SCALE.md: each plan is "
        f"annotated with the property it must exhibit.",
        "",
    ]
    for key, note in SHOWCASE.items():
        handle = None
        if key in LAZY_PLAN:
            df = LAZY_PLAN[key](spark)
            if isinstance(df, tuple):  # (plan, cache handle) helpers
                df, handle = df
        else:
            df = QUERIES[key](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        if handle is not None:  # release after the explain captured it
            handle.unpersist()
        out.append(f"## {key}")
        out.append("")
        out.append(f"**Must show:** {note}")
        out.append("")
        out.append("```")
        out.append(buf.getvalue().rstrip())
        out.append("```")
        out.append("")
    (ROOT / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {ROOT / 'PLANS.md'} ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
