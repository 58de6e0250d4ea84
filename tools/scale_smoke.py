"""Scale smoke: measure how the heavy operators scale when the data
does — the empirical check behind SCALE.md's linearity claims.

Usage: python tools/scale_smoke.py [factor] [op ...]   (default 8, all ops)
Full run over all SMOKE_OPS takes ~10-12 min (each op runs warm twice
at both scales; fuzzy_match_names alone is ~30 s of it). Naming ops
restricts the run — e.g. `python tools/scale_smoke.py 32
fuzzy_match_names dedup_containment` pushes just the worst batch ops
to a higher factor.

Builds a synthetic sf directory at /tmp/kas_scale_x{N} by replicating
sf0.1's big tables N times with id offsets (events: event_id/user_id,
documents: doc_id, embeddings: vec_id — offsets multiply the GROUP
counts, keeping per-group work constant, which is how real corpora
grow), copying the bounded dims as-is. Then times each smoke op once
warm at 1x (sf0.1) and once at Nx, printing per-op wall-clock and the
scaling ratio. A ratio near N is linear scaling; a ratio well above N
flags a superlinear shape that would not survive 100 TB.

Replicated ts stays identical across replicas (more users per hour,
same time span) — the realistic way event volume grows. Embedding
replicas are sign-flipped per replica (disjoint-cluster replication,
r14): each replica is an exact isometric copy of the base space, but
cross-replica similarities collapse to noise, so cluster/block COUNT
grows with the factor while cluster SIZE stays fixture-sized — the
embedding pair-stage smokes now measure the operator, not the
co-clustered-copy combinatorics of naive replication.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from kinesis_adapter_spark import catalog  # noqa: E402
from kinesis_adapter_spark.plans.registry import QUERIES, load_all_modules  # noqa: E402
from kinesis_adapter_spark.session import build_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

# op -> dominant input table (for the report only)
SMOKE_OPS = {
    "sessionize_gap": "events",
    "win_moving_median": "events",
    "rolling_active_users": "events",
    "text_repetition_score": "documents",
    "dedup_near_minhash": "documents",
    "pipeline_text_curation": "documents",
    # dedup_cluster_cc_stars moved to SPECIAL_SMOKES as cc_stars_build
    # (r10): the registry key now serves a fingerprint-staged artifact,
    # so time_op on the key would measure a parquet read — the build is
    # what must scale, and the special smoke drives the core directly
    "sim_topk": "embeddings",
    "dedup_containment": "documents",
    "agg_bitmap_distinct": "events",
    "tfidf_topterms": "documents",
    "contamination_ngram": "documents",
    # r10 (VERDICT r9 item #3): the minhash-signature decontamination
    # probe joins the broadcast benchmark band table against the
    # corpus signature artifact — linear in corpus signatures
    "contamination_minhash": "documents",
    "fuzzy_match_names": "customer",
    "join_asof": "events+orders",
    # streaming maintenance twins (r5, VERDICT item #2): each call
    # stages its own arrival batches from the sf dir, runs the
    # availableNow maintenance stream, then queries the maintained
    # artifact — so the timing covers the whole incremental path, and a
    # superlinear query-time formula (the r4 stop-shingle cap bug)
    # shows up here instead of in production
    "stream_minhash_maintain": "documents",
    "stream_hll_rollup": "events",
    "stream_histogram_rollup": "events",
    # r5 rank-statistic keys: the compressed-value-domain claim —
    # per-value counts shrink the ordered pass to the distinct-value
    # frame, so runtime should grow far slower than the data
    "agg_mann_whitney": "events",
    "agg_ks_test": "events",
    "graph_triangle_count": "lineitem",
    # r6 additions: multimodal raster path (decode cost scales with
    # blob bytes), streaming index maintenance, k-gram duplication
    # accounting, outer stream-stream join, IVM, forward as-of.
    # NOTE (phash keys): replicated doc_ids differ by 10M ≡ 0 mod 200,
    # so cross-replica images are pixel-identical and phash buckets
    # grow to the replica count — output pairs grow ~quadratically in
    # REPLICAS (a harness artifact, same class as the c_name collision
    # fixed above), but buckets stay bounded by the factor so the
    # equi-join cost stays linear-ish; judge ratios accordingly.
    "mm_resize": "documents(media)",
    "dedup_image_phash": "documents(media)",
    "stream_phash_maintain": "documents(media)",
    "text_dup_kgram_fraction": "documents",
    "stream_stream_join_outer": "events",
    "incremental_mv_join": "orders+customer",
    "join_asof_forward": "events+orders",
    "mm_audio_features": "documents(media)",
    "mm_video_frame_extract": "documents(media)",
    "text_bigram_logprob": "documents",
    "agg_weighted_median": "lineitem",
    # NOTE join_spatial_grid: uniform replication multiplies point
    # DENSITY in a fixed area, so true pair count grows with the
    # SQUARE of the factor (measured 64x rows at 8x data; runtime
    # 24x < output growth => per-pair cost constant). Real spatial
    # corpora grow area, not uniform density — same output-linearity
    # class as fuzzy_match_names; judge its ratio against the output
    # count, not the data factor.
    "join_spatial_grid": "events",
    "survival_km": "events",
    # r7: distributed BPE merge training — K type-sized shuffles after
    # one corpus pass; replicated docs share the same word types, so
    # only the corpus pass should grow with the factor
    "vocab_bpe_train": "documents",
    # encode = train (type-sized rounds) + one corpus explode +
    # broadcast vocab join: the corpus pass should dominate growth
    "vocab_bpe_encode": "documents",
    # r8 (r7 directive #4): the four end-of-r7 keys. BM25: one corpus
    # token pass + broadcast stats + TakeOrderedAndProject; winnowing:
    # per-doc window pass + df-capped fingerprint equi-join (the
    # join-shaped one — run at 16x too); RRF: BM25 plan + brute-force
    # cosine, both lists bounded to 50 BEFORE ranking (the r7 fix);
    # target-encode: one (cat,fold) partial-agg — should be flat.
    "text_bm25_topk": "documents",
    "dedup_winnowing": "documents",
    "search_rrf_fusion": "documents+embeddings",
    "mlprep_target_encode_kfold": "orders",
    # r8 second batch: the PQ index family (codebook fit stages on the
    # warm-up; encode is map-only, ADC is broadcast-joins + top-k),
    # the MMR re-rank (one corpus top-20 cut + bounded greedy loop),
    # and the ANN eval (corpus x 8 probes, WindowGroupLimit top-10s)
    "emb_pq_encode": "embeddings",
    "ann_pq_adc_topk": "embeddings",
    # composed index read path: pruned partition scan -> map-only
    # encode -> broadcast ADC -> top-k
    "ann_ivfpq_topk": "embeddings",
    # streaming ingest twin: 3 arrival batches, frozen codebooks,
    # per-batch encode + append; cost is |batch| encode + append
    "stream_pq_maintain": "embeddings",
    # incremental inverted index: per-batch tokenize + two appends;
    # query scores from the maintained dl/postings tiers only
    "stream_bm25_maintain": "documents",
    # end-to-end retrieval: BM25 + dense passes (corpus-sized), then
    # fusion + MMR over <=50-row bounded metadata
    "pipeline_rag_retrieval": "documents+embeddings",
    # keyed-hash sketch family: one distinct/window pass, then
    # |groups| x k bounded metadata (the exact-truth self-join in
    # kmv_intersect is the corpus-sized cost the sketch replaces)
    "agg_kmv_intersect": "events",
    "agg_sampled_quantile": "events",
    # K synchronized rounds, each one (node,label) count shuffle over
    # the edge relation + WindowGroupLimit argmax (pagerank cost model)
    "graph_label_propagation": "lineitem",
    # query-batched two-hop CN/Jaccard: edge-relation equi-joins only;
    # disjoint replicas keep the candidate set FIXED (measured r9:
    # qn/cn identical at 1x and 8x) — the ratio is linear edge work
    "graph_link_prediction": "lineitem",
    # streaming sketch maintenance: per-batch LOCAL bottom-k appends
    # (bounded), query merges stored candidates via the merge law
    "stream_kmv_maintain": "events",
    "search_mmr_rerank": "embeddings",
    "eval_ann_recall": "embeddings",
    # r9 (VERDICT r8 item #4): the two late-r8 keys that landed without
    # a smoke. Both are bounded-output aggregates — l-diversity is one
    # QI-group agg + a broadcast semi-join re-aggregate of failing
    # groups; calibration is a map-only 10-bin agg — expected ~flat.
    "anonymize_l_diversity": "customer",
    "eval_calibration_bins": "orders",
    # r9 new keys: k-core peeling (R edge-sized count shuffles over
    # the repeat-co-purchase graph, disjoint replicas), multi-source
    # BFS (K edge-sized equi-joins; %50 sources replicate per copy),
    # rank-statistic evals (distinct-score domain grows ~linearly),
    # dense-grid-free t-closeness, grid-sized decomposition
    "graph_k_core": "lineitem",
    "graph_bfs_distance": "lineitem+orders",
    "eval_auc_roc": "orders",
    "eval_pr_auc": "orders",
    "anonymize_t_closeness": "customer",
    "ts_seasonal_decompose": "events",
    # r9 second batch: operating-point confusion (3-group agg, flat),
    # Matryoshka truncation recall (probe-bounded corpus passes),
    # point-in-time SCD2 join (as-of union + one keyed window)
    "eval_threshold_confusion": "orders",
    "eval_dim_truncation_recall": "embeddings",
    "join_point_in_time": "events",
    # r9 third batch: power-sum inference (3 numbers per group),
    # median-centered variance test (percentile + broadcast + power
    # sums), compressed-domain CDF integral, artifact-composed
    # per-lang tokenizer fertility (corpus explode + broadcast vocab)
    "agg_anova_oneway": "events",
    "agg_brown_forsythe": "events",
    "drift_wasserstein_1d": "events",
    "vocab_tokenizer_fertility": "documents",
    # r9 fourth batch: scalar rollups of already-smoked component
    # tables (ECE, strength), 6-power-sum CUPED over per-user means,
    # broadcast-anchor hash-ordered negative sampling
    "eval_expected_calibration_error": "orders",
    "ts_seasonal_strength": "events",
    "agg_cuped_variance_reduction": "events",
    "sample_negative_pairs": "embeddings",
    # bounded anchor batch x corpus cosine with label residual — the
    # sim_topk cost model
    "search_hard_negatives": "embeddings",
    # composed experiment readout: bounds pass + per-user means +
    # pooled power sums + 2-arm agg
    "pipeline_ab_test_report": "events",
    # bins pass + one corpus mean-square; correlogram = one rollup +
    # six same-partitioning LAG windows over the grid
    "eval_brier_decomposition": "orders",
    "ts_acf_multi_lag": "events",
    # r10: unigram-LM trainer — one corpus pass into the word-TYPE
    # table, then K mapInPandas Viterbi passes over TYPES with a
    # bounded broadcast vocab; replicated docs share word types, so
    # only the corpus pass should grow with the factor (the BPE class)
    "vocab_unigram_train": "documents",
    # encode = train + one more type-table Viterbi pass + one corpus
    # explode with a broadcast token-count join (the vocab_bpe_encode
    # cost model)
    "vocab_unigram_encode": "documents",
    # fertility = encode with lang carried through the explode,
    # |langs|-group aggregate
    "vocab_unigram_fertility": "documents",
    # r10: SemDeDup composition — Lloyd's fit (K corpus passes), then
    # an intra-cluster pair join whose cost is Σ|cluster|² ≈ n·target
    # (k scales with the corpus, so the join stays linear-in-n), and
    # a |langs|-group audit
    "pipeline_semantic_dedup": "embeddings+documents",
    # r11: CDC snapshot apply — one groupBy(key) max_by fold over the
    # 4-leg changelog union; partial agg combines map-side, expected
    # ~linear in changelog rows
    "cdc_apply_changelog": "orders",
    # r11: clipped n-gram overlap — per-doc gram counts + per-doc
    # equi-joins, linear in corpus grams (doc pairing is 1:1)
    "eval_ngram_overlap_f1": "documents",
    # r11: LSH tuning sweep — the dedup_near_ngram inverted-index pair
    # relation with 12 conditional sums in ONE partial agg; replicated
    # docs multiply pairs per copy (disjoint ids), so expect linear in
    # observed pairs over a fixed-cost floor
    "dedup_lsh_tuning": "documents",
    # r11: chance-corrected agreement — one corpus pass into a
    # |langs|² confusion matrix, then metadata-sized marginal algebra;
    # expected ~flat
    "eval_cohens_kappa": "documents",
    # r11: streaming CDC twin — stages the changelog legs as parquet
    # micro-batches (tombstones first) and folds each into keyed
    # state; per-batch cost is |batch| + |state| folded rows, so
    # expect ~linear in changelog rows over the availableNow fixed cost
    "stream_cdc_apply": "orders",
    # r11: multi-rater agreement — one corpus pass into a (doc, label)
    # cell table, then metadata-sized Fleiss algebra; expected ~flat
    "eval_fleiss_kappa": "documents",
    # r11: Neyman allocation — one power-sum pass, broadcast of the
    # |strata|-row allocation, one stratum-partitioned ranked draw;
    # the window pass is the linear term
    "sample_neyman_allocation": "events",
    # r12 (VERDICT r11 item #6): the Lloyd's trainer itself at the
    # high tiers — K corpus assignment passes (mapInPandas, broadcast
    # k×d centroids) + K partial-agg update passes; expected linear
    # with a per-round job floor (pipeline_semantic_dedup smokes the
    # same core composed with the pair join)
    "emb_kmeans_lloyd": "embeddings",
    # r12: logreg quality-classifier trainer — LOGREG_ITERS corpus
    # passes, each ONE partial agg reduced to 5 counters; expected
    # ~linear in corpus rows with a per-round job floor
    "model_logreg_train": "documents",
    # r12: map-only scoring consumer (train reruns the fit, then one
    # shuffle-free projection) — the train cost model plus one pass
    "model_logreg_score": "documents",
    # r12 second batch: the trained-classifier closed loop — AUC over
    # the scored corpus (compressed-domain rank pass on DISTINCT
    # scores) and the learned quality gate (score+filter ride the
    # scan; only the |langs|-row audit aggregates)
    "eval_model_auc": "documents",
    "pipeline_quality_filter": "documents",
    # r12 third batch: the hierarchical-assignment SemDeDup — the flat
    # key's 100 TB prescription implemented. Assignment is one
    # two-level routing pass, O(n·(√k + k/√k)·d) with k ∝ n, so the
    # quadratic term that dominates the flat key at 64× shrinks to
    # n^1.5; pairs/audit tail identical to pipeline_semantic_dedup
    "pipeline_semantic_dedup_ivf": "embeddings+documents",
    # late-r12: the expanding-join lesson applied registry-wide — the
    # sign-block near-dup pair stage shares the SemDeDup shape
    # (Σ|block|² candidate pairs), so it gets the same smoke coverage
    "dedup_embedding_cosine": "embeddings",
    # r12 third batch: DSIR importance selection — two 256-bucket
    # count passes + one broadcast-join weight pass over the token
    # stream, a distinct-weight threshold window, a w6-partitioned
    # boundary rank; expected ~linear in corpus tokens
    "sample_dsir_importance": "documents",
    # late-r12: pass@k estimator — one partial-agg pass to the
    # (task, n, c) frame, then a map-only combinatorial projection
    # over the bounded task table; expected ~flat
    "eval_pass_at_k": "events",
    # late-r12: corpus BLEU — the ROUGE cost model x4 orders (per-doc
    # gram counts + co-partitioned clip joins), then a |langs|-row
    # projection; expected ~linear in corpus grams
    "eval_bleu_corpus": "documents",
    # r13: the SemDeDup maintain twin — per-arrival-batch routing
    # against the frozen seed artifact (|batch| work) + the shared
    # audit tail over the maintained tier; expect the IVF key's cost
    # model plus the availableNow fixed floor (the stream_cdc class)
    "stream_semdedup_maintain": "embeddings+documents",
    # r13: exact-substring dedup — one token pass expanded to one
    # md5(window) row per position, gram-count aggregation + span
    # join on the 32-byte digest; expected ~linear in corpus tokens
    # (replicated copies multiply owners per gram, not positions)
    "dedup_exact_substring": "documents",
    # r13: Gopher rule gate — one token pass partial-aggregated to
    # per-doc counters + a map-side intersect; expected ~linear
    "quality_gopher_rules": "documents",
    # r13: CCNet tercile bucketing — the unigram-LM scorer (two token
    # passes + token-key probe join) plus one lang-partitioned rank
    # window; expected ~linear in corpus tokens
    "quality_ccnet_buckets": "documents",
}

# (table, id columns to offset, per-replica offset)
_REPLICATE = {
    "events": (("event_id", 1_000_000_000), ("user_id", 1_000_000)),
    "documents": (("doc_id", 10_000_000),),
    # vec_id offset 100M (r14, was 1M): the SemDeDup fixtures inject
    # near-dups at vec_id + 1M, which COLLIDED with replica i+1's base
    # id range at every factor ≥ 2; 100M clears the injection band and
    # still maps to base docs via % 1M (100M ≡ 0 mod 1M)
    "embeddings": (("vec_id", 100_000_000),),
    # FK-consistent replication: user_id/o_custkey/c_custkey share the
    # same per-replica offset so cross-table joins replicate per copy
    # instead of fanning out across copies
    "customer": (("c_custkey", 1_000_000),),
    "orders": (("o_orderkey", 100_000_000), ("o_custkey", 1_000_000)),
    # l_orderkey shares orders' offset (order⋈lineitem joins replicate
    # per copy); l_partkey/l_suppkey offset too so the co-purchase
    # graph replicates as DISJOINT copies — shared parts across
    # replicas would densify the graph and conflate harness combinatorics
    # with operator scaling (same lesson as the c_name collision)
    "lineitem": (
        ("l_orderkey", 100_000_000),
        ("l_partkey", 10_000_000),
        ("l_suppkey", 1_000_000),
    ),
}


def _base_fingerprint() -> str:
    """Identity of the base fixtures the scaled dir derives from: file
    sizes + mtimes of every sf0.1 parquet. If /root/testdata is ever
    regenerated (the DERIVED_VERSION drift class in sources/scans.py),
    the cached replica is invalid and must rebuild — a bare _SUCCESS
    marker would silently measure stale data (ADVICE r4)."""
    parts = [f"replicate:{sorted(_REPLICATE.items())!r}", "emb:signflip-v2"]
    for p in sorted(Path(BASE_SF).glob("*.parquet")):
        st = p.stat()
        parts.append(f"{p.name}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def build_scaled_dir(spark, factor: int) -> str:
    out = Path(f"/tmp/kas_scale_x{factor}")
    marker = out / "_SUCCESS"
    fp = _base_fingerprint()
    if marker.exists() and marker.read_text() == fp:
        return str(out)
    if out.exists():
        import shutil

        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)
    for t in catalog.TABLES:
        src = catalog.load(spark, BASE_SF, t)  # post-canonicalization
        dest = out / f"{t}.parquet"
        if t in _REPLICATE:
            parts = []
            for i in range(factor):
                rep = src
                for col, off in _REPLICATE[t]:
                    rep = rep.withColumn(col, F.col(col) + F.lit(i * off))
                if t == "customer":
                    # vary the name per replica: leaving names identical
                    # would make every name an 8-way collision, and the
                    # CORRECT fuzzy-match output itself grows
                    # quadratically in copies — an artifact of naive
                    # replication, not a property of real corpus growth
                    rep = rep.withColumn(
                        "c_name", F.concat("c_name", F.lit(f"-r{i}"))
                    )
                if t == "embeddings" and i > 0:
                    # DISJOINT-cluster replication (VERDICT r13 item #4):
                    # flip each replica's embedding signs by a
                    # deterministic per-(replica, dim) ±1 mask. Within a
                    # replica the masks cancel (s·s = 1), so every
                    # replica is an EXACT isometric copy — within-replica
                    # cosines, norms, sign blocks, and injected-dup
                    # geometry are bit-identical to the base. ACROSS
                    # replicas the composed mask is random ±1 per dim,
                    # so cross-replica cosines collapse to ~N(0, 1/√d) ≈
                    # 0.125 at d=64, far below every dedup tau — copies
                    # of the same base vector no longer co-cluster.
                    # Group COUNT now grows with the factor while group
                    # SIZE stays fixture-sized, which is how real
                    # corpora grow; the old identical-copy scheme
                    # co-clustered all copies and made the embedding
                    # pair-stage smokes measure their own ∝factor²
                    # combinatorics instead of the operator.
                    sign = lambda idx, _i=i: F.when(  # noqa: E731
                        F.pmod(F.hash(F.lit(_i), idx), F.lit(2)) == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0))
                    rep = rep.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, idx: (x * sign(idx)).cast("float"),
                        ),
                    )
                parts.append(rep)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            df.write.mode("overwrite").parquet(str(dest))
        else:
            src.write.mode("overwrite").parquet(str(dest))
    marker.write_text(fp)
    return str(out)


def time_op(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).collect()  # warm-up / staging
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    return time.perf_counter() - t0


# ---------------------------------------------------------------------------
# Corrected-harness smokes (r6 directive #3): the two ops whose naive
# replication rows measured harness combinatorics, re-measured with
# fixtures that model how their inputs actually grow.
# ---------------------------------------------------------------------------


def smoke_spatial_area(spark, factor: int) -> dict:
    """join_spatial_grid under AREA growth at CONSTANT density — how
    real spatial corpora grow. `factor` shifted copies of the 1× point
    set tile the plane in 16-unit squares (the base coordinate span),
    so point count and area both grow ×factor while local density —
    and with it the per-point candidate load — stays constant. Drives
    the operator's own grid_radius_pairs topology, so the measured
    plan is the executed registry plan; only the fixture differs from
    the registry key's uniform-density replication (which squares the
    true pair count — output-bound, not plan-bound)."""
    import math

    from kinesis_adapter_spark.operators.joins import grid_radius_pairs

    def pairs(n_tiles: int):
        ev = catalog.load(spark, BASE_SF, "events").select("event_id")
        g = max(1, math.isqrt(n_tiles - 1) + 1)
        x0 = ((F.col("event_id") * 7919) % 16000) / 1000.0 - 8.0
        y0 = ((F.col("event_id") * 104729) % 16000) / 1000.0 - 8.0
        tiles = []
        for i in range(n_tiles):
            # same geometry per tile, shifted into a disjoint square;
            # id offset ≡ 0 mod 10 keeps the a/b split per tile intact
            tiles.append(
                ev.select(
                    (F.col("event_id") + F.lit(i * 1_000_000_000)).alias(
                        "event_id"
                    ),
                    (x0 + F.lit(16.0 * (i % g))).alias("x"),
                    (y0 + F.lit(16.0 * (i // g))).alias("y"),
                )
            )
        pts = tiles[0]
        for t in tiles[1:]:
            pts = pts.unionByName(t)
        return grid_radius_pairs(
            pts.filter(F.col("event_id") % 10 == 0),
            pts.filter(F.col("event_id") % 10 == 5),
        )

    n1 = len(pairs(1).collect())  # warm
    t0 = time.perf_counter()
    pairs(1).collect()
    t1 = time.perf_counter() - t0
    nn = len(pairs(factor).collect())  # warm
    t0 = time.perf_counter()
    pairs(factor).collect()
    tn = time.perf_counter() - t0
    return {
        "op": "join_spatial_grid_area",
        "table": "events (area growth, constant density)",
        "t_1x_sec": round(t1, 3),
        f"t_{factor}x_sec": round(tn, 3),
        "ratio": round(tn / t1, 2),
        "factor": factor,
        "pairs_1x": n1,
        f"pairs_{factor}x": nn,
    }


def smoke_ivm_fixed_delta(spark, factor: int, scaled: str) -> dict:
    """incremental_mv_join with a FIXED-size delta while the view grows
    ×factor — the delta ≪ view premise IVM exists for (the registry
    fixture's delta is a fixed 15% of orders, so naive replication
    grew the delta with the view and ratio 19.9 at 16× measured the
    harness, not maintenance). The delta here is built from the 1×
    orders regardless of scale (its keys live in replica 0 of the
    scaled view) and the dim side is the 1× customer (every delta
    custkey resolves there); the op's own apply_mv_delta runs
    unmodified. count() executes the full maintenance plan without
    making driver row-transfer of the view-sized result the thing
    being measured."""
    from kinesis_adapter_spark.operators.incremental import (
        _mv_join_table,
        apply_mv_delta,
    )

    o = catalog.load(spark, BASE_SF, "orders")
    delta = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_custkey",
                F.lit("N").alias("o_orderstatus"),
                "o_totalprice",
            )
        )
    )
    c = catalog.load(spark, BASE_SF, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )

    def run(sf_dir: str) -> int:
        mv_old = spark.read.parquet(_mv_join_table(spark, sf_dir))
        return apply_mv_delta(mv_old, delta, c).count()

    run(BASE_SF)  # warm + stage 1× view
    t0 = time.perf_counter()
    n1 = run(BASE_SF)
    t1 = time.perf_counter() - t0
    run(scaled)  # warm + stage scaled view
    t0 = time.perf_counter()
    nn = run(scaled)
    tn = time.perf_counter() - t0
    return {
        "op": "incremental_mv_fixed_delta",
        "table": "orders+customer (fixed delta, view grows)",
        "t_1x_sec": round(t1, 3),
        f"t_{factor}x_sec": round(tn, 3),
        "ratio": round(tn / t1, 2),
        "factor": factor,
        "rows_1x": n1,
        f"rows_{factor}x": nn,
    }


def _smoke_cc_build(spark, factor: int, scaled: str, core, name: str) -> dict:
    """CC BUILD scaling (r10): the registry keys serve a staged
    artifact, so time_op on them measures a parquet read — this drives
    the contraction/propagation core on the pair fixture directly
    (released_persists, the key's own build guard) at 1× and N×."""
    from kinesis_adapter_spark.operators.curation import _cc_pairs
    from kinesis_adapter_spark.session import released_persists

    def run(sf_dir: str) -> int:
        with released_persists(spark):
            return core(_cc_pairs(spark, sf_dir)).count()

    n1 = run(BASE_SF)  # warm
    t0 = time.perf_counter()
    run(BASE_SF)
    t1 = time.perf_counter() - t0
    nn = run(scaled)  # warm
    t0 = time.perf_counter()
    run(scaled)
    tn = time.perf_counter() - t0
    return {
        "op": name,
        "table": "documents (pair fixture; full build, no staging reuse)",
        "t_1x_sec": round(t1, 3),
        f"t_{factor}x_sec": round(tn, 3),
        "ratio": round(tn / t1, 2),
        "factor": factor,
        "labels_1x": n1,
        f"labels_{factor}x": nn,
    }


def smoke_cc_stars_build(spark, factor: int, scaled: str) -> dict:
    from kinesis_adapter_spark.operators.curation import cc_star_labels

    return _smoke_cc_build(spark, factor, scaled, cc_star_labels, "cc_stars_build")


def smoke_cc_prop_build(spark, factor: int, scaled: str) -> dict:
    from kinesis_adapter_spark.operators.curation import cc_propagate_labels

    return _smoke_cc_build(
        spark, factor, scaled, cc_propagate_labels, "cc_prop_build"
    )


def smoke_minhash_vocab_growth(spark, factor: int, scaled: str) -> dict:
    """dedup_near_minhash under VOCABULARY growth — how real corpora
    grow (r14; closes the r13 'annotated-away' hole in the minhash
    top-tier rows). Uniform document replication re-uses the SAME tiny
    synthetic vocabulary in every replica, so every shingle's df grows
    with the factor and saturates the stop-shingle cap
    (min(1%·n_docs, 64)) — at 128× most shingles are stopped and the
    timed band join got CHEAPER than at 1×, which says nothing about
    real scaling. Here each replica's tokens carry a replica suffix:
    vocabulary (and with it the shingle space) grows with the corpus,
    per-shingle df stays at its 1× profile, cross-replica candidate
    pairs are impossible — group COUNT grows, group size doesn't, the
    same disjoint-growth principle as the r14 sign-flip embedding
    replication. The registry key runs UNMODIFIED on the staged docs
    dir (it loads only documents)."""
    # kas_scale_x prefix => covered by staging.PERSISTENT_CACHES (an
    # intentional cross-run cache, never reaped, bounded per factor)
    out = Path(f"/tmp/kas_scale_x{factor}_minhashvocab")
    marker = out / "_SUCCESS"
    fp = _base_fingerprint() + "|minhashvocab-v1"
    if not (marker.exists() and marker.read_text() == fp):
        if out.exists():
            import shutil

            shutil.rmtree(out)
        out.mkdir(parents=True, exist_ok=True)
        src = catalog.load(spark, BASE_SF, "documents")
        parts = []
        for i in range(factor):
            rep = src.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
            )
            if i > 0:
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda t, _i=i: F.concat(t, F.lit(f"_r{_i}")),
                        ),
                        " ",
                    ),
                )
            parts.append(rep)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(str(out / "documents.parquet"))
        marker.write_text(fp)
    fn = QUERIES["dedup_near_minhash"]
    n1 = fn(spark, BASE_SF).count()  # warm (stages signatures)
    t0 = time.perf_counter()
    fn(spark, BASE_SF).count()
    t1 = time.perf_counter() - t0
    nn = fn(spark, str(out)).count()  # warm
    t0 = time.perf_counter()
    fn(spark, str(out)).count()
    tn = time.perf_counter() - t0
    return {
        "op": "minhash_vocab_growth",
        "table": "documents (replica-suffixed vocabulary)",
        "t_1x_sec": round(t1, 3),
        f"t_{factor}x_sec": round(tn, 3),
        "ratio": round(tn / t1, 2),
        "factor": factor,
        "pairs_1x": n1,
        f"pairs_{factor}x": nn,
    }


def smoke_ivf_cell_local_crossover(spark, factor: int, scaled: str) -> dict:
    """`_ivf_assign_cell_local` ABOVE its threshold (VERDICT r14 next
    #1 — the one r14 feature that shipped with only below-threshold
    evidence): time ONE IVF assignment pass of the ``factor``×-tier
    corpus against seed tables straddling IVF_CELL_LOCAL_K, through
    BOTH paths at every tier.

    Seed construction follows the VERDICT's own recipe: the seed table
    is the scaled corpus sign-flip-replicated (disjoint generations,
    the build_scaled_dir principle — every generation is an isometric
    copy whose cross-generation cosines collapse to noise) and
    dense-renumbered, then routed/written by the PRODUCTION
    _stage_ivf_seed_routing. k values: half the threshold (where the
    artifact path should win — the r14 toy measurement's regime) and
    1.2× the threshold (the regime the cell-local path exists for).
    Each (path, k) cell runs warm-then-timed; both paths' assignment
    maps are checksummed and must agree (the equivalence pytest's
    pin, re-verified at this scale)."""
    import os

    from pyspark.sql import Window

    from kinesis_adapter_spark.operators import embeddings_ops as eo

    e = (
        spark.read.parquet(str(Path(scaled) / "embeddings.parquet"))
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("x"),
        )
    )
    n_corpus = e.count()
    thr = eo.IVF_CELL_LOCAL_K
    # r16 (VERDICT r15 next #3): a deep-below-crossover tier (thr//5)
    # joins the two r14 tiers so the DYNAMIC rows-per-task rule can be
    # checked against the measured winner in BOTH regimes — the
    # artifact-wins regime and the cell-local-wins regime.
    k_tiers = [thr // 5, thr // 2, int(thr * 1.2)]
    k_max = max(k_tiers)
    n_tasks = e.rdd.getNumPartitions()
    thr_dyn = eo._ivf_cell_local_threshold(n_corpus, n_tasks)

    # seed source: enough sign-flip generations of the corpus to cover
    # k_max, dense-renumbered (row_number over a deterministic order —
    # a one-task sort of seed-sized metadata, untimed staging)
    gens = -(-int(k_max * 1.05) // n_corpus)
    parts = []
    for g in range(gens):
        rep = e
        if g > 0:
            sign = lambda idx, _g=g: F.when(  # noqa: E731
                F.pmod(F.hash(F.lit(1000 + _g), idx), F.lit(2)) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            rep = rep.withColumn(
                "x", F.transform("x", lambda x, idx: x * sign(idx))
            )
        parts.append(rep.withColumn("gen", F.lit(g)))
    seed_src = parts[0]
    for p in parts[1:]:
        seed_src = seed_src.unionByName(p)
    seed_src = seed_src.select(
        (
            F.row_number().over(Window.orderBy("gen", "vec_id")) - 1
        ).alias("vec_id"),
        "x",
    )

    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cluster").alias("s"),
            F.sum(
                F.crc32(F.concat_ws(",", "vec_id", "cluster"))
            ).alias("h"),
        ).collect()[0]
        return (row["n"], int(row["s"]), int(row["h"]))

    rows = []
    agree = True
    for k in k_tiers:
        import math

        kc = max(2, int(math.floor(math.sqrt(float(k)))))
        art = Path(f"/tmp/kas_scale_x{factor}_ivfseed_k{k}")
        marker = art / "_SUCCESS_SMOKE"
        fp = _base_fingerprint() + f"|ivfseed-v1|k{k}"
        if not (marker.exists() and marker.read_text() == fp):
            if art.exists():
                import shutil

                shutil.rmtree(art)
            eo._stage_ivf_seed_routing(seed_src, k, kc, str(art))
            marker.write_text(fp)
        timings = {}
        sums = {}
        for path_name in ("artifact", "cell_local"):
            saved = eo.IVF_CELL_LOCAL_K
            if path_name == "artifact":
                eo.IVF_CELL_LOCAL_K = 1 << 60
            else:
                os.environ["KAS_IVF_CELL_LOCAL"] = "force"
            try:
                fn = lambda: checksum(  # noqa: E731
                    eo._ivf_two_level_assign(e, k, kc, seed_table=str(art))
                )
                sums[path_name] = fn()  # warm (page cache, codegen)
                t0 = time.perf_counter()
                fn()
                timings[path_name] = round(time.perf_counter() - t0, 3)
            finally:
                eo.IVF_CELL_LOCAL_K = saved
                os.environ.pop("KAS_IVF_CELL_LOCAL", None)
        same = sums["artifact"] == sums["cell_local"]
        agree = agree and same
        dyn_pick = "cell_local" if k >= thr_dyn else "artifact"
        measured_winner = min(timings, key=timings.get)
        rows.append(
            {
                "k": k,
                "kc": kc,
                "artifact_sec": timings["artifact"],
                "cell_local_sec": timings["cell_local"],
                "cell_local_over_artifact": round(
                    timings["cell_local"] / timings["artifact"], 3
                ),
                "dyn_pick": dyn_pick,
                "measured_winner": measured_winner,
                "dyn_picks_winner": dyn_pick == measured_winner,
                "paths_agree": same,
                "n_assigned": sums["artifact"][0],
            }
        )
        print(json.dumps({"op": "ivf_cell_local_tier", **rows[-1]}))
    above = rows[-1]
    return {
        "op": "ivf_cell_local_crossover",
        "table": "embeddings (sign-flip seed generations)",
        "t_1x_sec": above["artifact_sec"],
        f"t_{factor}x_sec": above["cell_local_sec"],
        # <1.0 ⇒ the cell-local path WINS above the threshold
        "ratio": above["cell_local_over_artifact"],
        "factor": factor,
        "n_corpus": n_corpus,
        "n_tasks": n_tasks,
        "dyn_threshold": thr_dyn,
        "dyn_picks_winner_all_tiers": all(r["dyn_picks_winner"] for r in rows),
        "tiers": rows,
        "paths_agree": agree,
    }


SPECIAL_SMOKES = {
    "join_spatial_grid_area": lambda spark, factor, scaled: smoke_spatial_area(
        spark, factor
    ),
    "incremental_mv_fixed_delta": smoke_ivm_fixed_delta,
    "cc_stars_build": smoke_cc_stars_build,
    "cc_prop_build": smoke_cc_prop_build,
    "minhash_vocab_growth": smoke_minhash_vocab_growth,
    "ivf_cell_local_crossover": smoke_ivf_cell_local_crossover,
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = set(sys.argv[2:])
    unknown = only - set(SMOKE_OPS) - set(SPECIAL_SMOKES)
    if unknown:
        raise SystemExit(f"unknown smoke ops: {sorted(unknown)}")
    ops = {k: v for k, v in SMOKE_OPS.items() if not only or k in only}
    specials = [k for k in SPECIAL_SMOKES if not only or k in only]
    spark = build_spark(app_name="kas-scale-smoke")
    load_all_modules()
    scaled = build_scaled_dir(spark, factor)
    report = []
    for sp in specials:
        report.append(SPECIAL_SMOKES[sp](spark, factor, scaled))
        print(json.dumps(report[-1]))
    for op, table in ops.items():
        t1 = time_op(QUERIES[op], spark, BASE_SF)
        tn = time_op(QUERIES[op], spark, scaled)
        report.append(
            {
                "op": op,
                "table": table,
                "t_1x_sec": round(t1, 3),
                f"t_{factor}x_sec": round(tn, 3),
                "ratio": round(tn / t1, 2),
                "factor": factor,
            }
        )
        print(json.dumps(report[-1]))
    worst = max(report, key=lambda r: r["ratio"])
    print(
        json.dumps(
            {
                "summary": "scale_smoke",
                "factor": factor,
                "worst_op": worst["op"],
                "worst_ratio": worst["ratio"],
                "linear_bound": factor * 1.5,
                "pass": worst["ratio"] <= factor * 1.5,
            }
        )
    )


if __name__ == "__main__":
    main()
