"""Property-based cross-engine checks (SURVEY.md §5.5): hypothesis
generates random predicate/aggregation shapes; the SAME SQL text runs
through Spark (`F.expr` over the DataFrame) and DuckDB, and results
must agree exactly. This fuzzes the expression-semantics surface the
hand-written keys can't enumerate (operator precedence, null
propagation, numeric comparison edges).
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

from tests.oracle import SF_FAST, duck_connect

_leaf = st.one_of(
    st.tuples(
        st.just("o_totalprice"),
        st.sampled_from(["<", "<=", ">", ">="]),
        st.floats(min_value=1000, max_value=500000, allow_nan=False).map(
            lambda x: f"{x:.2f}"
        ),
    ).map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
    st.tuples(st.integers(2, 7), st.integers(0, 6)).map(
        lambda t: f"(o_custkey % {t[0]} = {t[1] % t[0]})"
    ),
    st.sampled_from(["O", "F", "P"]).map(lambda s: f"(o_orderstatus = '{s}')"),
    st.integers(1, 11).map(lambda m: f"(month(o_orderdate) = {m})"),
    # three-valued logic: nullif injects NULLs that must propagate
    # identically through comparisons and boolean operators
    st.sampled_from(["O", "F"]).map(
        lambda s: f"(nullif(o_orderstatus, '{s}') = 'P')"
    ),
    st.sampled_from(["IS NULL", "IS NOT NULL"]).map(
        lambda op: f"(nullif(o_orderstatus, 'O') {op})"
    ),
)


@st.composite
def predicates(draw):
    n = draw(st.integers(1, 3))
    parts = [draw(_leaf) for _ in range(n)]
    expr = parts[0]
    for p in parts[1:]:
        op = draw(st.sampled_from(["AND", "OR"]))
        neg = draw(st.booleans())
        expr = f"({expr} {op} {'NOT ' if neg else ''}{p})"
    return expr


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_FAST)
    yield con
    con.close()


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_FAST}/orders.parquet")


@settings(
    max_examples=25, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(pred=predicates())
def test_random_filters_agree(spark, duck, orders, pred):
    n_spark = orders.filter(F.expr(pred)).count()
    n_duck = duck.execute(f"SELECT COUNT(*) FROM orders WHERE {pred}").fetchone()[0]
    assert n_spark == n_duck, pred


@settings(
    max_examples=15, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    pred=predicates(),
    key=st.sampled_from(["o_orderstatus", "o_custkey % 10", "year(o_orderdate)"]),
)
def test_random_grouped_aggregates_agree(spark, duck, orders, pred, key):
    sql = (
        f"SELECT {key} AS k, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS s "
        f"FROM orders WHERE {pred} GROUP BY {key}"
    )
    got = {
        tuple(r)
        for r in orders.filter(F.expr(pred))
        .groupBy(F.expr(key).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .collect()
    }
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, sql


@settings(
    max_examples=20, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(x=st.integers(0, 10**9), y=st.integers(0, 10**9))
def test_zorder_key_formula_agrees(spark, duck, x, y):
    """The Morton-interleave expression (cluster_zorder) must compute
    bit-identically across engines for arbitrary key values — the
    z-key is a layout contract, so a single differing bit silently
    reorders the written files."""
    from kinesis_adapter_spark.operators.scaleops import _ZKEY_SQL

    expr = _ZKEY_SQL.replace("o_custkey", str(x)).replace("o_orderkey", str(y))
    z_spark = spark.sql(f"SELECT CAST({expr} AS BIGINT) AS z").collect()[0]["z"]
    z_duck = duck.execute(f"SELECT CAST({expr} AS BIGINT)").fetchone()[0]
    assert z_spark == z_duck, (x, y, expr)


@settings(
    max_examples=20, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    a=st.text(alphabet="abcde", min_size=0, max_size=8),
    b=st.text(alphabet="abcde", min_size=0, max_size=8),
)
def test_levenshtein_agrees(spark, duck, a, b):
    """fuzzy_match_names verifies candidates with levenshtein on both
    engines — the distance function itself must agree on arbitrary
    strings (insertions, deletions, substitutions, empty edges)."""
    d_spark = spark.sql(f"SELECT levenshtein('{a}', '{b}') AS d").collect()[0]["d"]
    d_duck = duck.execute(f"SELECT levenshtein('{a}', '{b}')").fetchone()[0]
    assert d_spark == d_duck, (a, b)


# --------------------------------------------------------------------------
# Connected-components equivalence: both distributed CC implementations
# (min-label propagation and large/small-star contraction) must agree
# with a sequential union-find on arbitrary random graphs — not just on
# the fixture's chain shape. Catches: missed symmetric closure, stars
# that stop one contraction early, label-vs-min mixups.
# --------------------------------------------------------------------------

_edge = st.tuples(
    st.integers(min_value=0, max_value=60), st.integers(min_value=0, max_value=60)
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member id
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(_edge, min_size=1, max_size=40))
def test_cc_implementations_agree_with_union_find(spark, edges):
    from kinesis_adapter_spark.operators.curation import (
        cc_propagate_labels,
        cc_star_labels,
    )

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a BIGINT, doc_b BIGINT"
    )
    expected = _union_find(edges)
    got_prop = {
        r.node: r.label for r in cc_propagate_labels(pairs, max_rounds=70).collect()
    }
    got_star = {
        r.node: r.label for r in cc_star_labels(pairs, max_rounds=20).collect()
    }
    assert got_prop == expected
    assert got_star == expected


@given(
    days=st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_streak_islands_match_python_reference(spark, days):
    """user_streak_days' gaps-and-islands core must agree with a
    direct Python computation on arbitrary (user, day) sets —
    including duplicate days, singleton users, and runs that touch
    the domain edges."""
    from kinesis_adapter_spark.operators.insights import user_streak_days  # noqa: F401  (shape only)

    rows = [(u, d) for u, d in days]
    df = spark.createDataFrame(rows, "user_id long, day long").distinct()
    from pyspark.sql import Window

    wdays = Window.partitionBy("user_id").orderBy("day")
    islands = df.withColumn("grp", F.col("day") - F.row_number().over(wdays))
    got = {
        (r.user_id, r.longest)
        for r in islands.groupBy("user_id", "grp")
        .count()
        .groupBy("user_id")
        .agg(F.max("count").alias("longest"))
        .collect()
    }
    ref = {}
    for u in {u for u, _ in rows}:
        ds = sorted({d for uu, d in rows if uu == u})
        best = cur = 1
        for a, b in zip(ds, ds[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        ref[u] = best
    assert got == {(u, v) for u, v in ref.items()}


@given(
    data=st.lists(
        st.tuples(
            st.integers(1, 3),
            st.integers(1, 50),
            st.floats(min_value=0.5, max_value=1000, allow_nan=False),
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_weighted_stats_match_numpy(spark, data):
    """agg_weighted_stats' algebraic expansion must agree with numpy's
    two-pass weighted moments to float tolerance on arbitrary
    weight/value sets (the expansion is exact in infinite precision;
    this pins that cancellation error stays below the rounding the
    oracle applies)."""
    import numpy as np

    df = spark.createDataFrame(
        [(g, float(w), float(x)) for g, w, x in data],
        "grp int, w double, x double",
    )
    sw, swx, swx2 = F.sum("w"), F.sum(F.col("w") * F.col("x")), F.sum(
        F.col("w") * F.col("x") * F.col("x")
    )
    got = {
        r.grp: (r.wmean, r.wvar)
        for r in df.groupBy("grp")
        .agg(
            (swx / sw).alias("wmean"),
            (swx2 / sw - F.pow(swx / sw, F.lit(2))).alias("wvar"),
        )
        .collect()
    }
    for g in {g for g, _, _ in data}:
        w = np.array([float(wi) for gi, wi, _ in data if gi == g])
        x = np.array([float(xi) for gi, _, xi in data if gi == g])
        mu = np.average(x, weights=w)
        var = np.average((x - mu) ** 2, weights=w)
        assert abs(got[g][0] - mu) < 1e-6 * max(1.0, abs(mu))
        assert abs(got[g][1] - var) < 1e-5 * max(1.0, abs(var))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=0,
        max_size=40,
    )
)
def test_triangle_stats_match_bruteforce(spark, edges):
    """Degree-oriented triangle counting must agree with itertools
    brute force on arbitrary random graphs — the orientation argument
    (each triangle generated from its unique minimal apex) holds for
    every degree distribution, not just the fixture's."""
    from itertools import combinations

    from kinesis_adapter_spark.operators.insights import triangle_stats

    canon = {(min(u, v), max(u, v)) for u, v in edges}
    if not canon:
        return
    eset = set(canon)
    nodes = {n for e in canon for n in e}
    tri_ref = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    deg = {}
    for u, v in canon:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    wedge_ref = sum(d * (d - 1) // 2 for d in deg.values())
    e_df = spark.createDataFrame(sorted(canon), "u long, v long")
    [r] = triangle_stats(e_df).collect()
    assert r["n_vertices"] == len(nodes)
    assert r["n_edges"] == len(canon)
    assert r["n_wedges"] == wedge_ref
    assert r["n_triangles"] == tri_ref, (sorted(canon), r["n_triangles"], tri_ref)


# ------------------- multimodal codec-pair properties (pure functions)

_img = st.tuples(
    st.integers(8, 40),   # w
    st.integers(8, 32),   # h
    st.integers(0, 2**32),
)


@given(_img)
@settings(max_examples=40, deadline=None)
def test_phash_impls_agree_and_shift_invariant(t):
    """On ARBITRARY rasters (not just the fixture's formula): the
    loop-based ground-truth pHash and the vectorized engine pHash must
    agree bit-for-bit, and a uniform brightness shift that doesn't
    wrap must not flip any bit (the property the near-dup fixture
    relies on)."""
    import numpy as np

    from kinesis_adapter_spark.operators.multimodal import (
        _phash_gt,
        _phash_one,
        _ppm_header,
    )

    w, h, seed = t
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
    ppm = _ppm_header(w, h) + pix.tobytes()
    a, b = _phash_gt(ppm), _phash_one(ppm)
    assert a == b
    shifted = _ppm_header(w, h) + (pix + 10).astype(np.uint8).tobytes()
    assert _phash_one(shifted) == a
    assert _phash_gt(shifted) == a


@given(_img)
@settings(max_examples=40, deadline=None)
def test_resize_impls_agree_on_random_rasters(t):
    """Strided-slice ground truth vs reshape/sum engine resize must be
    byte-identical on arbitrary rasters, including odd dimensions
    (edge-crop path)."""
    import numpy as np

    from kinesis_adapter_spark.operators.multimodal import (
        _gt_resized_ppm,
        _ppm_header,
    )

    w, h, seed = t
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ppm = _ppm_header(w, h) + pix.tobytes()
    # engine-side decomposition (as in mm_resize._resize_one)
    hdr_end = ppm.index(b"255\n") + 4
    p2 = np.frombuffer(ppm, dtype=np.uint8, offset=hdr_end).reshape(h, w, 3)
    h2, w2 = h // 2, w // 2
    blocks = p2[: 2 * h2, : 2 * w2].astype(np.uint16).reshape(h2, 2, w2, 2, 3)
    engine = (
        _ppm_header(w2, h2)
        + (blocks.sum(axis=(1, 3)) // 4).astype(np.uint8).tobytes()
    )
    assert _gt_resized_ppm(ppm) == engine


@given(st.integers(0, 2**32), st.integers(2, 400))
@settings(max_examples=40, deadline=None)
def test_wav_feature_impls_agree_on_random_audio(seed, n):
    """struct-loop ground truth vs numpy engine WAV features must be
    identical on arbitrary PCM16 sample streams (full int16 range,
    including extremes and zeros)."""
    import struct

    import numpy as np

    from kinesis_adapter_spark.operators.multimodal import (
        AUDIO_SR,
        _audio_gt,
        _wav_features_one,
    )

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype=np.int64)
    samples[0] = 0  # exercise the sign(0) := nonneg convention
    data = samples.astype("<i2").tobytes()
    wav = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, AUDIO_SR, AUDIO_SR * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    assert _audio_gt(wav) == _wav_features_one(wav)


@settings(
    max_examples=15, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(data=st.data())
def test_winnowing_shared_run_guarantees_shared_fingerprint(spark, data):
    """The winnowing guarantee (the property the MOSS scheme is FOR),
    on the operator's own selection helper: two documents sharing any
    run of W+K-1 consecutive words must share at least one selected
    fingerprint — both docs then contain one complete window over the
    SAME W gram hashes, whose minimum both keep. Random unshared
    prefixes/suffixes around a random shared run; the df cap is
    deliberately out of scope (caller policy, 2 docs never hit it)."""
    from kinesis_adapter_spark.operators.llmops import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    word = st.sampled_from(
        "alpha bravo care delta echo fox golf hotel india jazz".split()
    )
    run_len = data.draw(st.integers(WINNOW_W + WINNOW_K - 1, 20), "run")
    shared = data.draw(
        st.lists(word, min_size=run_len, max_size=run_len), "shared"
    )
    pre_a = data.draw(st.lists(word, min_size=0, max_size=8), "pre_a")
    suf_a = data.draw(st.lists(word, min_size=0, max_size=8), "suf_a")
    pre_b = data.draw(st.lists(word, min_size=0, max_size=8), "pre_b")
    suf_b = data.draw(st.lists(word, min_size=0, max_size=8), "suf_b")
    docs = spark.createDataFrame(
        [
            (1, " ".join(pre_a + shared + suf_a)),
            (2, " ".join(pre_b + shared + suf_b)),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs).collect()
    a = {r["fp"] for r in fps if r["doc_id"] == 1}
    b = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert a & b, (pre_a, shared, suf_a, pre_b, suf_b)


@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_unigram_viterbi_is_optimal_vs_bruteforce(data):
    """_uni_viterbi (the unigram trainer/encoder's DP) against an
    exhaustive enumeration of EVERY segmentation of a random word
    under a random piece vocabulary: the DP's segmentation must
    attain the maximum total log-prob, and under the DP's own total
    order (max score, ties to the longest piece at each step,
    scanning right-to-left) it must be THE argmax. Pure-function
    property — independent of the replayed-reference test in
    test_quality, which checks replication, not optimality."""
    from kinesis_adapter_spark.operators.llmops import (
        UNI_PIECE_MAX,
        _uni_viterbi,
    )

    alphabet = "abc"
    word = data.draw(
        st.text(alphabet=alphabet, min_size=1, max_size=9), "word"
    )
    # vocab: every single char (totality invariant, as in the seeding)
    # plus a random subset of the word's own multi-char substrings
    subs = sorted(
        {
            word[i : i + ln]
            for i in range(len(word))
            for ln in range(2, UNI_PIECE_MAX + 1)
            if i + ln <= len(word)
        }
    )
    chosen = data.draw(
        st.lists(st.sampled_from(subs), max_size=6) if subs else st.just([]),
        "pieces",
    )
    lp = {c: data.draw(st.integers(-60, -1), f"lp_{c}") / 10.0
          for c in alphabet}
    for p in chosen:
        lp[p] = data.draw(st.integers(-60, -1), f"lp_{p}") / 10.0

    got = _uni_viterbi(word, lp)
    assert "".join(got) == word and all(p in lp for p in got)

    def all_segs(w):
        if not w:
            yield []
            return
        for ln in range(1, min(UNI_PIECE_MAX, len(w)) + 1):
            if w[:ln] in lp:
                for rest in all_segs(w[ln:]):
                    yield [w[:ln]] + rest

    best = max(sum(lp[p] for p in s) for s in all_segs(word))
    assert sum(lp[p] for p in got) == pytest.approx(best, abs=1e-12), (
        word,
        got,
        best,
    )


@settings(
    max_examples=20, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    log=st.lists(
        st.tuples(
            st.integers(1, 6),  # key (small domain -> collisions)
            st.integers(1, 9),  # seq
            st.sampled_from(["I", "U", "D"]),
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 500).map(lambda c: c / 100.0),  # 2-dp price
        ),
        min_size=1,
        max_size=25,
    )
)
def test_random_changelogs_fold_like_python(spark, log):
    """fold_changelog (the cdc_apply_changelog / stream_cdc_apply
    core) against a per-row Python dict fold on RANDOM op logs —
    random keys, sequences, op codes (incl. deletes with later
    revivals), and prices. Ties on (key, seq) are resolved to a single
    survivor before feeding either side (a real feed's offsets are
    unique per key; max_by is free to pick either copy on a tie, so
    the property is stated where the operator's contract holds)."""
    from kinesis_adapter_spark.operators.incremental import fold_changelog

    dedup = {}
    for k, seq, op, st_, tp in log:
        dedup[(k, seq)] = (k, seq, op, st_, tp)
    rows = sorted(dedup.values())

    best: dict = {}
    n_ops: dict = {}
    for k, seq, op, st_, tp in rows:
        n_ops[k] = n_ops.get(k, 0) + 1
        if k not in best or seq > best[k][0]:
            best[k] = (seq, op, st_, tp)
    want = {
        k: (st_, round(tp, 2), seq, n_ops[k])
        for k, (seq, op, st_, tp) in best.items()
        if op != "D"
    }

    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, seq int, op string, "
        "o_orderstatus string, o_totalprice double",
    )
    got = {
        r["o_orderkey"]: (
            r["o_orderstatus"],
            r["o_totalprice"],
            r["last_seq"],
            r["n_ops"],
        )
        for r in fold_changelog(df).collect()
    }
    assert got == want, rows
