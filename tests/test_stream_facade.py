"""Property-style identities for the Stream facade — the reference's own
testing idea (SURVEY.md §5.1): Stream(xs).map(f).sum() == sum(map(f, xs))
against Python builtins, on seeded random inputs."""

import random

import pytest
from pyspark.sql import functions as F

from pystreams_spark import Stream

random.seed(42)
XS = [random.randint(-100, 100) for _ in range(500)]


@pytest.fixture(scope="module")
def s(spark):
    return Stream.of(spark, [(x,) for x in XS], "x long")


def test_map_sum_identity(s):
    assert s.map(y=F.col("x") * 2 + 1).sum("y") == sum(2 * x + 1 for x in XS)


def test_filter_count_identity(s):
    assert s.filter("x % 3 = 0").count() == len([x for x in XS if x % 3 == 0])


def test_min_max_mean(s):
    assert s.min("x") == min(XS)
    assert s.max("x") == max(XS)
    assert abs(s.mean("x") - sum(XS) / len(XS)) < 1e-12


def test_flatmap_identity(s):
    got = s.flatmap(F.array("x", F.col("x") * -1), alias="v").sum("v")
    assert got == sum(x + -x for x in XS) == 0


def test_distinct_sorted_limit(s):
    got = [r.x for r in s.distinct().sorted("x").limit(5).collect()]
    assert got == sorted(set(XS))[:5]


def test_skip_offset(s):
    got = [r.x for r in s.sorted("x").skip(10).limit(3).collect()]
    assert got == sorted(XS)[10:13]


def test_reduce_treereduce(s):
    assert s.reduce("x", lambda a, b: a + b) == sum(XS)


def test_any_all_none(s):
    assert s.any("x > 99") == any(x > 99 for x in XS)
    assert s.all("x >= -100") == all(x >= -100 for x in XS)
    assert s.none("x > 100") == (not any(x > 100 for x in XS))


def test_union_intersection_subtract(spark):
    a = Stream.of(spark, [(i,) for i in range(10)], "x long")
    b = Stream.of(spark, [(i,) for i in range(5, 15)], "x long")
    assert a.union(b).count() == 20
    assert sorted(r.x for r in a.intersection(b).collect()) == list(range(5, 10))
    assert sorted(r.x for r in a.subtract(b).collect()) == list(range(5))


def test_reduce_by_key_vs_python(spark):
    data = [(x % 7, x) for x in XS]
    s = Stream.of(spark, data, "k long, v long")
    got = {
        r.k: r.total
        for r in s.reduce_by_key(["k"], total=F.sum("v")).collect()
    }
    expected = {}
    for k, v in data:
        expected[k] = expected.get(k, 0) + v
    assert got == expected


def test_count_by_key(spark):
    data = [(x % 5,) for x in XS]
    s = Stream.of(spark, data, "k long")
    got = {r.k: r["count"] for r in s.count_by_key("k").collect()}
    expected = {}
    for (k,) in data:
        expected[k] = expected.get(k, 0) + 1
    assert got == expected


def test_group_values_sorted(spark):
    s = Stream.of(spark, [(1, 3), (1, 1), (2, 5)], "k long, v long")
    got = {r.k: r.values for r in s.group_values(["k"], "v").collect()}
    assert got == {1: [1, 3], 2: [5]}


def test_enumerate(s):
    rows = s.distinct().enumerate(order=["x"]).sorted("idx").limit(3).collect()
    expected = sorted(set(XS))[:3]
    assert [(r.idx, r.x) for r in rows] == [(i, x) for i, x in enumerate(expected)]


def test_map_rows_slow_path(spark):
    s = Stream.of(spark, [(i,) for i in range(20)], "x long")
    out = s.map_rows(lambda r: {"y": r["x"] ** 2}, "y long")
    assert sorted(r.y for r in out.collect()) == [i**2 for i in range(20)]


def test_zip_equal_partitions(spark):
    a = Stream(spark.range(0, 10, numPartitions=2))
    b = Stream(spark.range(100, 110, numPartitions=2))
    rows = a.zip(b).collect()
    assert sorted((r[0], r[1]) for r in rows) == [(i, i + 100) for i in range(10)]


def test_peek_observe(spark):
    s = Stream.of(spark, [(i,) for i in range(10)], "x long")
    observed = s.peek("m", F.sum("x").alias("sx"))
    observed.collect()
    # observation metrics are attached to the executed plan
    assert observed.df.schema == s.df.schema


def test_generate_distributed_source(spark):
    s = Stream.generate(
        spark, lambda i: {"i": i, "sq": i * i}, 100, "i long, sq long", partitions=4
    )
    rows = sorted((r.i, r.sq) for r in s.collect())
    assert rows == [(i, i * i) for i in range(100)]


def test_aggregate_by_key_arbitrary_op(spark):
    data = [(i % 3, i) for i in range(30)]
    s = Stream.of(spark, data, "k long, v long")
    # arbitrary op: accumulate into (count, sum-of-squares)
    got = {
        r.k: r.agg
        for r in s.aggregate_by_key(
            ["k"],
            "v",
            zero=(0, 0),
            seq_op=lambda acc, v: (acc[0] + 1, acc[1] + v * v),
            comb_op=lambda a, b: (a[0] + b[0], a[1] + b[1]),
        ).collect()
    }
    expected = {}
    for k, v in data:
        c, ss = expected.get(k, (0, 0))
        expected[k] = (c + 1, ss + v * v)
    assert {k: tuple(v) for k, v in got.items()} == expected


def test_peek_observed_metrics(spark):
    s = Stream.of(spark, [(i,) for i in range(100)], "x long")
    observed, handle = s.peek_observed(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    observed.filter("x >= 0").count()
    assert handle.get == {"n": 100, "sx": 4950}


def test_foreach_side_effect_accumulator(spark):
    acc = spark.sparkContext.accumulator(0)
    s = Stream.of(spark, [(i,) for i in range(50)], "x long")
    s.foreach(lambda row: acc.add(row.x))
    assert acc.value == sum(range(50))


def test_seeded_rand_reproducible(spark, sf_dir):
    from pystreams_spark.queries import QUERIES

    a = QUERIES["seeded_random_tags"](spark, sf_dir).collect()
    b = QUERIES["seeded_random_tags"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fold_and_tree_aggregate(s):
    assert s.fold("x", 0, lambda a, b: a + b) == sum(XS)
    # treeAggregate computing (sum, count) with arbitrary zero/ops
    total, n = s.tree_aggregate(
        (0, 0),
        lambda acc, row: (acc[0] + row["x"], acc[1] + 1),
        lambda a, b: (a[0] + b[0], a[1] + b[1]),
    )
    assert (total, n) == (sum(XS), len(XS))


def test_accumulate_counter(s):
    # Hadoop-counter idiom: count negatives via accumulator side-channel
    assert s.accumulate(lambda row: 1 if row["x"] < 0 else 0) == len(
        [x for x in XS if x < 0]
    )


def test_map_batches_with_broadcast(s):
    lookup = {x: x * 10 for x in range(-100, 101)}

    def apply(pdf, table):
        pdf = pdf.copy()
        pdf["y"] = pdf["x"].map(table)
        return pdf

    got = sorted(
        r.y for r in s.map_batches_with(lookup, apply, "x long, y long").collect()
    )
    assert got == sorted(x * 10 for x in XS)


def test_take_drop_while_vs_itertools(spark):
    # unique order key (i), predicate over the value column
    import itertools

    random.seed(7)
    rows = [(i, random.randint(0, 100)) for i in range(300)]
    st = Stream.of(spark, rows, "i long, v long")
    pred = F.col("v") < 95

    got_tw = sorted(
        (r.i, r.v) for r in st.take_while(pred, "i").collect()
    )
    want_tw = list(itertools.takewhile(lambda t: t[1] < 95, rows))
    assert got_tw == want_tw

    got_dw = sorted(
        (r.i, r.v) for r in st.drop_while(pred, "i").collect()
    )
    want_dw = list(itertools.dropwhile(lambda t: t[1] < 95, rows))
    assert got_dw == want_dw

    # all-true predicate: takeWhile keeps everything, dropWhile nothing
    assert st.take_while(F.lit(True), "i").count() == len(rows)
    assert st.drop_while(F.lit(True), "i").count() == 0


def test_iterate_unfolds_recurrence(spark):
    # Stream.iterate(seed, f) limited to n, per java.util.stream semantics
    s = Stream.iterate(spark, 1.0, lambda x: x * 3, 10, "value double")
    got = sorted(r.value for r in s.collect())
    assert got == sorted(float(3**k) for k in range(10))


def test_enumerate_distributed_zipwithindex_semantics(spark):
    from pystreams_spark.io import load_table
    import os

    sf = os.environ.get("PYSTREAMS_TEST_SF_DIR", "/root/testdata/sf0.001")
    li = load_table(spark, sf, "lineitem").repartition(8, "l_orderkey")
    n = li.count()
    idx = Stream(li).enumerate_distributed().collect()
    vals = sorted(r.idx for r in idx)
    # exactly 0..n-1, each once — the zipWithIndex contract
    assert vals == list(range(n))
    # agrees with the RDD implementation's index set per partition layout
    assert len(idx) == n


def test_corpus_ops_facade_sugar(spark, sf_dir):
    # the §2.K facade methods must agree with their operator-module
    # implementations (same plans, just fluent access)
    from pystreams_spark.io import load_table

    docs = Stream(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()

    deduped = docs.dedup_exact()
    n_distinct = docs.df.select("text").distinct().count()
    assert deduped.count() == n_distinct

    corpus = Stream(docs.df.filter("doc_id % 3 = 0"))
    new = Stream(docs.df.filter("doc_id % 3 != 0"))
    survivors = new.dedup_against(corpus)
    want = new.df.join(
        corpus.df.select("text").distinct(), "text", "left_anti"
    ).count()
    assert survivors.count() == want

    ev = Stream(docs.df.filter("doc_id % 41 = 0"))
    tr = Stream(docs.df.filter("doc_id % 41 != 0"))
    clean = tr.decontaminate(ev, n=3, min_overlap=2)
    assert clean.count() <= tr.count()
    # removed docs really do overlap the eval set
    assert clean.count() < tr.count() or n_docs < 41

    shuffled = docs.shuffle_seeded(seed=3)
    ids = sorted(r.doc_id for r in docs.df.select("doc_id").collect())
    got = [r.doc_id for r in shuffled.df.select("doc_id").collect()]
    assert sorted(got) == ids and got != ids


def test_summary_statistics_one_pass(spark):
    rows = [(float(x),) for x in range(1, 101)]
    s = Stream.of(spark, rows, "x double")
    got = s.summary_statistics("x")
    assert got["count"] == 100
    assert got["min"] == 1.0 and got["max"] == 100.0
    assert got["sum"] == 5050.0
    assert abs(got["mean"] - 50.5) < 1e-9
    # agrees with the individual terminals
    assert got["sum"] == s.sum("x") and got["min"] == s.min("x")


def test_facade_selection_ops(spark, sf_dir):
    from pyspark.sql import functions as F

    from pystreams_spark import Stream, load_table

    d = Stream(load_table(spark, sf_dir, "documents")).map(
        F.col("doc_id"),
        F.col("lang"),
        F.length("text").cast("long").alias("n_tokens"),
    )
    sel = d.take_token_budget([F.col("doc_id")], "n_tokens", budget=2000)
    rows = sel.df.select("doc_id", "cum_tokens").collect()
    assert rows and all(
        r["cum_tokens"] is not None for r in rows
    )
    w = d.mixture_weights("lang", "n_tokens").df.collect()
    assert abs(sum(r["actual_share"] for r in w) - 1.0) < 1e-4


def test_semantic_and_bpe_facade_sugar(spark, sf_dir):
    from pystreams_spark.io import load_table
    from pystreams_spark.operators.bpe import bpe_train
    from pystreams_spark.operators.similarity import semantic_dedup

    emb = Stream(load_table(spark, sf_dir, "embeddings"))
    surv = emb.dedup_semantic(threshold=0.35, cluster_col="label")
    want = semantic_dedup(emb.df, threshold=0.35, cluster_col="label").count()
    assert surv.count() == want < emb.count()

    docs = Stream(load_table(spark, sf_dir, "documents"))
    merges = docs.bpe_vocab(num_merges=3)
    want_merges, _ = bpe_train(docs.df, 3)
    assert merges == want_merges and len(merges) == 3


def test_validate_and_resample_facade_sugar(spark, sf_dir):
    import pytest as _pt

    from pystreams_spark.io import load_table
    from pystreams_spark.operators.validate import in_range, not_null

    li = Stream(load_table(spark, sf_dir, "lineitem"))
    rep = {r.rule: r.n_violations for r in li.check(
        [not_null("l_orderkey"), in_range("l_discount", 0.0, 0.05)]
    ).collect()}
    assert rep["not_null(l_orderkey)"] == 0
    assert rep["in_range(l_discount,[0.0,0.05])"] > 0

    assert li.expect([not_null("l_orderkey")]) is li
    with _pt.raises(AssertionError, match="in_range"):
        li.expect([in_range("l_discount", 0.0, 0.05)])

    ev = Stream(load_table(spark, sf_dir, "events").filter("event_type = 'purchase'"))
    out = ev.resample("ts", "value", ["user_id"], 86400)
    pdf = out.df.toPandas()
    assert {"user_id", "bucket", "raw", "ffill", "interp"} <= set(pdf.columns)
    assert len(pdf) > 0 and pdf["interp"].notna().all()


def test_facade_r5_sugar(spark, sf_dir, tmp_path):
    """The r5 operator sugar: packing, surprisal, drift, NFC audit,
    media decode, JSONL export — each routes to its operator and
    returns the documented shape."""
    from pystreams_spark import Stream, load_table

    docs = Stream(
        load_table(spark, sf_dir, "documents").limit(80).withColumn(
            "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
        )
    )
    packed = docs.pack_sequences(512, contiguous=True).collect()
    assert {r.bin_id for r in packed} and all(r.bin_fill > 0 for r in packed)

    scored = docs.surprisal_scores(carry_cols=("lang",)).collect()
    assert len(scored) == 80 and all(r.surprisal > 0 for r in scored)

    li = Stream(load_table(spark, sf_dir, "lineitem"))
    low = Stream(li.df.filter(F.col("l_discount") <= 0.05))
    high = Stream(li.df.filter(F.col("l_discount") > 0.05))
    drift = {r.column: r for r in high.drift_against(low, ["l_quantity"]).collect()}
    assert "l_quantity" in drift and drift["l_quantity"].psi is not None

    nfc = docs.nfc_report().collect()
    assert all(r.n_not_nfc == 0 for r in nfc)  # fixture is NFC-clean

    manifest = docs.map(F.col("doc_id"), F.col("text")).export_jsonl(
        str(tmp_path / "out"), max_shard_bytes=32 * 1024
    )
    assert manifest["total_rows"] == 80 and manifest["shards"]

    from tests.test_multimodal import _bmp_bytes

    media = Stream(
        spark.createDataFrame(
            [(1, _bmp_bytes(rgb=(9, 18, 27)))], "media_id long, payload binary"
        )
    )
    dec = media.decode_media().collect()[0]
    assert dec.kind == "image" and dec.mean_r == 9.0


def test_facade_model_selection_sugar(spark, sf_dir):
    """The model-based-selection sugar added late in r5: bigram LM
    surprisal, hashed linear classifier scoring, DSIR weighting — each
    routes to its operator and returns the documented shape."""
    from pystreams_spark import Stream, load_table
    from pystreams_spark.operators.quality_model import demo_weights

    docs = Stream(load_table(spark, sf_dir, "documents").limit(60))

    bs = docs.bigram_surprisal(carry_cols=("lang",)).collect()
    assert len(bs) == 60 and all(r.bigram_surprisal > 0 for r in bs)

    sc = docs.score_quality_model(demo_weights(spark, 64), 64).collect()
    assert len(sc) == 60 and all(0.0 < r.score < 1.0 for r in sc)

    target = Stream(docs.df.filter(F.col("source") == "src0"))
    raw = Stream(docs.df.filter(F.col("source") != "src0"))
    w = raw.dsir_against(target).collect()
    assert len(w) > 0 and all(r.n_tokens > 0 for r in w)


def test_facade_r5_batch5_sugar(spark, sf_dir):
    """The batch-5 sugar: weighted sampling, k-anonymity, pair mining,
    transitions, robust outliers, containment — each routes to its
    operator and returns the documented shape."""
    from pystreams_spark import Stream, load_table

    docs = Stream(load_table(spark, sf_dir, "documents"))
    samp = docs.sample_weighted(10, "n_chars").collect()
    assert len(samp) == 10 and all(r.sample_key is not None for r in samp)

    cust = Stream(load_table(spark, sf_dir, "customer"))
    ka = cust.k_anonymity(
        ["c_nationkey", "c_mktsegment"], k_values=(2, 10),
        sensitive_col="c_acctbal",
    ).collect()
    assert [r.k for r in ka] == [2, 10]
    assert all(r.n_rows_below <= r.n_classes * 10 for r in ka)

    li = Stream(load_table(spark, sf_dir, "lineitem"))
    pairs = li.pair_affinity("l_orderkey", "l_partkey").collect()
    assert all(r.pair_count >= 2 and r.lift > 0 for r in pairs)

    ev = Stream(load_table(spark, sf_dir, "events"))
    tm = ev.transitions("user_id", [F.col("ts"), F.col("event_id")],
                        "event_type").collect()
    assert tm and abs(sum(r.prob for r in tm
                          if r.from_state == tm[0].from_state) - 1.0) < 1e-4

    out = ev.outliers_robust("value", ["event_type"]).collect()
    assert out and all(r.mad is not None for r in out)

    cont = docs.dedup_containment(0.3, block_cols=("lang",)).collect()
    assert all(r.containment >= 0.3 for r in cont)


def test_facade_r5_batch6_sugar(spark, sf_dir):
    """Batch-6 sugar: stratified weighted sampling, source-overlap
    matrix, PMI collocations."""
    from pystreams_spark import Stream, load_table

    docs = Stream(load_table(spark, sf_dir, "documents"))
    per = docs.sample_weighted_per_group(5, "n_chars", ["lang"]).collect()
    from collections import Counter

    assert all(c <= 5 for c in Counter(r.lang for r in per).values())

    ov = docs.source_overlap(n=5).collect()
    assert all(r.source_a < r.source_b and r.n_shared >= 1 for r in ov)

    col = docs.collocations(min_count=5, top_k=10).collect()
    assert len(col) == 10 and all(r.pair_count >= 5 for r in col)


def test_facade_frontier_sugar(spark, sf_dir):
    from pystreams_spark import Stream, load_table

    p = Stream(load_table(spark, sf_dir, "part"))
    sky = p.frontier([("p_retailprice", "min"), ("p_size", "max")]).collect()
    assert sky
    # no row in the frontier dominates another
    for a in sky:
        for b in sky:
            assert not (
                b.p_retailprice <= a.p_retailprice and b.p_size >= a.p_size
                and (b.p_retailprice < a.p_retailprice or b.p_size > a.p_size)
            )


def test_facade_novelty_sugar(spark, sf_dir):
    """r8 sugar: Stream.novelty_scores routes to the novelty operator
    and returns the documented shape with valid ratios."""
    from pystreams_spark import Stream, load_table

    docs = Stream(load_table(spark, sf_dir, "documents").limit(60))
    rows = docs.novelty_scores().collect()
    assert len(rows) == 60
    assert all(0.0 <= r.novelty <= 1.0 for r in rows)
    assert all(r.novel_grams <= r.n_grams for r in rows)


def test_facade_deterministic_candidate_sugar(spark):
    """r9 sugar: the deterministic MinHash/SimHash candidate methods
    route to their operators — identical docs collide on every band
    (jaccard 1.0 / hamming 0)."""
    from pystreams_spark import Stream

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    s = Stream(
        spark.createDataFrame(
            [(1, t), (2, t), (3, "entirely different words over here now")],
            "doc_id long, text string",
        )
    )
    mh = {(r.id_a, r.id_b): r for r in
          s.neardup_candidates_deterministic().collect()}
    assert set(mh) == {(1, 2)} and mh[(1, 2)].jaccard == 1.0
    sh = {(r.id_a, r.id_b): r for r in
          s.simhash_candidates_deterministic().collect()}
    assert (1, 2) in sh and sh[(1, 2)].hamming == 0


def test_facade_snapshot_and_bitext_sugar(spark):
    """r11 sugar: the two-frame Stream.snapshot_diff and
    Stream.margin_bitext_mine route to their operators (exact and
    blocked paths) and return the documented shapes."""
    import numpy as np

    from pystreams_spark import Stream
    from pyspark.sql import functions as F

    a = Stream(spark.createDataFrame(
        [(1, "kept text"), (2, "old text"), (3, "moving text")],
        "doc_id long, text string",
    ))
    b = Stream(spark.createDataFrame(
        [(1, "kept text"), (2, "edited text"), (9, "moving text")],
        "doc_id long, text string",
    ))
    got = {r.doc_id: r.status for r in a.snapshot_diff(b).collect()}
    assert got == {
        1: "unchanged", 2: "modified", 3: "moved_away", 9: "moved_in",
    }

    rng = np.random.RandomState(3)
    centers = np.linalg.qr(rng.randn(8, 8))[0][:2] * 4.0
    rows = []
    for uid in range(12):
        v = centers[uid % 2] + 0.05 * rng.randn(8)
        rows.append((uid, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    x = Stream(df.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("x_id"), "embedding"))
    y = Stream(df.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("y_id"), "embedding"))
    exact = {(r.x_id, r.y_id, r.margin_ppm)
             for r in x.margin_bitext_mine(
                 y, k=2, margin_ppm_threshold=1_000_000).collect()}
    blocked = {(r.x_id, r.y_id, r.margin_ppm)
               for r in x.margin_bitext_mine(
                   y, k=2, margin_ppm_threshold=1_000_000,
                   blocked=True, n_cells=2, iters=3).collect()}
    assert exact and blocked == exact
