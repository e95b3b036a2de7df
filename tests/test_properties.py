"""Hypothesis property tests: operator identities over generated inputs
(the reference's testing philosophy, SURVEY §5.1, mechanized)."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pystreams_spark import Stream

slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

ints = st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=200)


@slow
@given(xs=ints)
def test_map_filter_sum_identity(spark, xs):
    s = Stream.of(spark, [(x,) for x in xs], "x long")
    got = s.filter("x % 2 = 0").map(F.col("x") * 3).sum("(x * 3)")
    expected = sum(x * 3 for x in xs if x % 2 == 0)
    assert (got or 0) == expected


@slow
@given(xs=ints)
def test_distinct_count_identity(spark, xs):
    s = Stream.of(spark, [(x,) for x in xs], "x long")
    assert s.distinct().count() == len(set(xs))


@slow
@given(xs=ints, k=st.integers(min_value=1, max_value=10))
def test_topk_matches_sorted_head(spark, xs, k):
    from pystreams_spark.operators.topk import top_k

    s = Stream.of(spark, [(x,) for x in xs], "x long")
    got = [r.x for r in top_k(s.df, [F.desc("x")], k).collect()]
    assert got == sorted(xs, reverse=True)[:k]


@slow
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=60
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=60
    ),
)
def test_asof_property_vs_merge_asof(spark, left, right):
    from pystreams_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    rdf = spark.createDataFrame(
        [(k, t) for k, t in right], "k long, rt long"
    ).dropDuplicates()
    got = {
        r.lid: r.rt_matched
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="rt", right_cols=["rt"]
        ).collect()
    }
    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], columns=["lid", "k", "t"]
    ).sort_values("t", kind="stable")
    rp = (
        pd.DataFrame(right, columns=["k", "rt"])
        .drop_duplicates()
        .sort_values("rt", kind="stable")
    )
    exp = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", by="k", direction="backward"
    )
    exp_map = {
        int(r.lid): (None if pd.isna(r.rt) else int(r.rt)) for _, r in exp.iterrows()
    }
    assert got == exp_map


@slow
@given(xs=ints, thresh=st.integers(min_value=-(10**6), max_value=10**6))
def test_take_drop_while_partition_identity(spark, xs, thresh):
    """take_while(p) ∪ drop_while(p) == stream, and both match the
    itertools semantics over the ordered (unique-keyed) rows."""
    import itertools

    rows = list(enumerate(xs))  # unique order key
    s = Stream.of(spark, rows, "i long, x long")
    pred = F.col("x") < thresh
    tw = sorted((r.i, r.x) for r in s.take_while(pred, "i").collect())
    dw = sorted((r.i, r.x) for r in s.drop_while(pred, "i").collect())
    assert tw == list(itertools.takewhile(lambda t: t[1] < thresh, rows))
    assert dw == list(itertools.dropwhile(lambda t: t[1] < thresh, rows))
    assert sorted(tw + dw) == rows


@slow
@given(xs=ints, k=st.integers(min_value=1, max_value=8))
def test_histogram_counts_partition_rows(spark, xs, k):
    """Histogram bucket counts must sum to n, stay in-range, and match a
    direct Python recomputation of the same floor formula."""
    s = Stream.of(spark, [(x,) for x in xs], "x long")
    rows = s.histogram("x", k).collect()
    assert sum(r.n for r in rows) == len(xs)
    assert all(0 <= r.bucket < k for r in rows)
    lo, hi = min(xs), max(xs)
    if hi > lo:
        w = (hi - lo) / k
        expect = {}
        for x in xs:
            b = min(int((x - lo) / w), k - 1)
            expect[b] = expect.get(b, 0) + 1
        got = {r.bucket: r.n for r in rows}
        assert got == expect
