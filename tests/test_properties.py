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


@settings(max_examples=50, deadline=None)
@given(
    inserted=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=300
    ),
    probes=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=100
    ),
    num_bits_pow=st.integers(min_value=3, max_value=16),
    k=st.integers(min_value=1, max_value=8),
)
def test_bloom_bitmap_no_false_negatives(inserted, probes, num_bits_pow, k):
    # pure-kernel property (no Spark session): any hash that was set
    # must probe positive at ANY bitmap size / hash count — false
    # positives are allowed, false negatives never
    import numpy as np

    from pystreams_spark.operators.bloom import _bloom_positions

    num_bits = 1 << num_bits_pow
    bitmap = np.zeros(num_bits // 8, dtype=np.uint8)
    h_in = np.array(inserted, dtype=np.int64).astype(np.uint64)
    if len(h_in):
        pos = _bloom_positions(h_in, k, num_bits).reshape(-1)
        np.bitwise_or.at(
            bitmap, (pos >> np.uint64(3)).astype(np.int64),
            np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8),
        )

    def contains(h):
        p = _bloom_positions(np.asarray(h, dtype=np.uint64), k, num_bits)
        bits = (bitmap[(p >> np.uint64(3)).astype(np.int64)]
                >> (p & np.uint64(7)).astype(np.uint8)) & 1
        return bits.all(axis=0)

    if len(h_in):
        assert contains(h_in).all()  # no false negatives, ever
    # probes of never-inserted values may be fp but must not crash and
    # must be deterministic
    h_pr = np.array(probes, dtype=np.int64).astype(np.uint64)
    if len(h_pr):
        r1, r2 = contains(h_pr), contains(h_pr)
        assert (r1 == r2).all()


@slow
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=80,
        ),
        min_size=1,
        max_size=10,
    ),
    size=st.integers(min_value=2, max_value=20),
    stride_delta=st.integers(min_value=0, max_value=10),
)
def test_chunk_text_reconstruction(spark, texts, size, stride_delta):
    # stride <= size: concatenating the first `stride` chars of each
    # chunk reconstructs the document exactly — no char lost or
    # duplicated by the splitter, for any doc length incl. empty
    from pystreams_spark.functions.text import chunk_text

    stride = max(size - stride_delta, 1)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select(
        "i", "t", chunk_text("t", size=size, stride=stride).alias("chunks")
    ).collect()
    for r in rows:
        rebuilt = "".join(c[:stride] for c in r.chunks)
        assert rebuilt == r.t
        # every chunk is a true substring at its expected offset
        for j, c in enumerate(r.chunks):
            start = j * stride
            assert r.t[start : start + size] == c


def test_remove_repeated_spans_matches_python_reference(spark):
    """Differential: the distributed span-removal pipeline equals a
    direct Python implementation of the same semantics (span occurring
    >= 2 times corpus-wide keeps only its canonical-min-doc
    occurrences) on randomized corpora with planted shared spans."""
    import random

    from pystreams_spark.operators.dedup import remove_repeated_spans

    rng = random.Random(123)
    vocab = [f"w{i}" for i in range(30)]
    n = 4

    def make_corpus():
        shared_a = [rng.choice(vocab) for _ in range(n)]
        shared_b = [rng.choice(vocab) for _ in range(n + 2)]
        docs = []
        for doc_id in range(8):
            toks = [rng.choice(vocab) for _ in range(rng.randint(1, 15))]
            if rng.random() < 0.6:
                pos = rng.randint(0, len(toks))
                toks[pos:pos] = shared_a
            if rng.random() < 0.4:
                pos = rng.randint(0, len(toks))
                toks[pos:pos] = shared_b
            docs.append((doc_id, " ".join(toks)))
        return docs

    def reference(docs):
        spans = {}
        toks_by_doc = {}
        for doc_id, text in docs:
            w = text.split()
            toks_by_doc[doc_id] = w
            for s in range(len(w) - n + 1):
                spans.setdefault(tuple(w[s : s + n]), []).append((doc_id, s))
        out = {}
        removed = {d: set() for d, _ in docs}
        for span, occ in spans.items():
            if len(occ) < 2:
                continue
            canon = min(d for d, _ in occ)
            for d, s in occ:
                if d != canon:
                    removed[d].update(range(s, s + n))
        for doc_id, _ in docs:
            w = toks_by_doc[doc_id]
            kept = [x for j, x in enumerate(w) if j not in removed[doc_id]]
            out[doc_id] = (len(w), len(kept), " ".join(kept))
        return out

    for _ in range(3):
        docs = make_corpus()
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_tokens_before"],
                r["n_tokens_after"],
                r["clean_text"],
            )
            for r in remove_repeated_spans(df, n=n).collect()
        }
        assert got == reference(docs)


# word alphabet kept tiny so bigram/BM25 corpora have real collisions
_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=12
)
_corpus = st.lists(_words, min_size=1, max_size=25)


@slow
@given(docs=_corpus)
def test_bigram_surprisal_matches_python_reference(spark, docs):
    """bigram_surprisal_scores ≡ a direct python implementation of the
    documented add-α model on random small corpora."""
    import math
    from collections import Counter

    from pystreams_spark.operators.selection import bigram_surprisal_scores

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.bigram_surprisal
        for r in bigram_surprisal_scores(df).collect()
    }

    bigrams = Counter()
    for ws in docs:
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] += 1
    c1 = Counter()
    for (a, _), n in bigrams.items():
        c1[a] += n
    v = len(c1)
    expected = {}
    for i, ws in enumerate(docs):
        if len(ws) < 2:
            continue
        s = [
            -math.log((bigrams[(a, b)] + 0.5) / (c1[a] + 0.5 * v))
            for a, b in zip(ws, ws[1:])
        ]
        expected[i] = sum(s) / len(s)
    assert set(got) == set(expected)
    for i in expected:
        assert abs(got[i] - expected[i]) < 1e-9, (i, got[i], expected[i])


@slow
@given(docs=_corpus, terms=st.sets(st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=3))
def test_bm25_matches_python_reference(spark, docs, terms):
    """bm25_scores ≡ a direct python implementation of the Lucene form
    on random small corpora and term sets."""
    import math
    from collections import Counter

    from pystreams_spark.operators.retrieval import bm25_scores

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_scores(df, sorted(terms)).collect()}

    n = len(docs)
    dls = [len(ws) for ws in docs]
    avgdl = sum(dls) / n
    tf = {i: Counter(w for w in ws if w in terms) for i, ws in enumerate(docs)}
    dfreq = Counter(t for i in tf for t in tf[i])
    k1, b = 1.2, 0.75
    expected = {}
    for i, cnt in tf.items():
        if not cnt:
            continue
        s = 0.0
        for t, f in cnt.items():
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dls[i] / avgdl))
        expected[i] = s
    assert set(got) == set(expected)
    for i in expected:
        assert abs(got[i] - expected[i]) < 1e-9, (i, got[i], expected[i])


@slow
@given(docs=_corpus)
def test_pmi_collocations_matches_python_reference(spark, docs):
    """pmi_collocations ≡ a direct python implementation of
    PMI = ln(c12·N / (c1·c2)) over adjacent pairs, at min_count=1."""
    import math
    from collections import Counter

    from pystreams_spark.operators.assoc import pmi_collocations

    rows = [(" ".join(ws),) for ws in docs]
    df = spark.createDataFrame(rows, "text string")
    got = {
        (r.w1, r.w2): (r.pair_count, r.pmi)
        for r in pmi_collocations(df, min_count=1, top_k=None).collect()
    }

    c12 = Counter()
    for ws in docs:
        for x, y in zip(ws, ws[1:]):
            c12[(x, y)] += 1
    if not c12:
        assert got == {}
        return
    c1 = Counter()
    c2 = Counter()
    for (x, y), c in c12.items():
        c1[x] += c
        c2[y] += c
    n = sum(c12.values())
    expected = {
        (x, y): (c, round(math.log(c * n / (c1[x] * c2[y])), 6))
        for (x, y), c in c12.items()
    }
    assert got == expected


@slow
@given(docs=_corpus)
def test_distinctive_terms_matches_python_reference(spark, docs):
    """distinctive_terms ≡ a direct python implementation of the
    Monroe et al. log-odds z on random two-group corpora (top_k wide
    open so every (group, word) row is compared)."""
    import math
    from collections import Counter

    from pystreams_spark.operators.retrieval import distinctive_terms

    rows = [
        (i, "g" + str(i % 2), " ".join(ws)) for i, ws in enumerate(docs) if ws
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    got = {
        (r.grp, r.term): (r.count_in_group, r.count_in_rest, r.log_odds_z)
        for r in distinctive_terms(df, group_col="grp", top_k=10**6).collect()
    }

    cgw = Counter()
    for i, g, text in rows:
        for w in text.split():
            cgw[(g, w)] += 1
    cw = Counter()
    ng = Counter()
    for (g, w), c in cgw.items():
        cw[w] += c
        ng[g] += c
    n = sum(cgw.values())
    v = len(cw)
    a = 0.01
    expected = {}
    for (g, w), ygw in cgw.items():
        yrw = cw[w] - ygw
        n_g, n_r = ng[g], n - ng[g]
        if n_r <= 0 or v < 2:
            # the operator NULLs the score when there is no rest
            # population or no second word to contrast against
            expected[(g, w)] = (ygw, yrw, None)
            continue
        delta = (
            math.log(ygw + a)
            - math.log(n_g + a * v - ygw - a)
            - math.log(yrw + a)
            + math.log(n_r + a * v - yrw - a)
        )
        z = delta / math.sqrt(1.0 / (ygw + a) + 1.0 / (yrw + a))
        expected[(g, w)] = (ygw, yrw, round(z, 6))
    assert got == expected


@slow
@given(
    basket_items=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 6)),
        min_size=0,
        max_size=60,
    )
)
def test_pair_cooccurrence_matches_python_reference(spark, basket_items):
    """pair_cooccurrence ≡ a direct python implementation (supports,
    confidence, lift) on random basket tables at min_support=2."""
    from collections import Counter
    from itertools import combinations

    from pystreams_spark.operators.assoc import pair_cooccurrence

    if not basket_items:
        return
    df = spark.createDataFrame(basket_items, "bk long, it long")
    got = {
        (r.item_a, r.item_b): (
            r.pair_count, r.count_a, r.count_b,
            round(r.confidence, 6), round(r.lift, 6),
        )
        for r in pair_cooccurrence(df, "bk", "it", min_support=2).collect()
    }

    baskets: dict = {}
    for bk, it in set(basket_items):
        baskets.setdefault(bk, set()).add(it)
    n_baskets = len(baskets)
    ic = Counter(it for items in baskets.values() for it in items)
    frequent = {it for it, c in ic.items() if c >= 2}
    pc = Counter()
    for items in baskets.values():
        kept = sorted(it for it in items if it in frequent)
        for a, b in combinations(kept, 2):
            pc[(a, b)] += 1
    expected = {}
    for (a, b), c in pc.items():
        if c < 2:
            continue
        conf = max(c / ic[a], c / ic[b])
        lift = c * n_baskets / (ic[a] * ic[b])
        expected[(a, b)] = (c, ic[a], ic[b], round(conf, 6), round(lift, 6))
    assert got == expected


@slow
@given(
    raw_edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    )
)
def test_triangle_census_matches_python_reference(spark, raw_edges):
    """triangle_census ≡ a direct python count of triangles/wedges on
    random graphs."""
    from itertools import combinations

    from pystreams_spark.operators.graph import triangle_census

    edges = {(min(a, b), max(a, b)) for a, b in raw_edges if a != b}
    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    r = triangle_census(df).collect()[0]

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = sum(
        1
        for trio in combinations(sorted(adj), 3)
        if (trio[0], trio[1]) in edges
        and (trio[1], trio[2]) in edges
        and (trio[0], trio[2]) in edges
    )
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    assert r.n_nodes == len(adj)
    assert r.n_edges == len(edges)
    assert r.n_triangles == tris
    assert r.n_wedges == wedges
    if wedges:
        assert r.clustering == round(3.0 * tris / wedges, 6)
    else:
        assert r.clustering is None
