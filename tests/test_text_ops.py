"""Text-analysis and dedup kernel twins: the Arrow/numpy hot-path
implementations must agree value-for-value with their executable-spec
Column-expression forms (which the DuckDB gate verifies independently)."""

import hashlib
import sys

import pandas as pd
import pytest

from rtree_cpp_spark.operators import dedup, text_analysis


@pytest.fixture(scope="module")
def texts_df(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "a",
                "",
                "punctuation, matters! 123 456",
                "repeat repeat repeat repeat",
                "x " * 500 + "tail",
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_rolling_hash_kernel_matches_expr(spark, texts_df):
    got_k = text_analysis.rolling_hash(texts_df, impl="kernel").toPandas()
    got_e = text_analysis.rolling_hash(texts_df, impl="expr").toPandas()
    k = got_k.sort_values("doc_id")["roll_hash"].tolist()
    e = got_e.sort_values("doc_id")["roll_hash"].tolist()
    assert k == e
    # spot-check the spec directly
    h = 0
    for ch in "a":
        h = (h * text_analysis.ROLL_B + ord(ch)) % text_analysis.ROLL_P
    assert k[1] == h


def test_rolling_hash_bad_impl(texts_df):
    with pytest.raises(ValueError, match="impl"):
        text_analysis.rolling_hash(texts_df, impl="nope")


def _h64_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_simhash_matches_brute(spark, texts_df):
    got = dedup.simhash(texts_df).toPandas().set_index("doc_id")["simhash"].to_dict()
    pdf = texts_df.toPandas()
    for _, row in pdf.iterrows():
        tokens = row["text"].split(" ")
        sim = 0
        for j in range(16):
            s = sum(1 if (_h64_py(t) >> j) & 1 == 1 else -1 for t in tokens)
            if s >= 0:
                sim |= 1 << j
        assert got[row["doc_id"]] == sim, row["text"][:40]


def test_ivf_train_matches_numpy(spark):
    """Lloyd's iterations with fixed-point mean accumulation must equal a
    straightforward numpy reference bit-for-bit (the same quantization)."""
    import numpy as np

    from rtree_cpp_spark.operators.similarity import ivf_train

    rng = np.random.default_rng(7)
    n, dim, k = 60, 8, 4
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [list(map(float, e)) for e in emb]})
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")

    got = (
        ivf_train(df, n_centroids=k, n_iters=2)
        .toPandas()
        .sort_values("cent_id")
        .reset_index(drop=True)
    )

    E = emb.astype(np.float64)
    cent = E[:k].copy()
    for _ in range(2):
        # argmin by (sq_l2, cent_id), computed with the same left-fold order
        d = np.zeros((n, k))
        for j in range(dim):
            diff = E[:, j : j + 1] - cent[:, j : j + 1].T
            d = d + diff * diff
        asg = np.argmin(d, axis=1)  # ties -> lowest index, same as (l2, cent_id)
        new = cent.copy()
        for c in range(k):
            members = E[asg == c]
            if len(members):
                q = np.floor(members * (1 << 30)).astype(np.int64)
                new[c] = q.sum(axis=0).astype(np.float64) / (float(len(members)) * float(1 << 30))
        cent = new
    for i in range(k):
        assert list(got["centroid"][i]) == list(cent[i]), f"centroid {i} differs"


def test_knn_job_rejects_nonpositive_k(monkeypatch):
    """Mirrors the reference CLI's k validation (src/Main.cpp:212-215)."""
    import jobs.run_knn as rk

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_knn.py", "--output", "/tmp/x", "--manifest", "/tmp/y",
            "--input", "/tmp/a", "--queries", "/tmp/q", "--k", "0",
        ],
    )
    with pytest.raises(SystemExit):
        rk.main()


def _union_find_components(n_ids, pairs):
    """Driver-side union-find oracle: {doc_id: min reachable doc_id}."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def test_duplicate_components_chain_graph(spark):
    """Adversarial path graph 9-8-...-0: min label must travel the whole
    chain — exercises the pointer-jumping O(log diameter) convergence."""
    ids = list(range(10))
    chain = [(i, i + 1) for i in range(9)]
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": ids + [100, 200]}))
    pairs = spark.createDataFrame(
        pd.DataFrame(chain + [(100, 200)], columns=["a_doc_id", "b_doc_id"])
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in dedup.duplicate_components(docs, pairs=pairs).collect()
    }
    exp = _union_find_components(ids + [100, 200], chain + [(100, 200)])
    assert got == exp
    assert got[9] == 0 and got[200] == 100


def test_duplicate_components_from_lsh(spark):
    """End-to-end: exact dup docs land in one component via LSH pairs;
    distinct docs stay singletons."""
    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                dup_text,
                dup_text,
                dup_text + " iota",
                "totally different words entirely unrelated content here",
                "short",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: r["component_id"]
        for r in dedup.duplicate_components(docs).collect()
    }
    assert got[1] == 1 and got[2] == 1  # exact dups share all bands
    assert got[4] == 4 and got[5] == 5  # singletons keep their own id
    assert set(got) == {1, 2, 3, 4, 5}  # output is a partition of the corpus


def test_simhash_pairs_blocking_is_lossless(spark):
    """Pigeonhole-blocked pairs == brute-force popcount pairs."""
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    texts = [" ".join(words)] * 2 + [
        " ".join(words[:-1] + ["iota"]),
        " ".join(reversed(words)),
        "completely different content with other tokens entirely",
        "short text",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    sigs = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    brute = set()
    for a in sigs:
        for b in sigs:
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                brute.add((a, b, bin(sigs[a] ^ sigs[b]).count("1")))
    got = {
        (r.a_doc_id, r.b_doc_id, r.hamming)
        for r in dedup.simhash_pairs(docs).collect()
    }
    assert got == brute
    assert (0, 1, 0) in got  # identical docs at hamming 0


def test_pipeline_curation_stages(spark):
    """Each curation stage visibly acts: low-quality dropped, exact dups
    collapsed to min id, near-dups collapsed to cluster representative,
    unique docs kept."""
    from rtree_cpp_spark.operators.pipeline import curate

    rich = " ".join(f"w{i}" for i in range(40))          # high diversity + length
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                rich,                    # representative (min id of 1,2,3 cluster)
                rich,                    # exact dup of 1 -> dropped at exact stage
                rich + " extra",         # near-dup of 1 -> dropped at cluster stage
                "spam " * 50,            # 1 distinct token of 50 -> low quality
                " ".join(f"u{i}" for i in range(40)),  # unique survivor
            ],
        }
    )
    got = sorted(r.doc_id for r in curate(spark.createDataFrame(pdf)).collect())
    assert got == [1, 5]


def test_ivf_trained_topk_composition(spark):
    """Serving from trained centroids: every vector assigned, each query
    gets exactly k ranked neighbors, and results differ from the
    seed-centroid index only via the quantizer (recall shape intact)."""
    import numpy as np

    from pyspark.sql import functions as F

    from rtree_cpp_spark.operators import similarity

    rng = np.random.default_rng(11)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(60),
                "embedding": [rng.normal(size=8).astype("float32").tolist() for _ in range(60)],
            }
        )
    )
    trained = similarity.ivf_train(emb, n_centroids=4, n_iters=2).select(
        "cent_id", F.col("centroid").alias("c_emb")
    )
    asg = similarity.ivf_assign(emb, 4, trained).toPandas()
    assert len(asg) == 60 and asg["vec_id"].is_unique
    top = similarity.ivf_topk(emb, n_queries=5, k=3, n_centroids=4, n_probe=2, centroids=trained).toPandas()
    assert sorted(top.groupby("query_vec_id")["rank"].apply(list).iloc[0]) == [1, 2, 3]
    assert top.groupby("query_vec_id").size().eq(3).all()


def test_funnel_ordered_semantics(spark):
    """A click BEFORE the first view must not advance the funnel; equal
    timestamps do (non-strict)."""
    import pandas as pd

    from rtree_cpp_spark.operators import events as ev

    rows = [
        # u1: full ordered funnel
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        # u2: click precedes the only view -> stops at view
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        (2, "purchase", "2024-01-01 11:00:00"),  # no qualifying click -> not counted
        # u3: equal timestamps progress (non-strict)
        (3, "view", "2024-01-01 12:00:00"),
        (3, "click", "2024-01-01 12:00:00"),
        # u4: purchase only -> counted nowhere
        (4, "purchase", "2024-01-01 13:00:00"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    got = {r.step_name: r.n_users for r in ev.funnel(spark.createDataFrame(pdf)).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_pathological_single_user(spark):
    """Skew hardening (docs/SCALE.md): one user owning a huge share of
    the event stream funnels through ONE per-user array build — the
    groupBy(user) key is maximally skewed.  Correctness must hold and the
    arrays must be time-sorted regardless of input partitioning."""
    import numpy as np
    import pandas as pd

    from rtree_cpp_spark.operators import events as ev

    n = 60_000
    rng = np.random.default_rng(7)
    # one hot user interleaving all three steps in random input order,
    # plus a handful of normal users
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.permutation(n), unit="s"
    )
    hot = pd.DataFrame(
        {
            "user_id": 99,
            "event_type": np.where(
                np.arange(n) % 3 == 0, "view",
                np.where(np.arange(n) % 3 == 1, "click", "purchase"),
            ),
            "ts": ts,
        }
    )
    cold = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "event_type": ["view", "click", "view"],
            "ts": pd.to_datetime(
                ["2024-01-02 00:00:00", "2024-01-02 00:00:01", "2024-01-02 00:00:00"]
            ),
        }
    )
    df = spark.createDataFrame(pd.concat([hot, cold], ignore_index=True)).repartition(8)
    got = {r.step_name: r.n_users for r in ev.funnel(df).collect()}
    # the hot user has every type scattered through time: with 20k of
    # each type uniformly interleaved, a click after the first view and a
    # purchase after that click exist with certainty
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_rolling_hash_null_text_parity(spark):
    """NULL text hashes to NULL in BOTH impls (the kernel must not hash
    the literal string 'None')."""
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["abc", None, ""]})
    df = spark.createDataFrame(pdf)
    for impl in ("expr", "kernel"):
        got = {r.doc_id: r.roll_hash for r in text_analysis.rolling_hash(df, impl=impl).collect()}
        assert got[2] is None, impl
        assert got[3] == 0, impl
        assert got[1] is not None and got[1] > 0, impl


def test_simhash_pairs_wider_signature(spark):
    """The bits knob is real: 32-bit signatures (the realistic-corpus
    setting — 16-bit birthday collisions vanish) still block losslessly."""
    words = [f"tok{i}" for i in range(30)]
    texts = [
        " ".join(words),
        " ".join(words[:-2] + ["changed", "words"]),
        "entirely different other vocabulary here now",
        " ".join(reversed(words)),
    ]
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    sigs = {r.doc_id: r.simhash for r in dedup.simhash(docs, bits=32).collect()}
    brute = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r.a_doc_id, r.b_doc_id, r.hamming)
        for r in dedup.simhash_pairs(docs, max_hamming=3, bits=32, n_bands=4).collect()
    }
    assert got == brute


def test_repetition_stats_known_values(spark):
    texts = [
        "a a a a",                  # top token 4/4, top 2-gram "a a" 3 -> 6/4 capped? no cap: 1.5
        "a b a b a b",              # top token 3/6, "a b" x3 -> 6/6, dup (6-2)/6
        "w x y z",                  # all distinct: 1/4, 2-grams unique 2/4
        "solo",                     # single token: 2-gram frac NULL
    ]
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = {r.doc_id: r for r in text_analysis.repetition_stats(docs).collect()}
    assert got[0].top_token_frac == 1.0 and got[0].dup_token_frac == 0.75
    assert got[0].top_2gram_frac == 1.5  # overlapping grams can exceed 1 by design
    assert got[1].top_token_frac == 0.5 and got[1].top_2gram_frac == 1.0
    assert abs(got[1].dup_token_frac - round(4 / 6, 6)) < 1e-12
    assert got[2].top_token_frac == 0.25 and got[2].top_2gram_frac == 0.5
    assert got[3].top_2gram_frac is None and got[3].top_token_frac == 1.0


def test_decontaminate_overlap(spark):
    # doc 0 (0 % 97 == 0) is the benchmark; doc 1 shares a 3-gram run,
    # doc 2 shares nothing
    texts = {
        0: "alpha beta gamma delta",
        1: "x alpha beta gamma y",
        2: "p q r s t u",
    }
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {r.doc_id: r for r in text_analysis.decontaminate(docs, n=3).collect()}
    assert set(got) == {1, 2}  # benchmark doc excluded from the scan side
    assert got[1].n_grams == 3 and got[1].n_contaminated == 1
    assert got[1].contamination_frac == round(1 / 3, 6)
    assert got[2].n_contaminated == 0 and got[2].contamination_frac == 0.0


def test_decontaminate_broadcast_gate_paths_identical(spark):
    # the broadcast hint is size-gated on the bench doc count: force
    # BOTH paths (threshold above / below the probe) and assert the
    # plans differ only in strategy, never in rows
    texts = {i: f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5} w{i} tail" for i in range(30)}
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}),
        schema="doc_id long, text string",
    )
    hinted = text_analysis.decontaminate(docs, n=3, bench_mod=7, broadcast_max_bench_docs=10**6)
    unhinted = text_analysis.decontaminate(docs, n=3, bench_mod=7, broadcast_max_bench_docs=0)
    assert "ResolvedHint" not in unhinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    rows_h = sorted(map(tuple, hinted.collect()))
    rows_u = sorted(map(tuple, unhinted.collect()))
    assert rows_h == rows_u and len(rows_h) > 0


def test_pii_scan_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "mail a@b.com and c.d@e.org ip 192.168.0.1 call 555-1234 end",
                    "no pii here",
                ],
            }
        )
    )
    got = {r.doc_id: r for r in text_analysis.pii_scan(docs).collect()}
    assert (got[0].n_emails, got[0].n_ips, got[0].n_phones) == (2, 1, 1)
    assert (got[1].n_emails, got[1].n_ips, got[1].n_phones) == (0, 0, 0)
    redacted = "mail <EMAIL> and <EMAIL> ip <IP> call <PHONE> end"
    assert got[0].redacted_hash == hashlib.md5(redacted.encode()).hexdigest()
    assert got[1].redacted_hash == hashlib.md5(b"no pii here").hexdigest()


def test_with_synthetic_pii_deterministic(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [6, 7, 14], "text": ["x", "y", "z"]})
    )
    got = {r.doc_id: r.text for r in text_analysis.with_synthetic_pii(docs).collect()}
    assert got[6] == "x"  # untouched
    assert "@ex.com" in got[7] and "555-" in got[14]
    scan = {r.doc_id: r for r in text_analysis.pii_scan(text_analysis.with_synthetic_pii(docs)).collect()}
    assert (scan[7].n_emails, scan[7].n_ips, scan[7].n_phones) == (1, 1, 1)


def test_decontaminate_zero_gram_doc(spark):
    # a doc shorter than n tokens has 0 grams; frac is 0.0, not an ANSI
    # divide-by-zero error (regression: ANSI raises on 0/0 even doubles)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["alpha beta gamma", "x y"]})
    )
    got = {r.doc_id: r for r in text_analysis.decontaminate(docs, n=3).collect()}
    assert got[1].n_grams == 0 and got[1].contamination_frac == 0.0


def test_vocab_stats_counts(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b a", "b c", "c c c"]})
    )
    got = {r.token: (r.coll_freq, r.doc_freq) for r in text_analysis.vocab_stats(docs).collect()}
    assert got == {"a": (2, 1), "b": (2, 2), "c": (4, 2)}


def test_tfidf_topk_ranks_rare_terms_higher(spark):
    # "rare" appears once in one doc; "common" in every doc -> idf(common)
    # is ln(4/4)=0 so rare must outrank it wherever both occur
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["common rare common", "common x", "common y"],
            }
        )
    )
    rows = text_analysis.tfidf_topk(docs, k=2).collect()
    top1 = {r.doc_id: r.token for r in rows if r.rnk == 1}
    assert top1[1] == "rare"
    d1 = {r.token: r for r in rows if r.doc_id == 1}
    assert d1["rare"].tfidf > d1["common"].tfidf
    assert d1["common"].tfidf == 0.0  # ln((3+1)/(3+1)) = 0
    # rnk dense from 1, at most k rows per doc
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 2 for v in per_doc.values())


def test_quantize_embeddings_roundtrip_and_bounds(spark):
    from rtree_cpp_spark.operators import similarity

    embs = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1, 2],
                "embedding": [
                    [0.5, -1.0, 0.25, 0.0],   # maxabs 1.0 -> scale 1/127
                    [0.0, 0.0, 0.0, 0.0],     # zero vector -> q all 0
                    [2.0, -2.0, 1.0, -0.5],
                ],
            }
        ),
        "vec_id long, embedding array<float>",
    )
    rows = similarity.quantize_embeddings(embs).collect()
    assert len(rows) == 12
    by = {(r.vec_id, r.pos): r for r in rows}
    assert all(-127 <= r.q <= 127 for r in rows)
    # extremes hit exactly +/-127
    assert by[(0, 1)].q == -127 and by[(2, 0)].q == 127 and by[(2, 1)].q == -127
    # zero vector: scale 0, q 0 (no ANSI divide-by-zero)
    assert all(by[(1, p)].q == 0 and by[(1, p)].scale == 0.0 for p in range(4))
    # dequant error bounded by scale/2 (half-up rounding)
    import math
    for r in rows:
        if r.scale > 0:
            orig = {0: [0.5, -1.0, 0.25, 0.0], 2: [2.0, -2.0, 1.0, -0.5]}[r.vec_id][r.pos]
            assert math.isclose(r.q * r.scale, orig, abs_tol=r.scale / 2 + 1e-12)


def test_tfidf_topk_plan_uses_window_group_limit(spark):
    """The per-doc top-k must push a WindowGroupLimit below the window
    shuffle so only k rows per doc are exchanged."""
    import contextlib
    import io

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = text_analysis.tfidf_topk(docs, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_events_transitions_counts_and_order(spark):
    from rtree_cpp_spark.operators import events as ev

    pdf = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00"] * 2 + ["2024-01-01 00:00:01"] * 4
            ),
            "user_id": [1, 1, 1, 2, 2, 3],
            "event_type": ["a", "b", "a", "x", "y", "z"],
        }
    )
    got = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in ev.transitions(spark.createDataFrame(pdf)).collect()
    }
    # user 1: a->b (tie ts broken by event_id), b->a; user 2: x->y;
    # user 3: single event, no transition
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("x", "y"): 1}


def test_shingle_dup_stats(spark):
    """Cross-doc duplicated-shingle stats: closed-form fixture covering
    a shared shingle (cross-doc dup), a doc whose only repetition is
    WITHIN itself (not a cross-doc dup), and a doc too short to shingle
    (restored with zero counts)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                # docs 0 and 1 share the shingle "a b c"
                "a b c d",        # shingles: "a b c", "b c d"
                "z a b c",        # shingles: "z a b", "a b c"
                # doc 2 repeats its own shingle but shares none: "p q p"
                # appears twice IN doc 2 only -> distinct postings, so
                # min(doc)=max(doc) -> NOT a cross-doc dup
                "p q p q p",      # shingles: "p q p", "q p q", "p q p"
                "xy",             # < 3 tokens: no shingles
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_dup_shingles"], r["dup_fraction"])
        for r in dedup.shingle_dup_stats(docs).collect()
    }
    assert got[0] == (2, 1, 0.5)
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 0, 0.0)  # distinct shingles: "p q p", "q p q"
    assert got[3] == (0, 0, 0.0)
