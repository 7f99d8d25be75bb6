"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyra_spark.pipeline import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (1, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dup of 0
        (2, "THE QUICK  brown fox jumps over the lazy dog and runs away fast"),  # norm dup of 0
        (3, "the quick brown fox jumps over the lazy cat and runs away fast"),  # near dup (1 word)
        (4, "completely different content about spark dataframes and shuffles here"),
        (5, "short text"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- exact dedup ---------------------------------------------------------------
def test_exact_duplicates_normalized(docs):
    got = dedup.exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0]["dup_count"] == 3 and got[0]["min_doc_id"] == 0 and got[0]["max_doc_id"] == 2


def test_duplicate_id_samples_bounded_on_mega_group(spark):
    """One content duplicated 10k× must yield a ≤k sample list, exact count,
    and constant-size buffers in exact_duplicates (min/max only)."""
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.lit("same boilerplate text here").alias("text")
    )
    exact = dedup.exact_duplicates(df).collect()
    assert len(exact) == 1
    assert exact[0]["dup_count"] == 10_000
    assert exact[0]["min_doc_id"] == 0 and exact[0]["max_doc_id"] == 9_999
    samp = dedup.duplicate_id_samples(df, k=5).collect()
    assert len(samp) == 1
    assert samp[0]["dup_count"] == 10_000 and samp[0]["sample_ids"] == [0, 1, 2, 3, 4]


def test_distinct_by_content_keeps_min_id(docs):
    kept = sorted(r.doc_id for r in dedup.distinct_by_content(docs).collect())
    assert kept == [0, 3, 4, 5, 6]


# --- minhash / jaccard -----------------------------------------------------------
def test_minhash_finds_near_dup_and_skips_distinct(docs):
    got = dedup.minhash_near_duplicates(docs.filter("text <> ''"), threshold=0.5)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in got.collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0
    assert (0, 3) in pairs and 0.5 <= pairs[(0, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_recall_vs_exact_jaccard(docs):
    """LSH candidates must cover every truly-similar pair (recall on this set)."""
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs.filter("text <> ''"), threshold=0.7).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_near_duplicates(docs.filter("text <> ''"), threshold=0.7).collect()
    }
    assert exact == lsh


def test_incremental_dedup_vs_store(docs, tmp_path):
    """Snapshot-vs-store dedup: persist the base corpus's signature store,
    then dedup a new snapshot against it without re-signaturing the base.
    Exact matches and near-dups must equal the self-join ground truth
    restricted to new×base pairs."""
    base = docs.filter("doc_id <= 3 and text <> ''")
    new = docs.sparkSession.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog and runs away fast"),  # = base 0
            (101, "the quick brown fox jumps over the lazy cat and runs away SLOW"),  # near base 3
            (102, "entirely novel snapshot content with no counterpart in the base"),
            (103, None),
            (104, "   "),
        ],
        "doc_id long, text string",
    )
    store_path = str(tmp_path / "sigstore")
    dedup.signature_store(base).write.parquet(store_path)
    store = docs.sparkSession.read.parquet(store_path)

    exact = {
        (r.new_id, r.n_base_matches, r.first_base_id)
        for r in dedup.incremental_exact_duplicates(new, store).collect()
    }
    # base 0,1,2 normalize to the same content → 3 matches, first id 0
    assert exact == {(100, 3, 0)}

    near = {
        (r.new_id, r.base_id): r.jaccard
        for r in dedup.incremental_near_duplicates(new, store, base, threshold=0.4).collect()
    }
    assert (100, 0) in near and near[(100, 0)] == 1.0
    assert (100, 1) in near and (100, 2) in near
    assert (101, 3) in near and 0.4 <= near[(101, 3)] < 1.0
    assert not any(nid == 102 or nid in (103, 104) for nid, _ in near)
    # ground truth: exhaustive jaccard over the union, restricted to new×base
    both = base.unionByName(new.filter("text is not null and trim(text) <> ''"))
    truth = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b)): r.jaccard
        for r in dedup.ngram_jaccard_pairs(both, threshold=0.4, shingle_k=3).collect()
        if (r.id_a >= 100) != (r.id_b >= 100)
    }
    assert near == truth


def test_simhash_near_duplicates(docs):
    got = dedup.simhash_near_duplicates(docs.filter("text <> ''"), max_hamming=6, chunks=8)
    pairs = {(r.id_a, r.id_b): r.hamming for r in got.collect()}
    assert pairs[(0, 1)] == 0 and pairs[(0, 2)] == 0
    # docs 0 vs 3 differ by one word → hamming 3 (measured, xxhash64 engine);
    # 8-chunk blocking guarantees recall up to hamming 7
    assert pairs[(0, 3)] == 3
    assert not any(4 in p for p in pairs)


def test_simhash_default_blocking_same_pairs(docs):
    """The scale-safe default (16-bit blocks) must find the same near-dup set
    as the legacy 8-bit-chunk explicit setting on the small corpus."""
    legacy = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_duplicates(docs.filter("text <> ''"), max_hamming=6, chunks=8).collect()
    }
    default = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_duplicates(docs.filter("text <> ''"), max_hamming=6).collect()
    }
    assert legacy == default


def test_simhash_candidate_count_bounded(spark):
    """The web-scale contract (VERDICT r3 #1): blocking must emit ≪ n²
    candidates on a RANDOM-hash corpus. 16-bit keys give ~4·n²/2/2¹⁶ ≈ 0.3n
    exact candidates and ~17× that with hamming-7 probing; the old 8-bit
    chunk keys would emit ~8·n²/2/2⁸ ≈ 156n and fail this bound."""
    n = 10_000
    hashes = spark.range(n).select(F.col("id").alias("doc_id"), F.xxhash64("id").alias("simhash"))
    assert dedup.simhash_candidate_pairs(hashes, max_hamming=3).count() < 50 * n
    assert dedup.simhash_candidate_pairs(hashes, max_hamming=7).count() < 50 * n


def test_simhash_probe_recall_at_high_hamming(spark):
    """max_hamming ≥ chunks engages multi-probe: every planted pair at
    hamming EXACTLY 7 must surface even though no 16-bit block need match
    exactly (pigeonhole: 7 flips over 4 blocks leave some block within 1)."""
    import random

    rnd = random.Random(11)

    def to_i64(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    rows, expected = [], set()
    for i in range(200):
        h = rnd.getrandbits(64)
        h2 = h
        for b in rnd.sample(range(64), 7):
            h2 ^= 1 << b
        rows.append((2 * i, to_i64(h)))
        rows.append((2 * i + 1, to_i64(h2)))
        expected.add((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_candidate_pairs(df, max_hamming=7)
        .filter("hamming <= 7")
        .collect()
    }
    assert expected <= got


# --- similarity search -----------------------------------------------------------
@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.standard_normal(16)  # near-dup of 0
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def np_topk(base, qi, k):
    sims = base @ base[qi] / (np.linalg.norm(base, axis=1) * np.linalg.norm(base[qi]))
    order = np.lexsort((np.arange(len(base)), -sims))
    return [int(i) for i in order[:k]]


def test_brute_force_topk_matches_numpy(vecs):
    queries = vecs.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    got = similarity.brute_force_topk(vecs, queries, k=5).orderBy("rank").collect()
    base = np.array(vecs.orderBy("vec_id").toPandas()["embedding"].tolist())
    assert [r.vec_id for r in got] == np_topk(base, 0, 5)
    assert got[0].vec_id == 0 and got[0].cos_sim == 1.0 and got[1].vec_id == 1


def test_all_pairs_above_finds_planted_dup(vecs):
    got = similarity.all_pairs_above(vecs, threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(0, 1)}


def test_lsh_topk_high_recall_on_near_dup(vecs):
    planes = similarity.random_hyperplanes(16, n_planes=4, seed=1)
    queries = vecs.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    got = similarity.lsh_topk(vecs, queries, planes, k=3).orderBy("rank").collect()
    # near-identical vectors land in the same bucket: 0 and its planted dup 1
    ids = [r.vec_id for r in got]
    assert ids[0] == 0 and 1 in ids


def test_lsh_topk_multiprobe_recall_at_many_planes(spark):
    """VERDICT r3 #4: at n_planes=16 the exact-bucket join loses neighbors
    that disagree on a single plane; hamming-1 probing must recover ≥ 0.9
    recall of planted 0.99-cosine neighbors while each query still scores
    ≪ n candidates (17 buckets of ~n/2¹⁶ expected occupancy)."""
    rng = np.random.default_rng(3)
    n, dim, nq = 2000, 32, 25
    base = rng.standard_normal((n, dim))
    for qi in range(nq):  # planted near-dup of query qi at corpus slot n-nq+qi
        v = base[qi] / np.linalg.norm(base[qi])
        base[n - nq + qi] = v + 0.01 * rng.standard_normal(dim)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    vecs16 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = similarity.random_hyperplanes(dim, n_planes=16, seed=5)
    queries = vecs16.filter(f"vec_id < {nq}").select(F.col("vec_id").alias("query_id"), "embedding")

    def recall(radius: int) -> float:
        got = similarity.lsh_topk(vecs16, queries, planes, k=3, probe_radius=radius).collect()
        hit = {r.query_id for r in got if r.vec_id == n - nq + r.query_id}
        return len(hit) / nq

    r_probe = recall(1)
    assert r_probe >= 0.9
    assert r_probe > recall(0)
    # candidate bound: corpus occupancy of the 17 probed buckets per query ≪ n
    from pyspark.sql import functions as SF

    corpus_b = similarity.assign_lsh_buckets(vecs16, planes)
    q_b = similarity.assign_lsh_buckets(queries, planes).select(
        "query_id",
        SF.explode(
            SF.array(*([SF.col("bucket")] + [SF.col("bucket").bitwiseXOR(SF.lit(1 << i)) for i in range(16)]))
        ).alias("bucket"),
    )
    n_cands = corpus_b.join(q_b, "bucket").count()
    assert n_cands < 0.05 * n * nq


# --- text analysis ----------------------------------------------------------------
def test_token_counts(spark):
    df = spark.createDataFrame([(1, "a b  c"), (2, ""), (3, "   "), (4, None)], "id int, text string")
    got = {r.id: r.n for r in df.select("id", text.token_count("text").alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: None}


def test_quality_score_orders_garbage_below_prose(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and it is a good day for running in the park"),
            (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
            (3, "123 456 789 000 111 222 333 444 555 666"),
        ],
        "id int, text string",
    )
    got = {r.id: r.quality_score for r in text.quality_score(df).collect()}
    assert got[1] > got[2] and got[1] > got[3]


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is happy"),
            (2, "der hund ist nicht zu haus und das ist gut"),
            (3, "el perro es grande y la casa es bonita"),
            (4, "le chat est dans la maison et ce pour quoi"),
            (5, "这是一个中文句子"),
            (6, "zzzz qqqq wwww"),
        ],
        "id int, text string",
    )
    got = {r.id: r.lang_pred for r in text.lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "zh", 6: "und"}


def test_fingerprint_stable_and_normalizing(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World foo bar baz qux"), (2, "hello world foo bar baz qux"), (3, "different text entirely here ok")],
        "id int, text string",
    )
    got = {r.id: r.fingerprint for r in text.fingerprint(df).collect()}
    assert got[1] == got[2] != got[3]


# --- multimodal plumbing -------------------------------------------------------
def test_multimodal_features_shape_and_determinism(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media).orderBy("media_id")
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feature) == 8 for r in rows)
    assert all(0.0 <= r.byte_mean <= 1.0 for r in rows)
    rows2 = multimodal.extract_features(multimodal.synth_media(spark, n=30)).orderBy("media_id").collect()
    assert [r.feature for r in rows] == [r.feature for r in rows2]


def test_multimodal_frame_sampling(spark):
    media = multimodal.synth_media(spark, n=30)
    frames = multimodal.sample_frames(media, every_n=10)
    pdf = frames.toPandas()
    assert (pdf["frame_idx"] % 10 == 0).all()
    meta = {r.media_id: r.meta.n_frames for r in media.filter("kind='video'").collect()}
    counts = pdf.groupby("media_id").size().to_dict()
    for mid, nf in meta.items():
        assert counts.get(mid, 0) == (nf + 9) // 10


# --- duplicate clusters (connected components) -------------------------------------
def _uf_components(n_edges):
    """Driver-side union-find ground truth: {node: min-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("driver_max_edges", [0, 1_000_000])  # distributed / driver path
@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 60, 40), (2, 200, 150), (3, 500, 520)])
def test_connected_components_matches_union_find(spark, seed, n_nodes, n_edges, driver_max_edges):
    """Both paths of the scale-adaptive hybrid must match a reference
    union-find (and therefore each other) on random graphs."""
    import random

    rnd = random.Random(seed)
    edges = {(rnd.randrange(n_nodes), rnd.randrange(n_nodes)) for _ in range(n_edges)}
    edges = {(a, b) for a, b in edges if a != b}
    df = spark.createDataFrame([(a, b) for a, b in sorted(edges)], "id_a long, id_b long")
    got = {
        r.node: r.component
        for r in dedup.connected_components(df, driver_max_edges=driver_max_edges).collect()
    }
    assert got == _uf_components(edges)


@pytest.mark.parametrize("driver_max_edges", [0, 1_000_000])
def test_connected_components_long_chain_and_star(spark, driver_max_edges):
    """Worst cases: a 64-node path (max diameter — needs the O(log² n)
    star contraction / pointer halving, not 1-hop min propagation) and a hub
    star whose center is the LARGEST id (min must flow against the
    orientation). Run on both hybrid paths."""
    chain = [(i, i + 1) for i in range(63)]
    hub = [(1000, 900 + i) for i in range(50)]
    edges = chain + hub
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component
        for r in dedup.connected_components(df, driver_max_edges=driver_max_edges).collect()
    }
    assert got == _uf_components(set(edges))
    assert all(got[i] == 0 for i in range(64))
    assert all(got[900 + i] == 900 for i in range(50)) and got[1000] == 900


def test_dedup_clusters_multi_hop(spark):
    """A~B and B~C above threshold but A~C below must still cluster together
    (pairs alone under-merge; components close the chain)."""
    base = "red blue green yellow purple orange black white pink brown"
    mid = base.replace("red", "cyan")              # 9/11 ≈ 0.82 jaccard vs base
    far = mid.replace("blue", "lime")              # 9/11 vs mid, 8/12 ≈ 0.67 vs base
    df = spark.createDataFrame(
        [(10, base), (11, mid), (12, far), (13, "totally unrelated content here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(df, threshold=0.75, shingle_k=1).collect()}
    assert got == {10: 10, 11: 10, 12: 10}


# --- IVF ANN -----------------------------------------------------------------------
def test_assign_ivf_buckets_both_paths_match_numpy(spark):
    """The codegen expression path (k<=64) and the Arrow pandas-UDF path
    (k>64) must both reproduce numpy's argmax bucket exactly."""
    rng = np.random.default_rng(9)
    vecs_np = rng.standard_normal((300, 8))
    cent70 = rng.standard_normal((70, 8))
    cent70 /= np.linalg.norm(cent70, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs_np)],
        "vec_id long, embedding array<double>",
    )
    for cent in (cent70[:16], cent70):  # expression path, then pandas path
        got = {
            r.vec_id: r.bucket
            for r in similarity.assign_ivf_buckets(df, cent).collect()
        }
        want = np.argmax(vecs_np @ cent.T, axis=1)
        assert got == {i: int(want[i]) for i in range(len(vecs_np))}


def test_ivf_topk_recall_on_clustered_corpus(spark):
    """IVF with nprobe=2 over a clustered corpus: ≥ 0.9 of brute-force top-3
    neighbors recovered, scoring only ~nprobe/k of the corpus per query."""
    rng = np.random.default_rng(21)
    kc, per, dim = 8, 250, 16
    # orthonormal center directions: angularly separated, so the spherical
    # k-means quantizer can recover one bucket per planted cluster
    centers = np.linalg.qr(rng.standard_normal((dim, dim)))[0][:kc] * 4
    base = np.concatenate([centers[c] + 0.5 * rng.standard_normal((per, dim)) for c in range(kc)])
    n = len(base)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    cents = similarity.train_ivf_centroids(df, k=kc, iters=10, seed=4)
    queries = df.filter("vec_id % 100 = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.brute_force_topk(df, queries, k=3).collect()
    approx = similarity.ivf_topk(df, queries, cents, k=3, nprobe=2).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    assert len(exact_set & approx_set) / len(exact_set) >= 0.9
    # candidate bound: each query's probed buckets hold ≪ n corpus vectors
    bucketed = similarity.assign_ivf_buckets(df, cents)
    sizes = {r.bucket: r.cnt for r in bucketed.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
    assert max(sizes.values()) * 2 < 0.6 * n  # 2 probes of the biggest bucket ≪ corpus


# --- repetition & decontamination -------------------------------------------------
def test_repetition_features_flags_looping_text(spark):
    rows = [
        (0, "buy now " * 30),                      # one 2-gram dominates
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "one"),                                # < 2 words: no 2-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in text.repetition_features(df).collect()}
    assert 2 not in got                            # too short to carry n-grams
    assert got[0].flag_repetitive and got[0].top_2gram_frac > 0.4
    assert not got[1].flag_repetitive and got[1].dup_3gram_frac == 0.0
    # "buy now buy now ..." : 59 bigrams, 2 distinct
    assert abs(got[0].dup_2gram_frac - 57 / 59) < 1e-6


def test_ngram_overlap_decontaminates_planted_copy(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows_bench = [(100, bench_text)]
    rows_corpus = [
        (0, "prefix words " + bench_text + " suffix words"),  # contains bench 8-grams
        (1, "totally unrelated words about spark shuffles and broadcast joins here"),
        (2, "alpha beta gamma"),                              # < 8 words: never matches
    ]
    bench = spark.createDataFrame(rows_bench, "doc_id long, text string")
    corpus = spark.createDataFrame(rows_corpus, "doc_id long, text string")
    got = {(r.doc_id, r.bench_id): r.shared_ngrams for r in
           text.ngram_overlap_pairs(corpus, bench, n=8).collect()}
    # bench has 3 distinct 8-grams; doc 0 contains all of them
    assert got == {(0, 100): 3}


def test_ngram_overlap_benchmark_side_broadcast(spark):
    bench = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id long, text string")
    corpus = spark.createDataFrame([(2, "a b c d e f g h i j")], "doc_id long, text string")
    plan = text.ngram_overlap_pairs(corpus, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pii_scrub_counts_and_redacts(spark):
    rows = [
        (0, "mail a.b+c@ex-ample.org and 192.168.1.254 twice: x@y.io"),
        (1, "clean text"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in text.pii_scrub(df).collect()}
    assert got[0].n_email == 2 and got[0].n_ipv4 == 1
    assert "@" not in got[0].text_redacted and "192" not in got[0].text_redacted
    assert got[1].n_email == 0 and got[1].text_redacted == "clean text"
    assert got[2].n_email == 0 and got[2].text_redacted is None


def test_line_dedup_scrubs_corpus_wide_boilerplate(spark):
    rows = [
        (0, "unique opening zero\nCopyright Example Corp\nbody zero"),
        (1, "unique opening one\nCopyright Example Corp\n\nbody one"),
        (2, "standalone doc\nCopyright Example Corp\nCopyright Example Corp"),
        (3, "no boilerplate at all"),
        (4, None),
        (5, "only  Copyright Example Corp  "),  # trim-normalized match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dup = {r.line_hash: (r.n_docs, r.n_occurrences) for r in dedup.duplicate_lines(df).collect()}
    # trim-equal banner appears in docs 0,1,2 (doc 2 twice) — doc 5's line
    # differs (interior double space) and stays unique
    assert len(dup) == 1
    (nd, no), = dup.values()
    assert (nd, no) == (3, 4)
    got = {r.doc_id: r for r in dedup.scrub_duplicate_lines(df).collect()}
    assert got[0].text_scrubbed == "unique opening zero\nbody zero"
    assert got[0].n_lines_removed == 1
    # empty line survives; both banner copies in doc 2 go
    assert got[1].text_scrubbed == "unique opening one\n\nbody one"
    assert got[2].text_scrubbed == "standalone doc" and got[2].n_lines_removed == 2
    assert got[3].text_scrubbed == "no boilerplate at all" and got[3].n_lines_removed == 0
    assert got[4].text_scrubbed is None and got[4].n_lines_removed == 0
    assert got[5].n_lines_removed == 0


def test_line_dedup_min_docs_threshold(spark):
    rows = [(i, "shared line\nown line %d" % i) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.duplicate_lines(df, min_docs=4).count() == 0
    got = dedup.scrub_duplicate_lines(df, min_docs=4).collect()
    assert all(r.n_lines_removed == 0 for r in got)


def test_extract_urls_and_domain_stats(spark):
    rows = [
        (0, "see https://A.Example.org/Page?q=1 and http://b.net plus https://a.example.org/other"),
        (1, "ref http://b.net/x"),
        (2, "no links"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in text.extract_urls(df).collect()}
    assert got[0].n_urls == 3 and got[0].domains == ["a.example.org", "b.net", "a.example.org"]
    assert got[2].n_urls == 0 and got[3].n_urls == 0
    stats = {r.domain: (r.n_docs, r.n_urls) for r in text.domain_stats(df).collect()}
    # a.example.org: 1 doc, 2 mentions; b.net: 2 docs, 2 mentions
    assert stats == {"a.example.org": (1, 2), "b.net": (2, 2)}


def test_clean_corpus_end_to_end(spark):
    from lyra_spark.pipeline.clean import clean_corpus

    base = ("the quick brown fox jumps over the lazy dog while many people "
            "watch it run through the green field near the old stone bridge")
    near = base.replace("quick", "swift")  # near dup of base
    rows = [
        (0, base + "\nall rights reserved example corp"),
        (1, base + "\nall rights reserved example corp"),       # exact dup of 0 post-scrub
        (2, near + "\nall rights reserved example corp"),       # near dup of 0
        (3, "this is a completely different document about spark shuffle "
            "exchanges and the adaptive query execution planner in detail "
            "with plenty of ordinary english words to pass the filter"),
        (4, "!!! ??? !!! ??? 123 456 789 000 111 222"),          # garbage: filtered
        (5, "all rights reserved example corp"),                 # only boilerplate: empty after scrub
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = clean_corpus(df, min_quality=0.5, near_dup_threshold=0.8, shingle_k=1)
    kept = {r.doc_id: r for r in got.collect()}
    # 0 survives as representative (min id beats exact-dup 1 and near-dup 2);
    # 3 survives (unique, good quality); 4 garbage; 5 empty post-scrub
    assert set(kept) == {0, 3}
    assert "all rights reserved" not in kept[0].text
    assert kept[0].n_lines_removed == 1 and kept[3].n_lines_removed == 0
    assert kept[3].quality_score >= 0.5
    # deterministic: second run byte-identical
    again = {r.doc_id: r.text for r in clean_corpus(
        df, min_quality=0.5, near_dup_threshold=0.8, shingle_k=1).collect()}
    assert again == {k: v.text for k, v in kept.items()}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_line_dedup_matches_python_reference(spark, seed):
    """Randomized corpora vs a pure-Python reference of the pinned semantics
    (SEMANTICS.md #23): trim-exact membership, empty lines immune, within-doc
    repeats count once."""
    import random

    rnd = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    docs = {}
    for i in range(40):
        n = rnd.randint(0, 6)
        lines = []
        for _ in range(n):
            kind = rnd.random()
            if kind < 0.15:
                lines.append("")  # empty line
            elif kind < 0.3:
                lines.append("  ")  # whitespace-only
            else:
                words = rnd.sample(vocab, rnd.randint(1, 3))
                pad = " " * rnd.randint(0, 2)
                lines.append(pad + " ".join(words) + pad)
        docs[i] = "\n".join(lines)

    # reference: count distinct docs per trimmed non-empty line
    from collections import defaultdict

    per = defaultdict(set)
    for i, t in docs.items():
        for l in t.split("\n"):
            if l.strip():
                per[l.strip()].add(i)
    dup = {l for l, ds in per.items() if len(ds) >= 2}

    def ref_scrub(t):
        kept = [l for l in t.split("\n") if not l.strip() or l.strip() not in dup]
        return "\n".join(kept), len(t.split("\n")) - len(kept)

    df = spark.createDataFrame(sorted(docs.items()), "doc_id long, text string")
    got = {r.doc_id: (r.text_scrubbed, r.n_lines_removed)
           for r in dedup.scrub_duplicate_lines(df).collect()}
    assert got == {i: ref_scrub(t) for i, t in docs.items()}


def test_clean_cli_end_to_end(tmp_path, spark):
    """jobs/clean.py: cleaned parquet written, funnel report consistent."""
    import json

    from jobs.clean import main

    base = ("the quick brown fox jumps over the lazy dog while many people "
            "watch it run through the green field near the old stone bridge")
    rows = [
        (0, base),
        (1, base),                                   # exact dup
        (2, base.replace("quick", "swift")),         # near dup
        (3, "a totally different document with plenty of ordinary english "
            "words about query planners and shuffle exchange strategies"),
        (4, "!!! ??? 123 456 789 000"),               # garbage
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "cleaned")
    rpt = str(tmp_path / "report.json")
    rc = main(["--corpus", src, "--out", out, "--report", rpt,
               "--near-dup-threshold", "0.8", "--shingle-k", "1"])
    assert rc == 0
    rep = json.loads(open(rpt).read())
    assert rep["docs_in"] == 5 and rep["after_quality"] == 4
    assert rep["after_exact_dedup"] == 3 and rep["docs_out"] == 2
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 3}


def test_cap_per_group_deterministic(spark):
    from lyra_spark.pipeline.clean import cap_per_group

    rows = [(i, "g%d" % (i % 3), "t") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    got = sorted(r.doc_id for r in cap_per_group(df, "grp", k=2).collect())
    # per group, the two SMALLEST ids survive
    assert got == [0, 1, 2, 3, 4, 5]
    assert cap_per_group(df, "grp", k=100).count() == 20


def test_filter_blocked_domains_both_paths(spark):
    from lyra_spark.pipeline.text import filter_blocked_domains

    rows = [
        (1, "visit https://bad.example.com/x now"),
        (2, "see http://good.example.org/page"),
        (3, "mixed http://good.example.org and https://BAD.example.com/y"),
        (4, "no urls at all"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    want = {2, 4, 5}
    got_lit = {r.doc_id for r in filter_blocked_domains(df, ["bad.example.com"]).collect()}
    assert got_lit == want
    bl = spark.createDataFrame([("Bad.Example.Com",)], "domain string")
    got_df = {r.doc_id for r in filter_blocked_domains(df, bl).collect()}
    assert got_df == want


def test_clean_cli_blocklist_and_cap(tmp_path, spark):
    """--block-domains drops linking docs before the funnel; --cap-col/--cap-k
    caps groups after dedup; the report carries the blocklist attrition."""
    import json

    from jobs.clean import main

    base = ("a perfectly ordinary english document with plenty of words about "
            "query planners and shuffle exchange strategies in modern engines")
    rows = [
        (0, base + " zero", "s1"),
        (1, base + " one", "s1"),
        (2, base + " two", "s1"),
        (3, base + " three see https://spam.example.com/x", "s1"),
        (4, base + " four", "s2"),
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)
    out = str(tmp_path / "cleaned")
    rpt = str(tmp_path / "report.json")
    rc = main([
        "--corpus", src, "--out", out, "--report", rpt,
        "--near-dup-threshold", "0.99", "--shingle-k", "3",
        "--block-domains", "spam.example.com",
        "--cap-col", "source", "--cap-k", "2",
    ])
    assert rc == 0
    rep = json.loads(open(rpt).read())
    assert rep["docs_in"] == 5 and rep["blocked_by_domain"] == 1
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    # doc 3 blocked; s1 capped to its 2 smallest surviving ids; s2 keeps doc 4
    assert got == {0, 1, 4}


def test_strip_markup(spark):
    from lyra_spark.pipeline.text import strip_markup

    rows = [
        (1, '<html><body><p class="x">Hello &amp; welcome</p><br/>to <b>the</b> page</body></html>'),
        (2, "plain text with 1 < 2 and a<b comparisons"),
        (3, "&lt;escaped&gt; &quot;quotes&quot; &#39;apos&#39; &nbsp;spaced"),
        (4, None),
        (5, "use &amp;lt; for a literal less-than"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.text_plain for r in strip_markup(df).collect()}
    # </p> and <br/> are block separators → newline (line structure is
    # preserved for the line-level scrub; SEMANTICS.md row 70)
    assert got[1] == "Hello & welcome\nto the page"
    assert got[2] == "plain text with 1 < 2 and a<b comparisons"
    assert got[3] == '<escaped> "quotes" \'apos\' spaced'
    assert got[4] is None
    # double-escaped entity decodes exactly once (&amp; is decoded LAST)
    assert got[5] == "use &lt; for a literal less-than"


def test_clean_corpus_strip_markup_first(spark):
    """strip_markup_first=True: markup-wrapped near-identical docs dedup to
    one representative (tags would otherwise break quality and shingles)."""
    from lyra_spark.pipeline.clean import clean_corpus

    base = ("a perfectly ordinary english document with plenty of words about "
            "query planners and shuffle exchange strategies in modern engines")
    rows = [
        (0, "<html><p>" + base + "</p></html>"),
        (1, base),  # exact dup after stripping
        (2, "another clean document full of normal words describing window "
            "functions partition pruning and adaptive query execution today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df, near_dup_threshold=0.95, strip_markup_first=True)
    got = {r.doc_id: r.text for r in out.collect()}
    assert set(got) == {0, 2}
    assert got[0] == base  # representative carries the STRIPPED text
    assert out.columns[:2] == ["doc_id", "text"]


def test_profile_cli(tmp_path, spark):
    """jobs/profile_corpus.py: one JSON report with consistent counts."""
    import json

    from jobs.profile_corpus import main

    rows = [
        (0, "a perfectly ordinary english document about query planners and "
            "shuffle strategies see https://site.example.org/a", "s1"),
        (1, "a perfectly ordinary english document about query planners and "
            "shuffle strategies see https://site.example.org/a", "s1"),  # exact dup
        (2, "another clean english document describing window functions and "
            "partition pruning in detail", "s2"),
        (3, None, "s2"),
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)
    rpt = str(tmp_path / "profile.json")
    assert main(["--corpus", src, "--report", rpt]) == 0
    rep = json.loads(open(rpt).read())
    assert rep["n_docs"] == 4 and rep["n_null_text"] == 1
    assert rep["exact_dup_rate"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert rep["lang_distribution"].get("en") == 3
    assert rep["n_docs_with_urls"] == 2
    assert rep["top_domains"][0]["domain"] == "site.example.org"
    assert rep["top_domains"][0]["n_docs"] == 2
    assert "column_findings" not in rep  # opt-in only

    # --profile-cols: findings + heavy hitters on metadata columns
    rpt2 = str(tmp_path / "profile2.json")
    assert main(["--corpus", src, "--report", rpt2, "--profile-cols", "doc_id,source"]) == 0
    rep2 = json.loads(open(rpt2).read())
    findings = {(f["column"], f["finding"]) for f in rep2["column_findings"]}
    assert ("doc_id", "complete") in findings and ("doc_id", "candidate_key") in findings
    assert rep2["frequent_values"]["source"][0] == {"value": "s1", "count": 2}
    assert "key_skew" not in rep2  # opt-in only

    # --skew-cols: shuffle-key diagnosis per named column
    rpt3 = str(tmp_path / "profile3.json")
    assert main(["--corpus", src, "--report", rpt3, "--skew-cols", "source"]) == 0
    rep3 = json.loads(open(rpt3).read())
    sk = rep3["key_skew"]["source"]
    assert sk["n_keys"] == 2 and sk["n_rows"] == 4 and sk["max_count"] == 2
    assert sk["skew_ratio"] == 1.0 and sk["recommended_buckets"] == 1


def test_clean_cli_incremental_sig_store(tmp_path, spark):
    """First ingest writes a signature store; the second ingest drops docs the
    base corpus already holds (digest semi-join) before any funnel work."""
    import json

    from jobs.clean import main

    d_a = ("a perfectly ordinary english document with plenty of words about "
           "query planners and shuffle exchange strategies in modern engines")
    d_b = ("an entirely different report describing weather patterns over the "
           "north atlantic and their effect on shipping routes each winter")
    d_c = ("a third unrelated text on bread baking with sourdough starters "
           "hydration ratios and the ideal oven temperature for a good crust")
    snap1 = [(0, d_a), (1, d_b)]
    snap2 = [
        (10, d_a.upper()),        # already in base (normalized-equal to doc 0)
        (11, d_c),                # genuinely new
        (12, "  " + d_b + " "),   # already in base (normalized-equal to doc 1)
    ]
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    spark.createDataFrame(snap1, "doc_id long, text string").write.parquet(src1)
    spark.createDataFrame(snap2, "doc_id long, text string").write.parquet(src2)
    store = str(tmp_path / "store")
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    r1 = str(tmp_path / "r1.json")
    r2 = str(tmp_path / "r2.json")

    assert main(["--corpus", src1, "--out", out1, "--report", r1,
                 "--sig-store-out", store, "--shingle-k", "1"]) == 0
    st = spark.read.parquet(store)
    assert {"doc_id", "content_sha", "minhash"} <= set(st.columns)
    assert st.count() == 2

    assert main(["--corpus", src2, "--out", out2, "--report", r2,
                 "--sig-store", store, "--sig-store-out", store,
                 "--shingle-k", "1"]) == 0
    rep2 = json.loads(open(r2).read())
    assert rep2["already_in_base"] == 2
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == {11}
    # store grew by the cleaned snapshot's rows only
    assert spark.read.parquet(store).count() == 3


def test_pii_scrub_overlapping_counted_once(spark):
    """An IPv4 inside an email address redacts as ONE identifier and counts
    as one: each pattern counts on the previous patterns' redacted text,
    mirroring the redaction chain."""
    from lyra_spark.pipeline.text import pii_scrub

    df = spark.createDataFrame(
        [(1, "mail 10.1.2.3@mail.example.com now"), (2, "host 10.1.2.3 up")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[1].n_email == 1 and got[1].n_ipv4 == 0
    assert got[1].text_redacted == "mail [REDACTED] now"
    assert got[2].n_email == 0 and got[2].n_ipv4 == 1


def test_clean_corpus_preserves_input_feature_named_columns(spark):
    """An input column named like a quality feature (n_chars) passes through
    clean_corpus untouched instead of being clobbered by LENGTH(text)."""
    from lyra_spark.pipeline.clean import clean_corpus

    rows = [
        (0, "a perfectly ordinary english document with plenty of words about "
            "query planners and shuffle exchange strategies in modern engines", 777),
        (1, "another clean document full of normal words describing window "
            "functions partition pruning and adaptive query execution today", 888),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = clean_corpus(df)
    got = {r.doc_id: r.n_chars for r in out.collect()}
    assert got == {0: 777, 1: 888}
    assert out.columns[:3] == ["doc_id", "text", "n_chars"]


def test_export_cli_end_to_end(tmp_path, spark, capsys):
    """jobs/export.py: mixture → leakage-safe split → pack → shards. Layout
    is split=*/shard=*, splits are disjoint, no duplicate cluster straddles
    train/test, pack columns present, report totals consistent, and a rerun
    is byte-identical."""
    import glob
    import json as _json
    import os

    from jobs.export import main

    corpus = str(tmp_path / "corpus")
    (
        spark.range(0, 1200)
        .selectExpr(
            "id AS doc_id",
            "concat('doc number ', CAST(id % 400 AS STRING)) AS text",  # planted dups
            "CASE WHEN id % 2 = 0 THEN 'web' ELSE 'books' END AS source",
            "CAST(50 + id % 100 AS LONG) AS n_chars",
        )
        .write.mode("overwrite")
        .parquet(corpus)
    )
    out = str(tmp_path / "export")
    args = [
        "--corpus", corpus,
        "--out", out,
        "--shards", "4",
        "--mixture", "web=0.5,books=0.5",
        "--mixture-budget", "60000",
        "--split-weights", "train=0.8,test=0.2",
        "--leakage-safe",
        "--pack-budget", "512",
    ]
    assert main(args) == 0
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(report["splits"]) == {"train", "test"}

    train = spark.read.parquet(os.path.join(out, "split=train"))
    test = spark.read.parquet(os.path.join(out, "split=test"))
    assert {"shard", "position", "pack_id", "pack_offset"} <= set(train.columns)
    assert len(glob.glob(os.path.join(out, "split=train", "shard=*"))) == 4
    # packs are SHARD-LOCAL: offsets restart per shard, stay under budget,
    # and pack_id is nondecreasing in position — a loader streaming one
    # shard file assembles its packs contiguously
    for r0 in train.filter("position = 0").select("pack_id", "pack_offset").collect():
        assert (r0.pack_id, r0.pack_offset) == (0, 0)
    assert train.filter("pack_offset >= 512").count() == 0
    one_shard = sorted(
        (r.position, r.pack_id) for r in train.filter("shard = 0").collect()
    )
    assert all(a[1] <= b[1] for a, b in zip(one_shard, one_shard[1:]))
    # disjoint splits; totals match the report
    ids_train = {r.doc_id for r in train.select("doc_id").collect()}
    ids_test = {r.doc_id for r in test.select("doc_id").collect()}
    assert not (ids_train & ids_test)
    assert report["splits"]["train"]["docs"] == len(ids_train)
    assert report["splits"]["test"]["docs"] == len(ids_test)
    # leakage-safety: no normalized-content digest spans both splits
    both = train.select("doc_id", "text").unionByName(test.select("doc_id", "text"))
    labeled = both.withColumn(
        "s", F.col("doc_id").isin(list(ids_train)).cast("int")
    )
    dig = F.sha2(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), 256)
    straddle = (
        labeled.groupBy(dig.alias("d"))
        .agg(F.countDistinct("s").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert straddle == 0
    # deterministic rerun: same bytes per shard dir
    import hashlib

    def dir_hash(d):
        h = hashlib.sha256()
        for f in sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)):
            h.update(open(f, "rb").read())
        return h.hexdigest()

    h1 = dir_hash(out)
    assert main(args) == 0
    capsys.readouterr()
    assert dir_hash(out) == h1


def test_connected_components_rejects_string_ids(spark):
    """String ids must RAISE, not silently drop every edge through a NULL
    cast and report a clean corpus."""
    import pytest as _pytest

    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with _pytest.raises(ValueError, match="integral ids"):
        dedup.connected_components(pairs)


def test_repetition_features_keeps_two_word_docs(spark):
    """A maximally repetitive 2-word doc has no 3-grams but MUST appear (and
    flag) — the inner join used to drop it."""
    df = spark.createDataFrame(
        [(1, "buy buy"), (2, "a perfectly normal longer sentence here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text.repetition_features(df).collect()}
    assert 1 in got
    assert got[1].top_2gram_frac == 1.0 and got[1].dup_3gram_frac is None
    assert got[1].flag_repetitive


def test_lsh_bucket_uses_long_shifts(spark):
    """Plane 32 must occupy bit 32, not collide with plane 0 (int shiftleft
    masks the amount mod 32)."""
    planes = np.zeros((33, 33))
    np.fill_diagonal(planes, 1.0)
    df = spark.createDataFrame([(1, [1.0] * 33)], "vec_id long, embedding array<double>")
    b = similarity.assign_lsh_buckets(df, planes).collect()[0]["bucket"]
    assert b == 2**33 - 1


def test_simhash_neardup_excludes_contentless_docs(spark):
    """NULL/empty docs all hash to 0 — they must not pair quadratically."""
    rows = [(i, None if i % 2 else "   ") for i in range(40)]
    rows += [(100, "a real document with words"), (101, "a real document with words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in dedup.simhash_near_duplicates(df).collect()}
    assert got == {(100, 101)}


def test_split_leakage_safe_cluster_col_null_fallback(spark):
    """Docs absent from the cluster frame (singletons — most of a corpus)
    key by their own id, not all by NULL."""
    from pyspark.sql import functions as F

    from lyra_spark.pipeline.sample import split_leakage_safe

    df = spark.range(0, 400).selectExpr(
        "id AS doc_id", "CASE WHEN id < 20 THEN CAST(id % 5 AS LONG) END AS comp"
    )
    out = split_leakage_safe(df, {"a": 0.5, "b": 0.5}, cluster_col="comp")
    assert out.filter("split IS NULL").count() == 0
    assert out.select("split").distinct().count() == 2


def test_sample_frames_skips_zero_frame_videos(spark):
    """A zero-frame container row must be skipped, not crash sequence(0,-1)."""
    import pandas as pd_

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("meta", T.StructType([T.StructField("n_frames", T.IntegerType())])),
    ])
    df = spark.createDataFrame(
        pd_.DataFrame({"media_id": [1, 2], "kind": ["video", "video"],
                       "meta": [{"n_frames": 0}, {"n_frames": 6}]}), schema)
    got = multimodal.sample_frames(df, every_n=2).collect()
    assert {r.media_id for r in got} == {2}


def test_strip_markup_preserves_line_structure(spark):
    """Newlines survive markup stripping (horizontal whitespace collapses,
    blank-line runs collapse to one newline) — collapsing '\\n' to ' ' would
    silently turn the line-level boilerplate scrub into a no-op when
    clean_corpus strips markup first."""
    from lyra_spark.pipeline.text import strip_markup

    rows = [
        (1, "line one\nline two\n\n\nline three"),
        (2, "<ul><li>nav home</li><li>nav about</li></ul><p>body text</p>"),
        (3, "a    b\t\tc\n  d  "),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.text_plain for r in strip_markup(df).collect()}
    assert got[1] == "line one\nline two\nline three"
    assert got[2] == "nav home\nnav about\nbody text"
    assert got[3] == "a b c\nd"


def test_clean_corpus_scrubs_lines_after_markup_strip(spark):
    """With strip_markup_first=True the C4 line scrub must still fire: a
    boilerplate line shared by many HTML pages is removed even though the
    pages arrived as single-line markup."""
    from lyra_spark.pipeline.clean import clean_corpus

    footer = "all rights reserved example corp legal notice"
    bodies = [
        f"document {i} discusses an entirely distinct ordinary topic with "
        "plenty of everyday words that the quality filter is happy about "
        "and some more filler to keep the score up for this document"
        for i in range(6)
    ]
    rows = [
        (i, f"<html><p>{bodies[i]}</p><p>{footer}</p></html>") for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df, min_quality=0.0, strip_markup_first=True,
                       near_dup_threshold=0.99)
    texts = {r.text for r in out.collect()}
    assert texts, "every doc vanished"
    assert all(footer not in t for t in texts), texts
    assert all(f"document {i}" in " ".join(texts) for i in range(6))


def test_clean_corpus_replaces_input_n_lines_removed(spark):
    """Re-cleaning a previously cleaned corpus (schema already carries
    n_lines_removed) must REPLACE the provenance column, not emit a
    duplicate name."""
    from lyra_spark.pipeline.clean import clean_corpus

    rows = [
        (1, "a perfectly ordinary document with plenty of common words here", 7),
        (2, "another entirely different ordinary document with many words too", 9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_lines_removed int")
    out = clean_corpus(df, min_quality=0.0)
    assert out.columns.count("n_lines_removed") == 1
    got = {r.doc_id: r.n_lines_removed for r in out.collect()}
    assert got == {1: 0, 2: 0}  # recomputed by THIS pass, not the stale input


def test_top_ngrams_counts_and_ties(spark):
    """Occurrence counting (not per-doc distinct), deterministic count-then-
    lexical tie-break, normalization, short/NULL docs contribute nothing."""
    import pytest as _pytest

    from lyra_spark.pipeline.text import top_ngrams

    rows = [
        (1, "the cat sat the cat sat"),   # "the cat"x2, "cat sat"x2, "sat the"x1
        (2, "THE   cat"),                  # normalization: +1 "the cat"
        (3, "word"),                       # too short for a bigram
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = [(r["ngram"], r["count"], r["rank"]) for r in top_ngrams(df, n=2, k=3).collect()]
    assert out == [("the cat", 3, 1), ("cat sat", 2, 2), ("sat the", 1, 3)]
    with _pytest.raises(ValueError, match="positive"):
        top_ngrams(df, n=0)


def test_unigram_logprob_exact_and_reference_lm(spark):
    """Hand-computed MLE scores, OOV flooring against a reference LM, and
    NULL/zero-token documents excluded (no defined score)."""
    import math

    from lyra_spark.pipeline.text import unigram_lm, unigram_logprob

    rows = [(1, "a a b"), (2, "b"), (3, "c"), (4, None), (5, "??!")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # corpus counts a:2 b:2 c:1, total 5
    got = {r.doc_id: (r.n_tokens, r.logprob_per_token)
           for r in unigram_logprob(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 3 and abs(got[1][1] - math.log(2 / 5)) < 1e-12
    assert abs(got[2][1] - math.log(2 / 5)) < 1e-12
    assert abs(got[3][1] - math.log(1 / 5)) < 1e-12

    # reference LM from docs 1-2 only (a:2 b:2, total 4); c is OOV -> 0.5/4
    ref = unigram_lm(df.filter("doc_id <= 2"))
    got = {r.doc_id: r.logprob_per_token
           for r in unigram_logprob(df, lm=ref).collect()}
    assert abs(got[1] - math.log(2 / 4)) < 1e-12
    assert abs(got[3] - math.log(0.5 / 4)) < 1e-12


def test_unigram_logprob_ranks_symbol_soup_below_prose(spark):
    """The quality-signal property: on a corpus of ordinary prose plus one
    rare-token document, the rare-token document scores lowest."""
    from lyra_spark.pipeline.text import unigram_logprob

    prose = "the quick brown fox jumps over the lazy dog and the cat"
    rows = [(i, prose) for i in range(10)] + [(99, "zxqv jkwp qqzz vvxx")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    scores = {r.doc_id: r.logprob_per_token for r in unigram_logprob(df).collect()}
    assert min(scores, key=scores.get) == 99
    assert scores[99] < scores[0] - 1.0


def test_clean_cli_unigram_lm_filter(tmp_path, spark):
    """--min-unigram-logprob drops statistically improbable docs before the
    funnel and reports the stage; --unigram adds the LM distribution to the
    profile report."""
    import json

    from jobs.clean import main as clean_main
    from jobs.profile_corpus import main as profile_main

    prose = ("a perfectly ordinary english document with plenty of common "
             "words about query planners and shuffle exchange strategies")
    rows = [(i, prose + f" variant {i % 2}") for i in range(10)] + [
        (99, "zxqv jkwp qqzz vvxx glorb")  # rare tokens: lowest logprob
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    rpt = str(tmp_path / "profile.json")
    assert profile_main(["--corpus", src, "--report", rpt, "--unigram"]) == 0
    rep = json.loads(open(rpt).read())
    u = rep["unigram_quality"]
    assert u["mean_logprob_per_token"] < 0
    p1, p10, p50, p90 = u["logprob_p1_p10_p50_p90"]
    assert p1 <= p10 <= p50 <= p90 < 0

    out, crpt = str(tmp_path / "cleaned"), str(tmp_path / "creport.json")
    rc = clean_main(["--corpus", src, "--out", out, "--report", crpt,
                     "--min-unigram-logprob", "-4.0", "--min-quality", "0.0",
                     "--near-dup-threshold", "0.99"])
    assert rc == 0
    crep = json.loads(open(crpt).read())
    assert crep["docs_in"] == 11 and crep["after_unigram_lm"] == 10
    assert 99 not in {r.doc_id for r in spark.read.parquet(out).collect()}


def test_containment_pairs_asymmetric_and_exact(spark):
    """containment_pairs finds the quoted-inside relation (high containment,
    low Jaccard) in the right DIRECTION only, equals brute force on a random
    corpus, and survives the exact-rational threshold boundary (t=0.8 with
    |A|=5 and exactly one missing shingle — the float ⌊(1−t)·n⌋ edge)."""
    import itertools
    import random

    from lyra_spark.pipeline.dedup import containment_pairs

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta many more words"),
        (3, "completely different content here nothing shared"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.id_a, r.id_b): r.containment
           for r in containment_pairs(df, threshold=0.8, shingle_k=1).collect()}
    assert got == {(1, 2): 1.0}  # 1 ⊂ 2; 2 ⊄ 1 (4/10 < 0.8); 3 pairs with nothing

    # boundary: A has 5 distinct words, exactly 4 appear in B -> 0.8 >= 0.8
    rows = [(1, "a b c d e"), (2, "a b c d x y z w q r s t")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.id_a, r.id_b) for r in containment_pairs(df, threshold=0.8, shingle_k=1).collect()}
    assert (1, 2) in got

    # random-corpus brute force (k=1 word sets)
    random.seed(5)
    vocab = "red green blue cyan teal pink gray onyx jade ruby".split()
    strs = [" ".join(random.choice(vocab) for _ in range(random.randint(1, 12))) for _ in range(40)]
    df = spark.createDataFrame(list(enumerate(strs)), "doc_id bigint, text string")
    for t in (0.6, 0.8, 1.0):
        got = {(r.id_a, r.id_b) for r in containment_pairs(df, threshold=t, shingle_k=1).collect()}
        sets = {i: set(s.split()) for i, s in enumerate(strs)}
        want = {(i, j) for i, j in itertools.permutations(range(len(strs)), 2)
                if len(sets[i] & sets[j]) / len(sets[i]) >= t}
        assert got == want, f"t={t}"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="threshold"):
        containment_pairs(df, threshold=0.0)


def test_duplicate_span_stats(spark):
    """Window inventory, cross-doc (not within-doc) duplication, distinct
    spans per doc, short/NULL docs excluded, validation."""
    import pytest as _pytest

    from lyra_spark.pipeline.text import duplicate_span_stats

    rows = [
        (1, "one two three four five six seven eight"),
        (2, "zz yy one two three four five qq ww ee rr tt"),
        (3, "totally unrelated words that appear nowhere else at all"),
        (4, "rep rep rep rep rep rep rep rep rep rep"),  # within-doc only
        (5, "tiny doc"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_fraction)
           for r in duplicate_span_stats(df, window=5).collect()}
    assert got[1] == (4, 1, 0.25)       # shares "one two three four five"
    assert got[2] == (8, 1, 0.125)
    assert got[3] == (5, 0, 0.0)
    # doc 4's repeated span is DISTINCT per doc and appears in no other doc
    assert got[4] == (1, 0, 0.0)
    assert 5 not in got and 6 not in got
    with _pytest.raises(ValueError, match="window"):
        duplicate_span_stats(df, window=0)


def test_clean_cli_dup_span_filter(tmp_path, spark):
    """--max-dup-span-fraction drops the boilerplate-dominated doc before the
    funnel; short docs (no defined fraction) survive."""
    import json

    from jobs.clean import main

    boiler = "this exact boilerplate paragraph appears in every single page here"
    rows = [
        (0, boiler + " plus unique tail zero ending with several distinct words"),
        (1, boiler + " plus another unique tail one with different trailing words"),
        (2, boiler),                      # 100% duplicated spans
        (3, "a short doc"),               # too short for a span: kept
        (4, "a clean unrelated document with enough words to have spans too"),
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out, rpt = str(tmp_path / "cleaned"), str(tmp_path / "rep.json")
    rc = main(["--corpus", src, "--out", out, "--report", rpt,
               "--max-dup-span-fraction", "0.9", "--dup-span-window", "5",
               "--min-quality", "0.0", "--near-dup-threshold", "0.99"])
    assert rc == 0
    rep = json.loads(open(rpt).read())
    assert rep["docs_in"] == 5 and rep["after_dup_span"] == 4
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 2 not in kept and 3 in kept and 4 in kept


def test_unigram_cli_token_free_corpus(tmp_path, spark):
    """A corpus with no [a-z0-9] tokens: profile --unigram reports the fact
    instead of crashing; clean --min-unigram-logprob fails loudly instead of
    silently dropping every document."""
    import json

    import pytest as _pytest

    from jobs.clean import main as clean_main
    from jobs.profile_corpus import main as profile_main

    rows = [(1, "???!!!"), (2, None), (3, "¡¡¡…")]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    rpt = str(tmp_path / "p.json")
    assert profile_main(["--corpus", src, "--report", rpt, "--unigram"]) == 0
    rep = json.loads(open(rpt).read())
    assert "error" in rep["unigram_quality"]

    with _pytest.raises(SystemExit, match="min-unigram-logprob"):
        clean_main(["--corpus", src, "--out", str(tmp_path / "o"),
                    "--min-unigram-logprob", "-5", "--min-quality", "0.0"])


def test_scrub_card_numbers_luhn_gate(spark):
    """Only Luhn-valid 13-19-digit sequences are detected/redacted; a
    one-digit-off twin, a 20-digit run, and NULL text pass through."""
    from lyra_spark.pipeline.text import scrub_card_numbers

    rows = [
        (1, "pay with 4111 1111 1111 1111 thanks"),         # valid (test number)
        (2, "pay with 4111 1111 1111 1112 thanks"),         # checksum fails
        (3, "order 1234567890123 and 5500-0000-0000-0004"), # invalid + valid
        (4, "id 20240801123456789012 is 20 digits"),        # no 13-19 boundary
        (5, None),
        # a valid card as a SUBSTRING of a longer digit run must not mangle
        # that run (boundary-anchored redaction)
        (6, "card 4111111111111111 and id 94111111111111111x"),
        # a 20-digit SPACED serial whose 16-digit prefix is Luhn-valid:
        # the maximal-run candidate is 20 digits -> rejected whole
        (7, "acct 4111 1111 1111 1111 1111 is a 20-digit id"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.n_card_numbers, r.text_redacted)
           for r in scrub_card_numbers(df).collect()}
    assert got[1] == (1, "pay with [CARD] thanks")
    assert got[2] == (0, "pay with 4111 1111 1111 1112 thanks")
    assert got[3] == (1, "order 1234567890123 and [CARD]")
    assert got[4][0] == 0
    assert got[5] == (0, None)
    assert got[6] == (1, "card [CARD] and id 94111111111111111x")
    assert got[7] == (0, "acct 4111 1111 1111 1111 1111 is a 20-digit id")


def test_scrub_card_numbers_separated_run_over_redacts_by_design(spark):
    """SEMANTICS 88 scope pin: the no-mangle guarantee covers CONTIGUOUS
    digit runs only. When a validated card also appears embedded in a longer
    space/dash-SEPARATED run, the separators are word boundaries and the
    embedded occurrence IS redacted — deliberate over-redaction, the safe
    failure direction for a PII scrub (round-4 ADVICE)."""
    from lyra_spark.pipeline.text import scrub_card_numbers

    rows = [
        # standalone valid card + the same card inside a 22-digit spaced
        # serial: the serial's maximal run is rejected by the length gate,
        # but the fold's \b anchors match at its internal separators
        (1, "card 4111 1111 1111 1111 and serial 99 4111 1111 1111 1111 77"),
        # contiguous-run twin of the same shape: embedded occurrence has no
        # word boundary -> untouched (the guarantee that DOES hold)
        (2, "card 4111111111111111 and serial 994111111111111177"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.text_redacted for r in scrub_card_numbers(df).collect()}
    assert got[1] == "card [CARD] and serial 99 [CARD] 77"
    assert got[2] == "card [CARD] and serial 994111111111111177"


def test_pii_scrub_phone_pattern_opt_in(spark):
    """PHONE_E164_PATTERN composes into pii_scrub as an extra pattern; '+'
    requirement keeps bare digit runs unredacted."""
    from lyra_spark.pipeline.text import PHONE_E164_PATTERN, PII_PATTERNS, pii_scrub

    rows = [(1, "call +14155550137 or mail a@b.co"), (2, "order 14155550137 shipped")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: (r.n_phone, r.text_redacted) for r in pii_scrub(
        df, patterns={**PII_PATTERNS, "phone": PHONE_E164_PATTERN}).collect()}
    assert out[1] == (1, "call [REDACTED] or mail [REDACTED]")
    assert out[2] == (0, "order 14155550137 shipped")


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        docs=st.lists(
            st.lists(st.sampled_from("red green blue cyan teal pink".split()),
                     min_size=0, max_size=8).map(" ".join),
            min_size=1, max_size=20,
        ),
        t=st.sampled_from([0.5, 0.75, 1.0]),
    )
    def test_containment_equals_brute_force_hypothesis(spark, docs, t):
        """Prefix-filter blocking is lossless on arbitrary tiny-vocab corpora
        (maximum shingle collision pressure) at rational thresholds."""
        import itertools
        import re

        from lyra_spark.pipeline.dedup import containment_pairs

        df = spark.createDataFrame(list(enumerate(docs)), "doc_id bigint, text string")
        got = {(r.id_a, r.id_b) for r in
               containment_pairs(df, threshold=t, shingle_k=1).collect()}
        # reference shingle model = word_shingles semantics: normalized
        # whitespace-collapsed split; an EMPTY doc gets the whole-text
        # fallback shingle '' (consistent with ngram_jaccard / MinHash)
        sets = {i: set(re.sub(r"\s+", " ", s.strip().lower()).split(" "))
                for i, s in enumerate(docs)}
        want = {(i, j) for i, j in itertools.permutations(sets, 2)
                if len(sets[i] & sets[j]) / len(sets[i]) >= t}
        assert got == want


def test_unigram_logprob_corpus_identity(spark):
    """Self-scored LM identity: Σ_docs n_tokens·logprob = Σ_vocab cnt·ln(cnt/total)
    — the per-doc roll-up must conserve the corpus log-likelihood exactly."""
    import math

    from lyra_spark.pipeline.text import unigram_logprob

    rows = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(1 + i % 9))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = unigram_logprob(df).collect()
    lhs = sum(r.n_tokens * r.logprob_per_token for r in got)
    from collections import Counter
    toks = Counter(w for _, s in rows for w in s.split())
    total = sum(toks.values())
    rhs = sum(c * math.log(c / total) for c in toks.values())
    assert abs(lhs - rhs) < 1e-6 * abs(rhs)


if _HAVE_HYP:

    @settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        runs=st.lists(
            st.lists(st.integers(min_value=0, max_value=9), min_size=10, max_size=22),
            min_size=1, max_size=5,
        )
    )
    def test_luhn_gate_matches_reference_hypothesis(spark, runs):
        """The Catalyst Luhn fold agrees with a plain-Python reference on
        arbitrary digit runs embedded in text (13-19-digit runs gated by
        checksum, others never matched)."""
        from lyra_spark.pipeline.text import scrub_card_numbers

        def luhn_ref(ds):
            s = 0
            for i, d in enumerate(reversed(ds)):
                s += (d * 2 - 9 if d * 2 > 9 else d * 2) if i % 2 == 1 else d
            return s % 10 == 0

        text = " and ".join("".join(map(str, ds)) for ds in runs)
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        got = scrub_card_numbers(df).collect()[0]
        want = sum(1 for ds in runs if 13 <= len(ds) <= 19 and luhn_ref(ds))
        assert got.n_card_numbers == want
        assert got.text_redacted.count("[CARD]") == want
