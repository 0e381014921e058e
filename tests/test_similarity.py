"""ANN quality: the SRP-LSH approximate top-k must (a) only return
true-similarity values (it computes exact cosine on candidates) and
(b) achieve reasonable recall vs the brute-force baseline."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from database_migrator_spark.functions.vector import cosine_similarity
from database_migrator_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_duplicates,
)
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def embeddings(spark):
    return table(spark, SF_SMOKE, "embeddings").cache()


def test_brute_force_topk_is_sorted_and_exact(spark, embeddings):
    rows = cosine_topk(embeddings, query_vec_id=1, k=10).collect()
    assert len(rows) == 10
    sims = [r.sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_ann_lsh_recall(spark, embeddings):
    exact = [r.vec_id for r in cosine_topk(embeddings, query_vec_id=1, k=10).collect()]
    approx_rows = ann_lsh_topk(embeddings, query_vec_id=1, k=10).collect()
    approx = [r.vec_id for r in approx_rows]
    # sims on returned candidates are exact → any returned id must rank
    # consistently; recall@10 against brute force should be non-trivial
    recall = len(set(exact) & set(approx)) / 10
    # deterministic under the fixed seed/data; modest by nature on
    # unclustered random vectors (see similarity.py note)
    assert recall >= 0.3, f"recall@10 = {recall}"
    sims = [r.sim for r in approx_rows]
    assert sims == sorted(sims, reverse=True)


def test_ivf_topk_recall(spark, embeddings):
    from database_migrator_spark.operators.similarity import ivf_topk

    exact = [r.vec_id for r in cosine_topk(embeddings, query_vec_id=1, k=10).collect()]
    approx_rows = ivf_topk(embeddings, query_vec_id=1, k=10, n_clusters=16, n_probe=4).collect()
    approx = [r.vec_id for r in approx_rows]
    recall = len(set(exact) & set(approx)) / 10
    # probing 4/16 clusters scans ~25% of vectors; deterministic seed
    assert recall >= 0.3, f"IVF recall@10 = {recall}"
    sims = [r.sim for r in approx_rows]
    assert sims == sorted(sims, reverse=True)


def test_embedding_near_duplicates_subset_of_truth(spark, embeddings):
    threshold = 0.4
    a = embeddings.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    b = embeddings.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    # epsilon guard: the verify stage uses numpy (pairwise summation),
    # truth uses the sequential fold — last-bit differences at the exact
    # threshold boundary are not false positives
    truth = {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("c", cosine_similarity(F.col("a_vec"), F.col("b_vec")))
        .where(F.col("c") >= threshold - 1e-9)
        .collect()
    }
    found = {
        (r.a_id, r.b_id)
        for r in embedding_near_duplicates(embeddings, threshold=threshold).collect()
    }
    # exact-cosine verify ⇒ no false positives; multi-probe SRP must catch
    # a solid majority of the true high-cosine pairs
    assert found <= truth
    assert truth, "corpus has no pairs at this threshold — test is vacuous"
    recall = len(found) / len(truth)
    assert recall >= 0.5, f"recall {recall:.2f} over {len(truth)} true pairs"


def test_multiprobe_pairs_unique(spark, embeddings):
    """The multi-probe bucket join generates every (a, b) candidate at
    most once — the probe masks {0, 1<<i} are distinct, so at most one
    satisfies bucket(b)^mask == bucket(a). This uniqueness is what lets
    embedding_near_duplicates skip a pair-level dropDuplicates (which
    shuffled the full candidate stream with both vectors, r14 wave 4);
    a probe-scheme change that breaks it must fail here, not silently
    duplicate output rows."""
    out = embedding_near_duplicates(embeddings, threshold=-1.0)  # keep ALL candidates
    dup = out.groupBy("a_id", "b_id").count().where(F.col("count") > 1)
    assert dup.isEmpty(), dup.limit(5).collect()


def test_l2_normalize_makes_cosine_a_dot_product(spark):
    """Normalized vectors: dot == cosine of the originals (the ingest-time
    trick that removes per-pair norms), and zero vectors normalize NULL."""
    from database_migrator_spark.functions.vector import (
        cosine_similarity,
        dot,
        l2_normalize,
    )

    e = table(spark, SF_SMOKE, "embeddings").limit(50)
    a = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("a_id") < F.col("b_id")).select(
        cosine_similarity("va", "vb").alias("cos_raw"),
        dot(l2_normalize("va"), l2_normalize("vb")).alias("dot_norm"),
    )
    bad = pairs.where(F.abs(F.col("cos_raw") - F.col("dot_norm")) > 1e-12)
    assert bad.isEmpty()
    zero = spark.createDataFrame([([0.0] * 4,)], "v array<float>")
    assert zero.select(l2_normalize("v").alias("n")).first()["n"] is None


def test_int8_quantization_roundtrip_error_bounded(spark):
    """Quantize→dequantize error is bounded by scale/2 per component, the
    dtype is tinyint (4x smaller than float32), and saturation clamps."""
    from database_migrator_spark.functions.vector import dequantize_int8, quantize_int8

    scale = 1.0 / 127  # embeddings are ~unit-range components
    e = table(spark, SF_SMOKE, "embeddings")
    q = e.select("embedding", quantize_int8("embedding", scale).alias("q"))
    assert dict(q.schema["q"].dataType.jsonValue().items())["elementType"] == "byte"
    err = q.select(
        F.aggregate(
            F.zip_with(
                dequantize_int8("q", scale),
                "embedding",
                lambda x, y: F.abs(x - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err")
    ).agg(F.max("max_err").alias("m")).first()["m"]
    assert err <= scale / 2 + 1e-12 or err <= scale  # clamp may saturate extremes
    big = spark.createDataFrame([([9.9, -9.9],)], "v array<float>")
    r = big.select(quantize_int8("v", scale).alias("q")).first()["q"]
    assert r == [127, -127]


def test_semantic_dedup_drops_true_duplicates_keeps_lowest_id(spark):
    """Synthetic clusters with REAL near-duplicates (the test corpus is
    random, so the declared query only exercises the tail): identical
    and epsilon-perturbed vectors must drop in favor of the lowest id;
    cross-cluster duplicates must NOT pair; dissimilar vectors survive."""
    from database_migrator_spark.operators.similarity import semantic_dedup_kept

    base = [1.0] + [0.0] * 7
    near = [0.999] + [0.001] * 7
    orth = [0.0] * 7 + [1.0]
    rows = [
        (0, 10, base),   # cluster 0: kept (lowest id of the dup group)
        (0, 11, base),   # identical -> dropped
        (0, 12, near),   # near-identical -> dropped
        (0, 13, orth),   # orthogonal -> kept
        (1, 20, base),   # same vector, DIFFERENT cluster -> kept
    ]
    e = spark.createDataFrame(rows, "label long, vec_id long, embedding array<double>")
    kept = {
        r["vec_id"]
        for r in semantic_dedup_kept(e, threshold=0.95).collect()
    }
    assert kept == {10, 13, 20}


def test_pq_codes_valid_and_deterministic(spark):
    """PQ encoding: every code indexes a real centroid, and two encodes
    from the cached codebooks are byte-identical (ties break to the
    first index, never nondeterministically)."""
    from database_migrator_spark.operators.similarity import pq_encode, pq_fit_cached
    from database_migrator_spark.sources import table

    sf = "/root/testdata/sf0.001"
    books = pq_fit_cached(spark, sf)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    e = table(spark, sf, "embeddings")
    c1 = {r["vec_id"]: r["codes"] for r in pq_encode(e, books).collect()}
    c2 = {r["vec_id"]: r["codes"] for r in pq_encode(e, books).collect()}
    assert c1 == c2
    assert all(len(v) == 8 and all(0 <= c < 16 for c in v) for v in c1.values())


def test_pq_report_quality_bounds(spark):
    """q117: the 4-bit codebooks must explain a nontrivial share of each
    subspace's variance (quantizing to the mean alone explains 0), and
    the compression ratio is the exact float32-bits / code-bits figure."""
    from database_migrator_spark.plans.registry import all_queries

    rows = all_queries()["q117_pq_compression"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r["subspace"] for r in rows] == list(range(8))
    for r in rows:
        assert 0.2 < r["variance_explained"] < 1.0
        assert r["mse"] > 0
        assert r["compression_ratio"] == 64.0


def test_pq_adc_ranking_tracks_true_distance(spark):
    """Asymmetric-distance search must rank by a usable proxy of true
    L2: ADC and exact distances correlate strongly even on this fully
    random corpus (real embedding corpora cluster, where PQ fares far
    better), and the exact nearest neighbor lands well inside the ADC
    candidate front (the re-rank window a production pipeline scans)."""
    import numpy as np

    from database_migrator_spark.operators.similarity import pq_adc_topk, pq_fit_cached
    from database_migrator_spark.sources import table

    sf = "/root/testdata/sf0.001"
    books = pq_fit_cached(spark, sf)
    e = table(spark, sf, "embeddings")
    adc = {r["vec_id"]: r["adc_d2"] for r in pq_adc_topk(e, books, 1, topk=500).collect()}
    rows = e.collect()
    q = np.asarray(
        list(next(r["embedding"] for r in rows if r["vec_id"] == 1)), dtype=np.float64
    )
    true = {
        r["vec_id"]: float(
            ((np.asarray(list(r["embedding"]), dtype=np.float64) - q) ** 2).sum()
        )
        for r in rows
        if r["vec_id"] != 1
    }
    ids = sorted(set(adc) & set(true))
    a = np.array([adc[i] for i in ids])
    t = np.array([true[i] for i in ids])
    assert np.corrcoef(a, t)[0, 1] > 0.4
    top1 = min(true, key=true.get)
    rank = sorted(adc, key=adc.get).index(top1)
    assert rank < len(ids) // 4  # inside the 25% re-rank window


def test_ivf_assign_fixed_matches_numpy_argmin(spark):
    """The fixed-centroid assign path must agree with an independent
    numpy argmin over the same literals (ties to the lowest cluster id)
    — the index-consistency contract behind q219's append step."""
    import numpy as np
    from pyspark.sql import functions as F

    from database_migrator_spark.operators.similarity import (
        FIXED_IVF_CENTROIDS,
        ivf_assign_fixed,
    )
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    e = (
        table(spark, SF_SMOKE, "embeddings")
        .where(F.col("vec_id") < 100)
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    )
    got = {r.vec_id: r.cluster for r in ivf_assign_fixed(e).collect()}
    C = np.asarray(FIXED_IVF_CENTROIDS, dtype=np.float64)
    for r in e.collect():
        d2 = ((np.asarray(r.v, dtype=np.float64)[None, :] - C) ** 2).sum(axis=1)
        assert got[r.vec_id] == int(np.argmin(d2))  # argmin ties -> lowest id


def test_q219_append_set_is_exact_complement(spark):
    """q219's anti-join must append EXACTLY the batch-minus-indexed ids
    (vec_id % 4 == 0 among vec_id % 2 == 0), every cluster row must
    balance (n_total = n_indexed + n_appended), and totals must tile the
    corpus partition."""
    from pyspark.sql import functions as F

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    rows = all_queries()["q219_ivf_index_append"].build(spark, SF_SMOKE).collect()
    e = table(spark, SF_SMOKE, "embeddings")
    n_indexed = e.where(F.col("vec_id") % 4 != 0).count()
    n_new = e.where((F.col("vec_id") % 2 == 0) & (F.col("vec_id") % 4 == 0)).count()
    assert len(rows) == 16  # full cluster spine, empty clusters included
    assert sum(r.n_indexed for r in rows) == n_indexed
    assert sum(r.n_appended for r in rows) == n_new
    for r in rows:
        assert r.n_total == r.n_indexed + r.n_appended
        assert (r.mean_append_d2 > 0) == (r.n_appended > 0)


def test_embedding_drift_matches_numpy(spark):
    """q230's fixed-point drift must equal a numpy recomputation that
    applies the same 1e-6 quantization contract (values quantized
    before averaging, per-dim deltas re-quantized, sqrt last)."""
    import numpy as np

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    rows = {
        r.label: r
        for r in all_queries()["q230_embedding_centroid_drift"].build(spark, SF_SMOKE).collect()
    }
    pdf = table(spark, SF_SMOKE, "embeddings").toPandas()
    labels = sorted(pdf.label.unique())
    assert set(rows) == {int(l) for l in labels}
    for lab in labels:
        g = pdf[pdf.label == lab]
        new = g[g.vec_id % 2 == 0]
        old = g[g.vec_id % 2 == 1]
        vn = np.round(np.stack(new.embedding.to_numpy()).astype(np.float64) * 1e6)
        vo = np.round(np.stack(old.embedding.to_numpy()).astype(np.float64) * 1e6)
        d6 = np.round((vn.sum(0) / len(vn) - vo.sum(0) / len(vo)))
        want = round(float(np.sqrt((d6 * d6).sum())) / 1e6 * 1e9) / 1e9
        r = rows[int(lab)]
        assert (r.n_old, r.n_new) == (len(old), len(new))
        assert r.centroid_shift_l2 == want


def test_srp_portable_recall_and_exact_sims(spark, embeddings):
    """q235 (fixed-plane SRP twin): returned sims are exact cosines (spot
    check vs the brute-force list) and recall@10 vs brute force is
    non-trivial — the fixed closed-form planes must not degrade below
    the seeded-random tier's floor."""
    from database_migrator_spark.plans.registry import all_queries

    exact_rows = cosine_topk(embeddings, query_vec_id=1, k=10).collect()
    exact = {r.vec_id: r.sim for r in exact_rows}
    approx_rows = (
        all_queries()["q235_srp_lsh_topk_portable"].build(spark, SF_SMOKE).collect()
    )
    recall = len(set(exact) & {r.vec_id for r in approx_rows}) / 10
    assert recall >= 0.3, f"fixed-plane recall@10 = {recall}"
    sims = [r.sim for r in approx_rows]
    assert sims == sorted(sims, reverse=True)
    for r in approx_rows:  # any overlap with brute force must agree exactly
        if r.vec_id in exact:
            assert r.sim == exact[r.vec_id]


def test_ivf_portable_topk_exact_within_probed_cells(spark, embeddings):
    """q236 (fixed-quantizer IVF twin): the returned top-10 must equal a
    brute-force L2 top-10 RESTRICTED to the probed cells (the
    approximation is the probe set, never the ranking), and ranking the
    whole corpus by L2 must contain every returned id at equal-or-better
    distance."""
    from database_migrator_spark.functions.vector import l2_dist_sq
    from database_migrator_spark.operators.similarity import ivf_assign_fixed
    from database_migrator_spark.plans.registry import all_queries

    got = all_queries()["q236_ivf_topk_portable"].build(spark, SF_SMOKE).collect()
    assert 0 < len(got) <= 10
    d2s = [r.d2 for r in got]
    assert d2s == sorted(d2s)

    e = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    asg = {r.vec_id: r.cluster for r in ivf_assign_fixed(e, vec_col="v").collect()}
    probed = {r.cluster for r in got}
    qv = e.where(F.col("vec_id") == 1).select(F.col("v").alias("qv"))
    brute = (
        e.where(F.col("vec_id") != 1)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", l2_dist_sq("v", "qv").alias("d2"))
        .collect()
    )
    in_cells = sorted(
        ((r.d2, r.vec_id) for r in brute if asg[r.vec_id] in probed)
    )[: len(got)]
    assert [(r.d2, r.vec_id) for r in got] == in_cells


def test_q246_margin_matches_python_replay_and_is_mutual(spark):
    """q246: a pure-Python replay of the whole mining recipe — sequential
    IEEE folds for norms/cosines (bit-identical to the engine's
    ``aggregate`` fold), fixed-IVF argmin assignment, in-cell cross-side
    pairs, 1e-12 fixed-point HALF_UP rounding, TRUNCATING top-4 mean
    denominators, ratio margin, mutual-best intersection — must
    reproduce the query's top-20 EXACTLY; mutual-best additionally
    implies each endpoint id appears at most once."""
    import math

    from database_migrator_spark.operators.similarity import FIXED_IVF_CENTROIDS
    from database_migrator_spark.plans.registry import all_queries

    from .conftest import SF_SMOKE

    rows = table(spark, SF_SMOKE, "embeddings").collect()

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    # normalize + assign (argmin ties -> lowest cluster id)
    sides, cells, normed = {}, {}, {}
    for r in rows:
        nn = math.sqrt(fold_dot(r.embedding, r.embedding))
        if nn <= 0:
            continue
        e = [float(x) / nn for x in r.embedding]
        best = min(
            (sum((ei - ci) ** 2 for ei, ci in zip(e, c)), j)
            for j, c in enumerate(FIXED_IVF_CENTROIDS)
        )[1]
        normed[r.vec_id], cells[r.vec_id], sides[r.vec_id] = e, best, r.label % 2

    def round_half_up(v):  # Spark ROUND(double) / DuckDB ROUND: half away from 0
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    pairs = {}
    for a in normed:
        if sides[a] != 0:
            continue
        for b in normed:
            if sides[b] == 1 and cells[a] == cells[b]:
                pairs[(a, b)] = round_half_up(fold_dot(normed[a], normed[b]) * 1e12)
    assert pairs, "planted corpus must produce in-cell cross-side pairs"

    def trunc_mean_top4(items):  # Spark `div` == DuckDB `//`: trunc toward 0
        top = sorted(items, key=lambda t: (-t[0], t[1]))[:4]
        s, c = sum(t[0] for t in top), len(top)
        q = abs(s) // c
        return q if s >= 0 else -q

    den_a = {
        a: trunc_mean_top4([(fp, b) for (x, b), fp in pairs.items() if x == a])
        for a in {x for x, _ in pairs}
    }
    den_b = {
        b: trunc_mean_top4([(fp, a) for (a, y), fp in pairs.items() if y == b])
        for b in {y for _, y in pairs}
    }
    scored = {
        (a, b): (2 * fp) / (den_a[a] + den_b[b])
        for (a, b), fp in pairs.items()
        if den_a[a] + den_b[b] > 0
    }
    best_a = {}
    best_b = {}
    for (a, b), m in scored.items():
        if a not in best_a or (-m, b) < (-scored[(a, best_a[a])], best_a[a]):
            best_a[a] = b
        if b not in best_b or (-m, a) < (-scored[(best_b[b], b)], best_b[b]):
            best_b[b] = a
    mutual = [
        (a, b, pairs[(a, b)] / 1e12, round_half_up(scored[(a, b)] * 1e9) / 1e9)
        for (a, b) in scored
        if best_a[a] == b and best_b[b] == a
    ]
    expect = sorted(mutual, key=lambda t: (-t[3], t[0]))[:20]

    got = [
        (r.a_id, r.b_id, r.cosine, r.margin)
        for r in all_queries()["q246_margin_bitext_mining"].build(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    assert len({a for a, *_ in got}) == len(got)  # each anchor at most once
    assert len({b for _, b, *_ in got}) == len(got)


def test_q248_triplets_match_numpy_brute_force(spark):
    """q248: positives, negative ranks and tier grades must agree with a
    numpy brute force restricted to the same fixed-IVF cells — the
    positive is the same-label in-cell argmax, negatives are the top-3
    different-label in-cell cosines, tiers partition by the exact
    fixed-point margin; every anchor with a same-label neighbor AND a
    different-label neighbor in its cell appears, each at most 3 times."""
    import math

    from database_migrator_spark.operators.similarity import FIXED_IVF_CENTROIDS
    from database_migrator_spark.plans.registry import all_queries

    from .conftest import SF_SMOKE

    rows = table(spark, SF_SMOKE, "embeddings").collect()

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    normed, cells, labels = {}, {}, {}
    for r in rows:
        nn = math.sqrt(fold_dot(r.embedding, r.embedding))
        if nn <= 0:
            continue
        e = [float(x) / nn for x in r.embedding]
        best = min(
            (sum((ei - ci) ** 2 for ei, ci in zip(e, c)), j)
            for j, c in enumerate(FIXED_IVF_CENTROIDS)
        )[1]
        normed[r.vec_id], cells[r.vec_id], labels[r.vec_id] = e, best, r.label

    def rhu(v):
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    expect = []
    for a in sorted(normed):
        same, diff = [], []
        for b in normed:
            if b == a or cells[b] != cells[a]:
                continue
            fp = rhu(fold_dot(normed[a], normed[b]) * 1e12)
            (same if labels[b] == labels[a] else diff).append((-fp, b))
        if not same or not diff:
            continue
        pos_negfp, pos_id = min(same)
        for rank, (nfp, nid) in enumerate(sorted(diff)[:3], start=1):
            pos_fp, neg_fp = -pos_negfp, -nfp
            tier = (
                "hard"
                if neg_fp >= pos_fp
                else "semi_hard"
                if neg_fp > pos_fp - 200_000_000_000
                else "easy"
            )
            expect.append(
                (a, pos_id, rank, nid, pos_fp / 1e12, neg_fp / 1e12, tier)
            )
    got = [
        (r.anchor_id, r.pos_id, r.neg_rank, r.neg_id, r.pos_cos, r.neg_cos, r.tier)
        for r in all_queries()["q248_hard_negative_mining"].build(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    from collections import Counter

    assert all(v <= 3 for v in Counter(a for a, *_ in got).values())
