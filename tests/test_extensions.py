"""Property tests for the LLM-pipeline extension operators — the checks
an oracle can't express: ANN recall, planted near-dup recovery, stub
decode determinism."""

from __future__ import annotations

from agri_market_data_pipeline_spark.operators.dedup import _minhash_bands
from agri_market_data_pipeline_spark.operators.similarity import (
    sim_search_ivf,
    sim_search_lsh_rp,
    sim_search_topk,
)
from agri_market_data_pipeline_spark.operators.multimodal import (
    multimodal_audio_energy,
    multimodal_decode_stub,
    multimodal_resize,
)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    exact = [r.vec_id for r in sim_search_topk(spark, sf_dir).collect()]
    approx = [r.vec_id for r in sim_search_ivf(spark, sf_dir).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    # 4/16 cells probed on random vectors: recall is data-dependent but
    # must be clearly better than the 25% a random cell subset would give.
    assert recall >= 0.3, f"recall@20 = {recall}"


def test_lsh_rp_recall_vs_brute_force(spark, sf_dir):
    exact = [r.vec_id for r in sim_search_topk(spark, sf_dir).collect()]
    approx = [r.vec_id for r in sim_search_lsh_rp(spark, sf_dir).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    # 2 bands × (6-bit bucket + hamming-1 multiprobe) scans ~20% of the
    # corpus; observed recall@20 is 0.6 on the driver testdata — assert
    # well above the ~0.2 a random same-size candidate set would give.
    assert recall >= 0.35, f"recall@20 = {recall}"
    # md5-lattice hyperplanes: the whole search is run-to-run deterministic
    again = [r.vec_id for r in sim_search_lsh_rp(spark, sf_dir).collect()]
    assert approx == again


def test_minhash_recovers_planted_near_dups(spark, tmp_path):
    """Plant near-duplicates (one token changed out of 40) and verify the
    LSH band join pairs them; unrelated docs don't collide."""
    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok17", "changed")
    other = " ".join(f"zzz{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    bands = _minhash_bands(spark, str(tmp_path))
    a, b = bands.alias("a"), bands.alias("b")
    from pyspark.sql import functions as F

    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    )
    got = {(r.x, r.y) for r in pairs}
    assert (1, 2) in got, f"planted near-dup not found: {got}"
    assert (1, 3) not in got and (2, 3) not in got, f"false collision: {got}"


def test_decode_stub_deterministic_and_complete(spark, sf_dir):
    out1 = {r.doc_id: (r.byte_len, r.first_byte, r.byte_sum_mod)
            for r in multimodal_decode_stub(spark, sf_dir).collect()}
    out2 = {r.doc_id: (r.byte_len, r.first_byte, r.byte_sum_mod)
            for r in multimodal_decode_stub(spark, sf_dir).collect()}
    assert out1 == out2
    assert len(out1) == 500  # one feature row per document, none dropped


def test_resize_matches_exact_recompute(spark, sf_dir):
    """multimodal_resize must equal the nearest-neighbor resample
    computed independently in plain Python, for every document."""
    from agri_market_data_pipeline_spark.operators.multimodal import (
        _RESIZE_TARGET,
        documents_as_media,
    )

    payloads = {
        r.doc_id: bytes(r.payload)
        for r in documents_as_media(spark, sf_dir).collect()
    }
    out = {r.doc_id: (r.orig_len, bytes(r.resized))
           for r in multimodal_resize(spark, sf_dir).collect()}
    assert len(out) == len(payloads) == 500
    for doc_id, payload in payloads.items():
        n = len(payload)
        want = bytes(
            payload[i * n // _RESIZE_TARGET] for i in range(_RESIZE_TARGET)
        ) if n else b""
        assert out[doc_id] == (n, want), doc_id


def test_audio_energy_matches_exact_recompute(spark, sf_dir):
    """Per-window energy/peak must equal an independent recompute from
    the SOURCE bytes (the decode inverts the encode exactly); the
    window count per document is floor(samples/W). Also proves the wav
    column is a genuine RIFF container: stdlib wave parses it and
    reports the declared format."""
    import io
    import wave as wavemod

    from agri_market_data_pipeline_spark.operators.multimodal import (
        _ENERGY_WINDOW,
        _WAV_RATE,
        documents_as_media,
        documents_as_wav,
    )

    payloads = {
        r.doc_id: bytes(r.payload)
        for r in documents_as_media(spark, sf_dir).collect()
    }
    one = documents_as_wav(spark, sf_dir).limit(1).collect()[0]
    with wavemod.open(io.BytesIO(bytes(one.wav)), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
            1, 2, _WAV_RATE,
        )
        assert w.getnframes() == len(payloads[one.doc_id])

    rows = multimodal_audio_energy(spark, sf_dir).collect()
    got = {(r.doc_id, r.window_no): (r.energy, r.peak) for r in rows}
    n_expected = sum(len(p) // _ENERGY_WINDOW for p in payloads.values())
    assert len(rows) == len(got) == n_expected  # no dups, none dropped
    for doc_id, payload in payloads.items():
        samples = [(b - 128) * 256 for b in payload]
        for w in range(len(samples) // _ENERGY_WINDOW):
            chunk = samples[w * _ENERGY_WINDOW : (w + 1) * _ENERGY_WINDOW]
            assert got[(doc_id, w)] == (
                sum(s * s for s in chunk),
                max(chunk),
            ), (doc_id, w)


def test_asof_strategies_agree(spark, sf_dir):
    """The broadcast densify strategy and the general union-carry-forward
    strategy must produce identical as-of results."""
    from agri_market_data_pipeline_spark.operators.asof import (
        asof_union_carry,
        join_asof_prices,
    )

    a = {tuple(r) for r in join_asof_prices(spark, sf_dir).collect()}
    b = {tuple(r) for r in asof_union_carry(spark, sf_dir).collect()}
    assert a == b


def test_dedup_cluster_recovers_planted_components(spark, tmp_path):
    """A~B and B~C (but A≁C directly) must land in ONE cluster; an
    unrelated near-dup pair forms its own; singletons don't appear."""
    base = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("tok7", "x")),       # ~1
            (3, base.replace("tok35", "y")),      # ~1 (and ~2 via 1)
            # aaa17->z verified to band-collide under the fixed hash
            # family (LSH recall is probabilistic per pair; the family is
            # deterministic, so a checked perturbation stays checked)
            (10, " ".join(f"aaa{i}" for i in range(40))),
            (11, " ".join(f"aaa{i}" for i in range(40)).replace("aaa17", "z")),
            (99, " ".join(f"zzz{i}" for i in range(40))),  # singleton
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from agri_market_data_pipeline_spark.operators.dedup import dedup_cluster

    out = {r.cluster_id: (r.cluster_size, r.keep_doc_id)
           for r in dedup_cluster(spark, str(tmp_path)).collect()}
    assert out.get(1) == (3, 1), out     # {1,2,3} merged transitively
    assert out.get(10) == (2, 10), out   # {10,11}
    assert 99 not in out                 # no edges -> not in any cluster


def test_hll_merge_consistent_and_bounded(spark, sf_dir):
    """Merged daily sketches must estimate exactly what a directly-built
    sketch estimates (merge associativity), and land within HLL error
    of the true distinct count."""
    from pyspark.sql import functions as F

    from agri_market_data_pipeline_spark.operators.aggregations import (
        agg_hll_merge,
    )
    from agri_market_data_pipeline_spark.tables import load

    rows = {r.event_type: r for r in agg_hll_merge(spark, sf_dir).collect()}
    # independent estimate check (the operator now emits contract FLAGS,
    # oracle-checked; here we pin the underlying estimate values too)
    direct = {
        r.event_type: r.est
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert rows, "no event types"
    for et, r in rows.items():
        assert r.merge_consistent == 1, (et, r)
        assert r.merged_within_5pct == 1, (et, r)
        assert abs(direct[et] - r.exact_distinct) <= max(
            3, 0.05 * r.exact_distinct
        ), (et, direct[et], r.exact_distinct)


def test_approx_count_distinct_estimate_bounded(spark, sf_dir):
    """The HLL++ estimate underlying agg_approx_count_distinct's
    contract flag must actually sit within the rsd's 2.5σ of exact."""
    from pyspark.sql import functions as F

    from agri_market_data_pipeline_spark.operators.aggregations import (
        agg_approx_count_distinct,
    )
    from agri_market_data_pipeline_spark.tables import load

    flags = agg_approx_count_distinct(spark, sf_dir).collect()
    assert flags and all(r.approx_within_5pct == 1 for r in flags), flags
    est = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_suppkey", 0.02).alias("approx"),
            F.countDistinct("l_suppkey").alias("exact"),
        )
        .collect()
    )
    for r in est:
        assert abs(r.approx - r.exact) <= max(3, 0.05 * r.exact), r


def test_phash_recovers_planted_near_dup_media(spark, tmp_path):
    """Two payloads differing by one byte in 4KB must pair with small
    hamming distance; unrelated payloads must not pair within the
    threshold. Run twice for determinism."""
    from agri_market_data_pipeline_spark.operators.multimodal import (
        multimodal_phash_pairs,
    )

    base = ("lorem ipsum " * 340)[:4000]
    near = base[:2000] + "X" + base[2001:]
    other = "".join(chr(33 + (i * 7) % 90) for i in range(4000))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal_phash_pairs(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 4, got
    assert (1, 3) not in got and (2, 3) not in got, got
    again = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal_phash_pairs(spark, str(tmp_path)).collect()
    }
    assert got == again


def test_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """The curation DAG must be monotone (each stage only drops rows),
    produce the requested sample size, publish valid lang-partitioned
    parquet with no exact duplicates, and be run-to-run deterministic."""
    from agri_market_data_pipeline_spark.jobs.curation_pipeline import curate

    rep = curate(spark, sf_dir, str(tmp_path), sample_k=50)
    assert (
        rep["raw"]
        >= rep["after_quality_gate"]
        >= rep["after_exact_dedup"]
        >= rep["after_near_dedup"]
        >= rep["sampled"]
    )
    assert rep["sampled"] == 50
    # Every near-dup cluster with >=1 survivor keeps exactly one
    # representative: drops == surviving members - surviving clusters.
    assert rep["near_clusters_surviving"] >= 1
    assert rep["after_near_dedup"] == rep["after_exact_dedup"] - (
        rep["near_members_surviving"] - rep["near_clusters_surviving"]
    )
    out = spark.read.parquet(rep["out"])
    assert "lang" in out.columns
    assert out.count() == 50
    assert out.select("text").distinct().count() == 50  # no exact dupes
    ids1 = sorted(r.doc_id for r in out.select("doc_id").collect())
    rep2 = curate(spark, sf_dir, str(tmp_path), sample_k=50)
    out2 = spark.read.parquet(rep2["out"])
    assert sorted(r.doc_id for r in out2.select("doc_id").collect()) == ids1


def test_pack_sequences_conserves_tokens_and_orders(spark, sf_dir):
    """Packing invariants an oracle can't state directly: (1) token
    conservation — the packed manifests' token totals equal the corpus
    total; (2) within a shard, sequences partition the doc range in
    order (seq k's last doc < seq k+1's first doc); (3) the assignment
    is repartition-invariant (pure function of doc_id/text, not of
    physical layout)."""
    from pyspark.sql import functions as F

    from agri_market_data_pipeline_spark.operators.traindata import (
        pack_sequences,
    )
    from agri_market_data_pipeline_spark.tables import load

    packed = pack_sequences(spark, sf_dir).collect()
    corpus_tokens = (
        load(spark, sf_dir, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.seq_tokens for r in packed) == corpus_tokens
    by_shard: dict = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.seq_id)
        assert [r.seq_id for r in rows] == list(range(len(rows)))
        for prev, nxt in zip(rows, rows[1:]):
            assert prev.last_doc < nxt.first_doc
    again = pack_sequences(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, packed))


def test_split_train_test_is_stable_under_corpus_growth(spark, sf_dir):
    """The hash split's defining property: membership of an existing doc
    never changes when the corpus grows (a row_number or rand split
    fails this). Splitting a half-corpus and the full corpus must agree
    on every shared doc_id."""
    from pyspark.sql import functions as F

    from agri_market_data_pipeline_spark.tables import load

    d = load(spark, sf_dir, "documents")
    cell = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(cell < 90, "train").when(cell < 95, "val").otherwise("test")
    )
    full = {
        r.doc_id: r.split
        for r in d.select("doc_id", split.alias("split")).collect()
    }
    half = {
        r.doc_id: r.split
        for r in d.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", split.alias("split"))
        .collect()
    }
    assert half and all(full[k] == v for k, v in half.items())
    # and the 90/5/5 shape is roughly honored
    n = len(full)
    frac_train = sum(1 for v in full.values() if v == "train") / n
    assert 0.8 < frac_train < 0.97


def test_countmin_estimates_never_undercount(spark, sf_dir):
    from agri_market_data_pipeline_spark.operators.aggregations import (
        agg_countmin_sketch,
    )

    rows = agg_countmin_sketch(spark, sf_dir).collect()
    assert rows, "probe set must be non-empty"
    for r in rows:
        # CMS collisions only ever ADD — an estimate below the exact
        # count means the sketch or the probe hashing is broken.
        assert r.overcount >= 0, r
        assert r.est_cnt >= r.exact_cnt, r


def test_join_size_sketch_overcounts_only_and_is_tight(spark, sf_dir):
    from agri_market_data_pipeline_spark.operators.aggregations import (
        agg_join_size_sketch,
    )

    r = agg_join_size_sketch(spark, sf_dir).collect()[0]
    # AMS/CMS inner product contains every true f_A·f_B term plus
    # non-negative collision cross-terms — never an undercount.
    assert r.overcount >= 0, r
    assert r.est_size >= r.exact_size > 0, r
    # and at this width/key-cardinality the estimate is a usable
    # planner statistic, not a degenerate upper bound
    assert r.est_size <= 2 * r.exact_size, r


def test_pagerank_mass_is_conserved_modulo_dangling(spark, sf_dir):
    from agri_market_data_pipeline_spark.operators.graph import (
        _edges,
        graph_pagerank,
    )
    from pyspark.sql import functions as F

    ranks = graph_pagerank(spark, sf_dir)
    total = ranks.agg(F.sum("rank_u")).collect()[0][0]
    n = ranks.count()
    # Every node holds at least the restart mass and at most everything.
    assert total >= 150_000 * n
    assert total <= 1_000_000 * n + n  # floor-div can only lose mass
    # Ranks differentiate: a dense trade graph must not be uniform.
    distinct = ranks.select("rank_u").distinct().count()
    assert distinct > 1


def test_relational_hll_estimate_within_error_bound(spark, sf_dir):
    from agri_market_data_pipeline_spark.operators.aggregations import (
        _HLLR_M,
        agg_hll_relational,
    )

    rows = agg_hll_relational(spark, sf_dir).collect()
    assert rows
    # Standard HLL relative error ~1.04/sqrt(m); allow 3 sigma.
    tol = 3 * 1.04 / (_HLLR_M ** 0.5)
    for r in rows:
        rel = abs(r.hll_estimate - r.exact_distinct) / max(r.exact_distinct, 1)
        assert rel <= tol, (r, rel, tol)


def test_logreg_quality_beats_majority_and_is_deterministic(spark, sf_dir):
    from agri_market_data_pipeline_spark.operators.similarity import (
        ml_logreg_quality,
    )

    r = ml_logreg_quality(spark, sf_dir).collect()[0]
    majority = max(r.n_positive, r.n_docs - r.n_positive)
    # The trained boundary must beat always-predict-the-majority-class.
    assert r.n_correct > majority, r
    # Training is a pure function of the data (no RNG anywhere).
    r2 = ml_logreg_quality(spark, sf_dir).collect()[0]
    assert (r.n_correct, r.weights) == (r2.n_correct, r2.weights)


def test_bpe_train_matches_pure_python_reference(spark, sf_dir):
    """Exact parity with an independent in-memory BPE implementation —
    the strongest check available for an operator whose stateful list
    fold has no SQL twin."""
    from collections import Counter

    from agri_market_data_pipeline_spark.operators.textstats import (
        _BPE_MERGES,
        text_bpe_train,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    freq = Counter()
    for r in docs:
        for w in r.text.split(" "):
            if len(w) >= 2:
                freq[w] += 1
    vocab = {tuple(w): f for w, f in freq.items()}

    expected = []
    for rank in range(_BPE_MERGES):
        pairs = Counter()
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += f
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        expected.append((rank, a, b, cnt))
        new_vocab = Counter()
        for seq, f in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] += f
        vocab = new_vocab

    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in text_bpe_train(spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == expected
