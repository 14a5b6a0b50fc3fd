"""Datapipe operator tests: doc dedup, similarity, multimodal fidelity.

These are property tests on constructed inputs (the driver's DuckDB oracle
harness covers the value-level cross-engine checks; see
scripts/selfcheck.py). Here we pin the semantic contracts:
- exact dedup keeps exactly one keeper per distinct text;
- identical documents collide on EVERY MinHash band and are found by LSH;
- disjoint documents share no bands (w.h.p.) and Jaccard of identical
  docs is 1.0;
- SimHash of identical docs is identical, and near-identical docs are
  closer in Hamming distance than unrelated ones;
- the lossy image re-encode meets the north rule's PSNR >= 40 dB gate;
- ANN bucketing is deterministic across independent runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rcspark.datapipe import dedupdocs as dd
from rcspark.datapipe import similarity as sim
from rcspark.datapipe.multimodal import (
    image_features,
    reencode_lossy,
    resize_images,
    synthesize_images,
)

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_B = DOC_A.replace("lazy", "sleepy")  # near-dup: one token differs
DOC_C = "completely unrelated text about spark shuffle partitions and bloom filters"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, DOC_A), (1, DOC_A), (2, DOC_B), (3, DOC_C)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["keeper_id"]: r["n_copies"] for r in dd.exact_dedup(docs).collect()}
    assert out == {0: 2, 2: 1, 3: 1}  # doc 1 deduped into keeper 0


def test_minhash_identical_docs_share_all_bands(docs):
    rows = dd.minhash_rows(docs)
    sig = {
        doc: {r["band_id"]: r["band_hash"] for r in grp}
        for doc, grp in _group(rows.collect(), "doc_id").items()
    }
    assert sig[0] == sig[1]  # identical text -> identical signature
    assert len(sig[0]) == dd.MINHASH_K
    assert sig[0] != sig[3]  # unrelated text -> different signature


def test_lsh_finds_duplicates_not_unrelated(docs):
    pairs = dd.lsh_candidate_pairs(dd.minhash_rows(docs), min_bands=2).collect()
    got = {(r["doc_a"], r["doc_b"]): r["n_bands"] for r in pairs}
    assert got[(0, 1)] == dd.MINHASH_K  # exact dups collide on every band
    assert (0, 3) not in got and (1, 3) not in got and (2, 3) not in got


def test_jaccard_exact(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.jaccard_pairs(docs).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.0 < pairs[(0, 2)] < 1.0  # near-dup: some shared shingles
    assert (0, 3) not in pairs  # no shared shingles at all


def test_simhash_distance_orders_similarity(docs):
    h = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs).collect()}
    assert h[0] == h[1]
    d_near = bin(h[0] ^ h[2]).count("1")
    d_far = bin(h[0] ^ h[3]).count("1")
    assert d_near <= d_far


def test_ann_bucket_deterministic(spark):
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    b1 = {r["vec_id"]: r["bucket"] for r in emb.select("vec_id", sim.lsh_bucket(F.col("embedding"), 4, dim=8).alias("bucket")).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in emb.select("vec_id", sim.lsh_bucket(F.col("embedding"), 4, dim=8).alias("bucket")).collect()}
    assert b1 == b2
    assert len(set(b1.values())) > 1  # planes actually split the space


def test_cosine_topk_self_similarity(spark):
    # vec 0 and vec 10 are identical -> cosine 1.0 must rank first
    emb = spark.createDataFrame(
        [(i, [float((i % 10) * 7 + j) for j in range(8)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    top = sim.cosine_topk(emb, [0], k=1).collect()
    assert top[0]["vec_id"] == 10 and top[0]["cos_sim"] == 1.0


@pytest.fixture(scope="module")
def images(spark):
    ids = spark.createDataFrame([(f"img{i:04d}",) for i in range(12)], "image_id string")
    return synthesize_images(ids).persist()


def test_image_features_match_metadata(images):
    feats = {r["image_id"]: r for r in image_features(images).collect()}
    for row in images.collect():
        f = feats[row["image_id"]]
        assert (f["w"], f["h"], f["fmt"]) == (row["w"], row["h"], row["fmt"])
        assert f["phash"] == row["phash"]
        assert 0.0 <= f["mean_r"] <= 255.0


def test_lossy_reencode_meets_psnr_gate(images):
    # the north rule's fidelity contract: PSNR >= 40 dB for lossy formats
    rows = reencode_lossy(images).collect()
    assert rows and all(r["psnr_db"] >= 40.0 for r in rows)


def test_resize_shapes(images):
    rows = resize_images(images, out_w=8, out_h=8).collect()
    assert rows and all(r["out_w"] == 8 and r["out_h"] == 8 for r in rows)
    from rcspark.codecs import decode_image

    pix, fmt = decode_image(bytes(rows[0]["bytes"]))
    assert pix.shape == (8, 8, 3) and fmt == "ppm"


def _group(rows, key):
    out: dict = {}
    for r in rows:
        out.setdefault(r[key], []).append(r)
    return out


def test_ivf_cell_deterministic_and_split(spark):
    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 5) % 17) - 8.0 for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    cells = {r["vec_id"]: r["cell"] for r in emb.select(
        "vec_id", sim.ivf_cell(F.col("embedding"), ncells=4, dim=8).alias("cell")).collect()}
    cells2 = {r["vec_id"]: r["cell"] for r in emb.select(
        "vec_id", sim.ivf_cell(F.col("embedding"), ncells=4, dim=8).alias("cell")).collect()}
    assert cells == cells2
    assert len(set(cells.values())) > 1


def test_ivf_identical_vectors_same_cell_and_found(spark):
    # vec 0 and 10 identical: same cell, and IVF search must find the twin
    emb = spark.createDataFrame(
        [(i, [float((i % 10) * 3 + j) for j in range(8)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    top = sim.ann_topk_ivf(emb, [0], k=1, dim=8, id_col="vec_id", vec_col="embedding")
    row = top.collect()[0]
    assert row["vec_id"] == 10 and row["cos_sim"] == 1.0


def test_video_frame_sampling(spark):
    from rcspark.datapipe.multimodal import (
        decode_video,
        sample_frames,
        synthesize_videos,
    )
    from rcspark.codecs import decode_image, phash64

    ids = spark.createDataFrame([(f"v{i}",) for i in range(6)], "video_id string")
    vids = synthesize_videos(ids).persist()
    meta = {r["video_id"]: r for r in vids.collect()}
    frames = sample_frames(vids, every_k=3).collect()
    by_vid: dict = {}
    for r in frames:
        by_vid.setdefault(r["video_id"], []).append(r)
    for vid, rows in by_vid.items():
        n = meta[vid]["n_frames"]
        assert sorted(r["frame_idx"] for r in rows) == list(range(0, n, 3))
        # each sampled frame decodes and its phash matches the source frame
        src = decode_video(bytes(meta[vid]["bytes"]))
        for r in rows:
            pix, fmt = decode_image(bytes(r["bytes"]))
            assert fmt == "ppm" and pix.shape == (16, 16, 3)
            assert (pix == src[r["frame_idx"]]).all()
            assert r["phash"] == phash64(src[r["frame_idx"]])


def test_audio_features(spark):
    from rcspark.datapipe.multimodal import audio_features, synthesize_audio
    from rcspark.xxh import xxh64

    ids = spark.createDataFrame([(f"a{i}",) for i in range(8)], "audio_id string")
    feats = {r["audio_id"]: r for r in audio_features(synthesize_audio(ids)).collect()}
    assert len(feats) == 8
    for aid, r in feats.items():
        expected_freq = 100.0 + (xxh64(aid.encode()) % 1900)
        assert r["rate"] == 8000 and r["n_samples"] == 4000
        assert r["duration_s"] == 0.5
        # dominant frequency recovered within FFT bin resolution (rate/n = 2 Hz)
        assert abs(r["dominant_hz"] - expected_freq) <= 2.5, (aid, r["dominant_hz"], expected_freq)
        # 0.6-amplitude sine + small noise: rms near 0.6/sqrt(2) ~ 0.424
        assert 0.3 < r["rms"] < 0.55
        assert 0.0 < r["zero_cross_rate"] < 1.0


def test_ann_recall_floors(spark):
    """ANN recall vs brute-force on the sf0.001 embeddings table — pins the
    scan-fraction/recall tradeoff: multi-probe LSH scans ~(nplanes+1)/2^n
    of the corpus, IVF scans ~1/ncells. Floors are measured values minus
    margin (random-ish 64-dim test vectors are a worst case for LSH: top-5
    cosine is noise-dominated; real embedding corpora cluster far harder)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = [0, 1, 2, 3, 4]
    brute = {(r["probe_id"], r["vec_id"]) for r in sim.cosine_topk(emb, probes, k=5).collect()}
    lsh = {(r["probe_id"], r["vec_id"]) for r in sim.ann_topk_lsh(emb, probes, k=5).collect()}
    ivf = {(r["probe_id"], r["vec_id"]) for r in sim.ann_topk_ivf(emb, probes, k=5).collect()}
    assert len(brute) == 25
    assert len(lsh & brute) / len(brute) >= 0.05
    assert len(ivf & brute) / len(brute) >= 0.3


def test_pq_codes_shape_and_adc_recall(spark):
    """Trained product quantization: codes live in [0, PQ_KSUB), use a
    non-degenerate share of the codebook, and ADC top-5 recall vs brute
    cosine clears a floor (measured 0.16 on the noise-dominated test
    vectors — 2-byte codes over random 64-dim data are PQ's worst case;
    the floor is half that, and the production recall knob is PQ_M)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.pq_train(emb)
    assert set(cents) == set(range(sim.PQ_M))
    codes = sim.pq_encode(emb, cents)
    import pyspark.sql.functions as SF

    agg = codes.agg(
        *[SF.min(f"code{m}").alias(f"lo{m}") for m in range(sim.PQ_M)],
        *[SF.max(f"code{m}").alias(f"hi{m}") for m in range(sim.PQ_M)],
        *[SF.countDistinct(f"code{m}").alias(f"nd{m}") for m in range(sim.PQ_M)],
    ).collect()[0]
    for m in range(sim.PQ_M):
        assert 0 <= agg[f"lo{m}"] and agg[f"hi{m}"] < sim.PQ_KSUB
        assert agg[f"nd{m}"] >= sim.PQ_KSUB // 2  # trained codebook gets used
    probes = [0, 1, 2, 3, 4]
    brute = {(r["probe_id"], r["vec_id"]) for r in sim.cosine_topk(emb, probes, k=5).collect()}
    pq = {(r["probe_id"], r["vec_id"]) for r in sim.ann_topk_pq(emb, probes, k=5, cents=cents).collect()}
    assert len(pq) == 25
    assert len(pq & brute) / len(brute) >= 0.08


def test_phash_neardup_exact_recall_within_band_bound(spark):
    """Banded Hamming LSH over phashes: for max_hamming ≤ nbands-1 the
    band-equality blocking has EXACT recall (pigeonhole) — every planted
    pair within the threshold must be found, none beyond it."""
    from rcspark.datapipe.multimodal import phash_neardup_pairs

    base = 0x0123_4567_89AB_CDEF
    rows = [("a0", base)]
    # flip k bits spread across DIFFERENT bands (worst case for blocking)
    for k in (1, 3, 6, 7):
        ph = base
        for j in range(k):
            ph ^= 1 << (j * 8 + 2)  # one flipped bit in band j
        rows.append((f"a{k}", ph))
    rows.append(("far", base ^ ((1 << 40) - 1)))  # hamming 40
    items = spark.createDataFrame(rows, "item_id string, phash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(items, max_hamming=6).collect()
    }
    assert got[("a0", "a1")] == 1
    assert got[("a0", "a3")] == 3
    assert got[("a0", "a6")] == 6
    assert ("a0", "a7") not in got          # beyond threshold
    assert not any("far" in p for p in got)
    assert got[("a1", "a3")] == 2           # pairs among the variants too


def test_trigram_langid_trained_on_planted_corpus(spark):
    """Corpus-trained trigram language ID on PLANTED language-salted docs
    (the testdata documents.lang column is a pure label — de/es/fr/zh
    profile words never occur in the text, so accuracy there is
    meaningless for any model). Train on the doc_id%5==0 split, score
    everything: salted trigrams are rate-distinctive, so accuracy must be
    near-perfect; the whole procedure is exact-integer deterministic."""
    import numpy as np

    from rcspark.datapipe import text as tx

    langs = sorted(tx.LANG_PROFILES)
    filler = ["data", "query", "table", "row", "scan", "batch", "join", "value"]
    rng = np.random.default_rng(5)
    rows = []
    for i in range(250):
        lang = langs[i % len(langs)]
        words = [str(w) for w in rng.choice(filler, 30)] + [
            str(w) for w in rng.choice(list(tx.LANG_PROFILES[lang]), 10)
        ]
        rng.shuffle(words)
        rows.append((i, lang, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    # train split stride 4 is coprime with the 5-language round-robin, so
    # the split covers every class (stride 5 would train on one language)
    weights = tx.trigram_lang_weights(docs.filter(F.col("doc_id") % 4 == 0), langs)
    guessed = tx.langid_trigram_trained(docs, weights, langs)
    out = docs.select("doc_id", "lang").join(guessed, "doc_id").collect()
    acc = sum(1 for r in out if r["lang"] == r["lang_guess"]) / len(out)
    assert acc >= 0.9, acc
    # every language must actually be predicted (no majority-class collapse)
    assert {r["lang_guess"] for r in out} == set(langs)


def test_kmeans_ivf_balanced_and_recall(spark):
    """Trained IVF vs fixed md5 centroids (deterministic data+algo, so the
    measured numbers are exact). On sf0.001 the md5 codebook collapses to 6
    effective cells with one 226-vector monster (expected scan fraction
    0.35 — a skew disaster at corpus scale); 3 Lloyd iterations balance to
    8 cells of ~62 (scan fraction 0.126). Recall drops in absolute terms
    (less corpus scanned) but RISES per scanned row — the metric that
    matters when ncells scales with the corpus."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = [0, 1, 2, 3, 4]
    brute = {(r["probe_id"], r["vec_id"]) for r in sim.cosine_topk(emb, probes, k=5).collect()}

    def sizes(df):
        return np.array([r["c"] for r in df.groupBy("cell").agg(F.count("*").alias("c")).collect()])

    fixed_cells = emb.select("vec_id", sim.ivf_cell(F.col("embedding")).alias("cell"))
    trained_src = emb.select("vec_id", sim._quant_col(F.col("embedding")).alias("q"))
    trained_cells = sim._assign_cells(trained_src, sim.kmeans_centroids(emb))
    sf_fixed, sf_trained = (
        float((s * s).sum()) / s.sum() ** 2 for s in (sizes(fixed_cells), sizes(trained_cells))
    )
    assert sf_trained < sf_fixed / 2  # balanced cells: >2x less corpus scanned
    s_tr = sizes(trained_cells)
    assert s_tr.max() <= 2 * s_tr.mean()  # no monster cell

    r_fixed = len({(r["probe_id"], r["vec_id"]) for r in sim.ann_topk_ivf(emb, probes, k=5).collect()} & brute) / 25
    r_trained = len({(r["probe_id"], r["vec_id"]) for r in sim.ann_topk_ivf_trained(emb, probes, k=5).collect()} & brute) / 25
    assert r_trained >= 0.12
    assert r_trained / sf_trained > r_fixed / sf_fixed  # better recall per scanned row


def test_div_half_away_matches_duckdb():
    """The centroid-update rounding rule (ADVICE r2 medium): one exact-
    integer half-away-from-zero formula on both sides. Sweep every
    quotient shape incl. exact .5 halves, negative sums, and non-halves,
    and check Python vs the DuckDB SQL twin value-for-value."""
    import duckdb

    cases = [(s, n) for s in range(-25, 26) for n in (1, 2, 3, 4, 7, 10)]
    sql = sim._sql_div_half_away("s", "n")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s BIGINT, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    got = dict(
        ((r[0], r[1]), r[2])
        for r in con.execute(f"SELECT s, n, {sql} FROM t").fetchall()
    )
    for s, n in cases:
        py = sim._div_half_away(s, n)
        assert got[(s, n)] == py, (s, n, got[(s, n)], py)
        # and the rule really is half-away: check against Fraction
        from fractions import Fraction

        q = Fraction(s, n)
        lo, hi = q.__floor__(), q.__ceil__()
        expect = (hi if q >= 0 else lo) if abs(q - lo) == abs(hi - q) and lo != hi else (
            lo if abs(q - lo) < abs(hi - q) else hi
        )
        assert py == expect, (s, n, py, expect)


def test_kmeans_driver_equals_distributed(spark):
    """The driver-side numpy trainer (the faiss-shaped offline default)
    and the distributed Spark Lloyd must produce bit-identical codebooks —
    they're exact-integer twins, so equality is ==, not allclose."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for kw in (
        dict(ncells=None, sample_mod=sim.IVF_SAMPLE_MOD),
        dict(ncells=sim.IVF_CELLS, sample_mod=None),
    ):
        a = sim.kmeans_centroids(emb, distributed=False, **kw)
        b = sim.kmeans_centroids(emb, distributed=True, **kw)
        assert a == b, kw


def test_ivf_offline_codebook_roundtrip(spark, tmp_path):
    """Production trained-IVF path (VERDICT r2 next-round #2): the codebook
    is trained OFFLINE on the digest-sample with derived ncells, persisted
    as a tiny parquet table, and search against the loaded codebook is
    bit-identical to the inline-sampled query path — i.e. zero training
    work remains in the query path."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "codebook")
    cents = sim.train_ivf_codebook(spark, emb, path=path)
    loaded = sim.load_ivf_codebook(spark, path)
    assert loaded == cents
    probes = [0, 1, 2, 3, 4]
    offline = sim.ann_topk_ivf_trained(emb, probes, k=5, cents=loaded, nprobe=2)
    inline = sim.ann_topk_ivf_trained(
        emb, probes, k=5, ncells=None, sample_mod=sim.IVF_SAMPLE_MOD, nprobe=2
    )
    assert sorted(map(tuple, offline.collect())) == sorted(map(tuple, inline.collect()))


def test_ivf_derived_params_scale_with_corpus(spark):
    """VERDICT r2 next-round #8: ANN parameters must grow with corpus
    size. derive_ncells is isqrt-clamped; the sampled trainer actually
    produces more cells on the bigger table; and nprobe=2 search recall
    stays at-or-above the old fixed-8-cell nprobe=1 floor."""
    assert sim.derive_ncells(16) == sim.IVF_MIN_CELLS
    assert sim.derive_ncells(900) == 30
    assert sim.derive_ncells(10**9) == sim.IVF_MAX_CELLS
    small = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # sf0.001 and sf0.01 both hold 500 embeddings; sf0.1 is the bigger corpus
    big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    c_small = sim.kmeans_centroids(small, ncells=None, sample_mod=sim.IVF_SAMPLE_MOD)
    c_big = sim.kmeans_centroids(big, ncells=None, sample_mod=sim.IVF_SAMPLE_MOD)
    assert len(c_big) > len(c_small)

    probes = [0, 1, 2, 3, 4]
    brute = {(r["probe_id"], r["vec_id"]) for r in sim.cosine_topk(small, probes, k=5).collect()}
    hits = {
        (r["probe_id"], r["vec_id"])
        for r in sim.ann_topk_ivf_trained(
            small, probes, k=5, ncells=None, sample_mod=sim.IVF_SAMPLE_MOD, nprobe=2
        ).collect()
    }
    assert len(hits & brute) / 25 >= 0.12  # >= the fixed-codebook floor


def test_derived_lsh_planes_scale_with_corpus(spark):
    """VERDICT r2 next-round #8 (LSH half): plane counts derived from the
    corpus size, with the historical constants as floors — so at gate
    scale the derived value IS the constant (oracles unaffected) and at
    production counts the bucket COUNT grows, not bucket occupancy."""
    # floor regime: anything ≤ 128·2^8 vectors keeps the constant
    assert sim.derive_nplanes(500) == sim.NPLANES
    assert sim.derive_nplanes(128 * 256) == sim.NPLANES
    # growth regime: E[bucket] stays ≈ LSH_TARGET_BUCKET
    assert sim.derive_nplanes(10_000_000) == 17
    for n in (10**6, 10**8, 10**10):
        p = sim.derive_nplanes(n)
        assert p == sim.LSH_MAX_PLANES or n / 2**p <= sim.LSH_TARGET_BUCKET
    assert sim.derive_nplanes(10**12) == sim.LSH_MAX_PLANES  # cap
    # monotone in corpus size
    ps = [sim.derive_nplanes(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert ps == sorted(ps)

    # at testdata scale the derived path is bit-identical to the constants
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert sim.derive_nplanes(sim.approx_corpus_size(emb)) == sim.NPLANES
    auto = sim.ann_topk_lsh(emb, [0, 1, 2], k=3, nplanes=None)
    fixed = sim.ann_topk_lsh(emb, [0, 1, 2], k=3, nplanes=sim.NPLANES)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, fixed.collect()))


def test_banded_neardup_recall_floor(spark):
    """Banded LSH near-dup recall on PLANTED near-duplicates (the testdata
    embeddings carry no pair above cos 0.5, so the test plants its own):
    each base vector gets a deterministic small-noise copy (cos ≈ 0.99).
    Theory: one 8-plane band keeps a cos≈0.99 pair w.p. ≈ (1-θ/π)^8 ≈ 0.78;
    2 bands ≈ 0.95. Floors are measured-minus-margin; banding must also
    strictly beat a single band — the reason VERDICT r1 #4 asked for it."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((120, 64))
    noisy = base + 0.08 * rng.standard_normal((120, 64))
    rows = [(i, base[i].astype(float).tolist()) for i in range(120)] + [
        (1000 + i, noisy[i].astype(float).tolist()) for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planted = {(i, 1000 + i) for i in range(120)}

    def recall(bands):
        found = {
            (r["id_a"], r["id_b"])
            for r in sim.neardup_pairs_banded(
                emb, bands=bands, min_cos=0.9
            ).collect()
        }
        return len(found & planted) / len(planted)

    r1, r2 = recall(1), recall(2)
    assert r2 >= 0.85, r2
    assert r2 > r1, (r1, r2)


def test_pii_scrub_and_count(spark):
    """Golden vectors through every PII pattern: redaction tags, counts,
    overlap-free fold order, and clean text passing through untouched."""
    from rcspark.datapipe import text as tx

    rows = [
        (0, "mail A.User+tag@Sub.Example.ORG now"),
        (1, "call +1 555-123-4567 or 555 987 6543 today"),
        (2, "host 10.0.255.7 and 192.168.0.42"),
        (3, "nothing sensitive here at all"),
        (4, "combo a@b.co 555-000-1111 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {
        r["i"]: (r["s"], r["n"])
        for r in df.select(
            "i",
            tx.pii_scrub(F.col("t")).alias("s"),
            tx.pii_count(F.col("t")).alias("n"),
        ).collect()
    }
    assert out[0] == ("mail [EMAIL] now", 1)
    assert out[1] == ("call [PHONE] or [PHONE] today", 2)
    assert out[2] == ("host [IPV4] and [IPV4]", 2)
    assert out[3] == ("nothing sensitive here at all", 0)
    assert out[4] == ("combo [EMAIL] [PHONE] [IPV4]", 3)


def test_chunk_texts_shapes(spark):
    """Chunk boundary math: overlap, short docs, empty docs, exact-fit."""
    from rcspark.datapipe import text as tx

    toks = F.split(F.col("t"), " ")
    df = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "a b"), (2, ""), (3, "a b c d")],
        "i long, t string",
    )
    # window 4, stride 3 → doc0 (7 toks): [a b c d], [d e f g], [g]
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i",
            tx.chunk_texts(
                F.when(F.col("t") == "", F.array().cast("array<string>")).otherwise(toks),
                4,
                3,
            ).alias("c"),
        ).collect()
    }
    assert got[0] == ["a b c d", "d e f g", "g"]
    assert got[1] == ["a b"]
    assert got[2] == []
    assert got[3] == ["a b c d", "d"]


# -- round-4 continuation: paragraph dedup + CDC chunking -----------------------


def test_paragraph_dedup_planted_inter_and_intra(spark):
    """Shared boilerplate survives only in the corpus-first doc; an
    intra-doc repeat survives only at its first position; reassembly
    preserves paragraph order."""
    from rcspark.datapipe.dedupdocs import paragraph_dedup
    from rcspark.datapipe.hashing import digest60_py

    bp = "all rights reserved"
    rows = [
        (1, 0, "alpha beta"), (1, 1, bp), (1, 2, "gamma delta"),
        (2, 0, bp), (2, 1, "epsilon zeta"), (2, 2, "epsilon zeta"),
        (3, 0, bp),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pidx long, para string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (3, 3)  # first owner keeps bp
    assert out[1]["kept_digest"] == digest60_py(f"alpha beta {bp} gamma delta")
    # doc 2: loses bp (doc 1 owns it) and its own repeated paragraph
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (3, 1)
    assert out[2]["kept_digest"] == digest60_py("epsilon zeta")
    assert out[2]["kept_ppm"] == 333333
    # doc 3 is ALL duplicate → empty reassembly
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (1, 0)
    assert out[3]["kept_digest"] is None


def test_cdc_chunks_shift_resilience(spark):
    """The CDC property fixed-stride windows lack: prepending one token
    shifts only the prefix chunk — boundaries resync at the next trigger,
    so nearly all chunk digests survive the edit."""
    from rcspark.datapipe.hashing import digest60_py
    from rcspark.datapipe.text import cdc_chunk_stats

    words = [f"w{i}" for i in range(400)]
    base = " ".join(words)
    edited = "inserted " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    # recover the chunk digests by running the same trigger rule in python
    def chunks(tokens):
        out, cur = [], []
        for t in tokens:
            cur.append(t)
            if digest60_py(t) % 8 == 0:
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    ca = set(chunks(base.split(" ")))
    cb = set(chunks(edited.split(" ")))
    assert len(ca & cb) >= len(ca) - 1  # only the prefix chunk differs
    # and the Spark operator agrees with the python twin on chunk counts
    got = {r["doc_id"]: r for r in cdc_chunk_stats(df).collect()}
    assert got[1]["n_chunks"] == len(chunks(base.split(" ")))
    assert got[2]["n_chunks"] == len(chunks(edited.split(" ")))
    assert got[1]["n_tokens"] == 400 and got[2]["n_tokens"] == 401
    # the shared suffix chunks make nearly everything cross-doc shared
    assert got[1]["shared_ppm"] >= 900000


def test_thumbs_fit_box_and_integer_means():
    """Aspect fit matches PIL thumbnail semantics (bounding box, floor,
    min 1px) and block means are exact integer division."""
    import numpy as np

    from rcspark.datapipe.multimodal import fit_box, int_block_mean

    assert fit_box(64, 64, 8, 8) == (8, 8)
    assert fit_box(64, 16, 8, 8) == (8, 2)   # wide → height shrinks
    assert fit_box(16, 64, 8, 8) == (2, 8)   # tall → width shrinks
    assert fit_box(100, 1, 8, 8) == (8, 1)
    assert fit_box(1, 100, 8, 8) == (1, 8)
    pix = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    t = int_block_mean(pix, 2, 2)
    # block (0,0) rows 0-1 cols 0-1 channel 0: values 0,3,12,15 → 30//4=7
    assert t[0, 0, 0] == 7
    assert t.shape == (2, 2, 3)
