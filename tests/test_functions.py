"""Operator library: lsearch scalar ops vs oracle, textstats, dedup, ANN."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lsearch_spark import oracle
from lsearch_spark.corpus import make_pages, pages_df
from lsearch_spark.functions import ann, dedup, textstats, webstats
from lsearch_spark.functions.lsearch import (
    ContentRun,
    cascade,
    content_ext,
    content_path,
    content_title,
    has,
    hasnt,
    is_,
    more_count,
    not_,
    ranked,
)


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, 150).cache()


def test_loaders(spark, pages):
    r = pages.select(
        content_path().alias("p"), content_title().alias("t"), content_ext().alias("e")
    ).first()
    assert r["p"].startswith("https://") and r["t"].startswith("page-") and r["e"] == "html"


def test_scalar_ops_match_oracle(spark, pages):
    rows = pages.select(
        "doc_id",
        "text",
        is_(F.col("lang"), "en").alias("is_en"),
        not_(F.col("lang"), "en").alias("not_en"),
        has(F.col("text"), "biology").alias("has_b"),
        hasnt(F.col("text"), "biology").alias("hasnt_b"),
        more_count(F.col("text"), "the").alias("more_the"),
        more_count(F.col("text"), "Biology", insensitive=True).alias("more_bi"),
    ).collect()
    pdf = make_pages(150)
    langs = dict(zip(pdf["doc_id"], pdf["lang"]))
    for r in rows:
        lang, text = langs[r["doc_id"]], r["text"]
        assert r["is_en"] == (oracle.score_is(lang, "en") == 1.0)
        assert r["not_en"] == (oracle.score_not(lang, "en") == 1.0)
        assert r["has_b"] == (oracle.score_has(text, "biology") == 1.0)
        assert r["hasnt_b"] == (oracle.score_hasnt(text, "biology") == 1.0)
        assert r["more_the"] == oracle.score_more(text, "the")
        assert r["more_bi"] == oracle.score_more(oracle.ascii_lower(text), "biology")


def test_insensitive_targets_are_ascii_only(spark):
    """ADVICE r1: targets lowercase ASCII-only (reference cli.rs:381-397
    to_ascii_lowercase): 'É' must NOT fold to 'é' on either side, and an
    empty More target scores 1.0 like the oracle (oracle.py:45-47)."""
    df = spark.createDataFrame([(1, "CaFÉ x"), (2, "cafe x")], "doc_id long, text string")
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            has(F.col("text"), "É", insensitive=True).alias("has_eacute"),
            has(F.col("text"), "CAFÉ", insensitive=True).alias("has_cafe_upper"),
            is_(F.col("text"), "CaFÉ X", insensitive=True).alias("is_full"),
            more_count(F.col("text"), "", insensitive=True).alias("more_empty"),
        ).collect()
    }
    # 'É' stays 'É' (not folded): present in doc 1, absent in doc 2
    assert rows[1]["has_eacute"] and not rows[2]["has_eacute"]
    # 'CAFÉ' -> ascii-lower 'cafÉ' matches content 'cafÉ' (A-Z folded, É kept)
    assert rows[1]["has_cafe_upper"] and not rows[2]["has_cafe_upper"]
    assert rows[1]["is_full"]  # 'CaFÉ X' -> 'cafÉ x' == ascii_lower(content)
    assert rows[1]["more_empty"] == 1.0 == oracle.score_more("cafÉ x", "")


def test_cascade_matches_oracle(spark, pages):
    runs = [
        ContentRun("content-ext", [("is", "html")]),
        ContentRun("content-text", [("has", "biology"), ("more", "the")], insensitive=True),
    ]
    got = {r["doc_id"]: r["score"] for r in cascade(pages, runs).collect()}
    pdf = make_pages(150)
    want = {}
    for _, row in pdf.iterrows():
        ext = row["url"].rsplit(".", 1)[-1]
        if oracle.run_scorer(ext, [("is", "html")], False) is None:
            continue
        s = oracle.run_scorer(row["text"], [("has", "biology"), ("more", "the")], True)
        if s is not None:
            want[row["doc_id"]] = s
    assert got == want


def test_ranked_order(spark, pages):
    rows = ranked(pages, [ContentRun("content-text", [("more", "the")])]).limit(5).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_textstats(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog, in a house. It is you!"), (2, ""), (3, "der und das ist nicht mit ein")],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in df.select(
        "doc_id",
        textstats.token_count("text").alias("tc"),
        textstats.lang_id("text").alias("lang"),
        textstats.stopword_ratio("text").alias("sw"),
        textstats.quality_score("text").alias("q"),
        textstats.fingerprint("text").alias("fp"),
    ).collect()}
    assert r[1]["tc"] == 11 and r[1]["lang"] == "en"
    assert r[3]["lang"] == "de"
    assert r[2]["tc"] == 0 and r[2]["lang"] == "und" and r[2]["q"] == 0.25  # punct term only
    assert abs(r[1]["sw"] - 8 / 11) < 1e-12  # the,and,the,in,a,it,is,you
    import hashlib
    assert r[1]["fp"] == hashlib.md5(" ".join(
        "the cat and the dog in a house it is you".split()).encode()).hexdigest()


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org or see https://a.example/p?x=1&y=2 now"),
            (2, "server at 10.0.0.1 and 192.168.1.255, not 1.2.3.4567"),
            (3, "http://user@host.example/path hides an email-looking string"),
            (4, "clean text with no identifiers"),
        ],
        "doc_id long, text string",
    )
    counts = textstats.pii_counts("text")
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", counts["url"], counts["email"], counts["ip"],
        textstats.scrub_pii("text").alias("clean"),
    ).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_url"] == 1 and rows[1]["n_ip"] == 0
    assert "<EMAIL>" in rows[1]["clean"] and "<URL>" in rows[1]["clean"]
    assert "bob" not in rows[1]["clean"] and "a.example" not in rows[1]["clean"]
    assert rows[2]["n_ip"] == 2  # trailing-digit run breaks \b on the third
    assert rows[2]["clean"].count("<IP>") == 2
    # the url swallows its embedded email: counted once, as the url
    assert rows[3]["n_url"] == 1 and rows[3]["n_email"] == 0
    assert rows[4]["n_url"] == 0 and rows[4]["n_email"] == 0 and rows[4]["n_ip"] == 0
    assert rows[4]["clean"] == "clean text with no identifiers"


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),            # one bigram repeated
            (2, "a b c d e f"),                    # no repetition
            (3, "the cat sat the cat sat the cat"),# duplicated 3-grams
            (4, ""),                               # token-less
            (5, "word"),                           # below n-gram length
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in df.select(
        "doc_id",
        textstats.mean_token_len("text").alias("mtl"),
        textstats.dup_ngram_frac("text", 3).alias("dup3"),
        textstats.top_ngram_frac("text", 2).alias("top2"),
    ).collect()}
    assert abs(r[1]["mtl"] - 4.0) < 1e-12
    assert r[1]["top2"] == 1.0          # 'spam spam' is all 3 bigrams
    assert abs(r[1]["dup3"] - 0.5) < 1e-12   # 2 trigrams, 1 distinct
    assert r[2]["dup3"] == 0.0 and abs(r[2]["top2"] - 1 / 5) < 1e-12
    # doc 3: 6 trigrams, distinct {'the cat sat','cat sat the','sat the cat'} -> dup 0.5;
    # 7 bigrams, 'the cat' x3 -> top2 3/7
    assert abs(r[3]["dup3"] - 0.5) < 1e-12
    assert abs(r[3]["top2"] - 3 / 7) < 1e-12
    assert r[4]["mtl"] == 0.0 and r[4]["dup3"] == 0.0 and r[4]["top2"] == 0.0
    assert r[5]["dup3"] == 0.0 and r[5]["top2"] == 0.0 and r[5]["mtl"] == 4.0


def test_repetition_stats_match_python_twin(spark, pages):
    rows = pages.select(
        "doc_id",
        textstats.mean_token_len("text").alias("mtl"),
        textstats.dup_ngram_frac("text", 3).alias("dup3"),
        textstats.top_ngram_frac("text", 2).alias("top2"),
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in pages.select("doc_id", "text").collect()}
    from collections import Counter

    from lsearch_spark.tokenize import py_tokenize

    for r in rows:
        toks = py_tokenize(texts[r["doc_id"]])
        mtl = sum(map(len, toks)) / len(toks) if toks else 0.0
        tri = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        bi = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        dup3 = (len(tri) - len(set(tri))) / len(tri) if tri else 0.0
        top2 = max(Counter(bi).values()) / len(bi) if bi else 0.0
        assert abs(r["mtl"] - mtl) < 1e-9 and abs(r["dup3"] - dup3) < 1e-9
        assert abs(r["top2"] - top2) < 1e-9, r["doc_id"]


def test_url_host(spark):
    df = spark.createDataFrame(
        [
            (1, "https://WWW.Example.COM/a/b?q=1"),
            (2, "http://user:pw@site.org:8080/x"),
            (3, "ftp://files.net"),
            (4, "not a url"),
            (5, "https://host.io#frag"),
        ],
        "doc_id long, url string",
    )
    r = {x["doc_id"]: x["h"] for x in df.select("doc_id", webstats.url_host("url").alias("h")).collect()}
    assert r[1] == "www.example.com"
    assert r[2] == "site.org"
    assert r[3] == "files.net"
    assert r[4] == ""
    assert r[5] == "host.io"


def test_group_stats_and_cap(spark, pages):
    from lsearch_spark.tokenize import py_tokenize

    hosts = pages.withColumn("host", webstats.url_host("url"))
    stats = {r["host"]: r for r in webstats.group_stats(hosts, "host").collect()}
    rows = hosts.select("host", "doc_id", "text").collect()
    from collections import defaultdict

    want = defaultdict(lambda: [0, 0])
    for r in rows:
        want[r["host"]][0] += 1
        want[r["host"]][1] += len(py_tokenize(r["text"]))
    assert set(stats) == set(want)
    for h, (n, tok) in want.items():
        assert stats[h]["n_docs"] == n and stats[h]["n_tokens"] == tok
        assert 0.0 <= stats[h]["avg_quality"] <= 1.0
    # cap: at most 3 per host, keeping LOWEST doc_ids
    capped = webstats.cap_per_group(hosts, "host", 3)
    got = defaultdict(list)
    for r in capped.select("host", "doc_id").collect():
        got[r["host"]].append(r["doc_id"])
    by_host = defaultdict(list)
    for r in rows:
        by_host[r["host"]].append(r["doc_id"])
    for h, ids in by_host.items():
        assert sorted(got[h]) == sorted(ids)[:3]


def test_xxhash64_long_twin_matches_spark(spark):
    # Spark hashes a LongType via XXH64.hashLong == XXH64 over the value's
    # 8 little-endian bytes; the codec twin must agree (sampling depends on it)
    import struct

    from lsearch_spark.codec import xxhash64

    vals = [0, 1, -1, 42, -(2**63), 2**63 - 1, 123456789012345, -987654321]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxhash64(struct.pack("<q", v)), v


def test_stratified_sample_deterministic_and_twin(spark, pages):
    import struct

    from lsearch_spark.codec import xxhash64

    hosts = pages.withColumn("host", webstats.url_host("url"))
    rates = {}
    for i, r in enumerate(sorted({x["host"] for x in hosts.select("host").distinct().collect()})):
        rates[r] = [0.0, 0.3, 1.0][i % 3]
    kept = sorted(r["doc_id"] for r in webstats.stratified_sample(hosts, rates, key="host").collect())
    # python twin: same hash-threshold rule
    want = []
    for r in hosts.select("doc_id", "host").collect():
        rate = rates.get(r["host"], 0.0)
        h = xxhash64(struct.pack("<q", r["doc_id"])) % webstats.SAMPLE_RESOLUTION
        if h < round(rate * webstats.SAMPLE_RESOLUTION):
            want.append(r["doc_id"])
    assert kept == sorted(want)
    # determinism across repartitioning
    kept2 = sorted(
        r["doc_id"]
        for r in webstats.stratified_sample(hosts.repartition(13), rates, key="host").collect()
    )
    assert kept2 == kept


def test_plan_mixture(spark, pages):
    hosts = pages.withColumn("host", webstats.url_host("url"))
    stats = webstats.group_stats(hosts, "host")
    tokens = {r["host"]: r["n_tokens"] for r in stats.collect()}
    two = sorted(tokens)[:2]
    weights = {two[0]: 3.0, two[1]: 1.0}
    budget = int(0.5 * (tokens[two[0]] + tokens[two[1]]))
    rates = webstats.plan_mixture(stats, weights, budget, key_name="host")
    assert set(rates) == set(weights)
    for s, r in rates.items():
        assert 0.0 <= r <= 1.0
        expect = min(1.0, budget * (weights[s] / 4.0) / tokens[s])
        assert abs(r - expect) < 1e-12
    # dict input path agrees
    assert webstats.plan_mixture(tokens, weights, budget) == rates
    with pytest.raises(ValueError):
        webstats.plan_mixture(tokens, {two[0]: 0.0}, budget)


def test_exact_dedup(spark, pages):
    groups = dedup.exact_dup_groups(pages).filter(F.col("n_dups") > 1).collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 2  # the tie pair
    kept = dedup.drop_exact_dups(pages)
    assert kept.count() == pages.count() - 1


def test_find_contamination(spark, pages):
    from lsearch_spark.tokenize import py_tokenize

    # probes: 3 exact corpus texts + 1 novel text
    probe_rows = [(100 + i, r["text"]) for i, r in enumerate(
        pages.filter(F.col("doc_id").isin([5, 17, 40])).select("text").collect())]
    probe_rows.append((999, "entirely novel probe text that matches nothing in the corpus at all"))
    probes = spark.createDataFrame(probe_rows, "probe_id long, text string")
    got = dedup.find_contamination(pages, probes, threshold=0.8).collect()
    pairs = {(r["doc_id"], r["probe_id"]): r["jaccard"] for r in got}
    # python twin: all-pairs exact trigram jaccard >= 0.8
    def grams(t):
        toks = py_tokenize(t)
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    corpus = [(r["doc_id"], grams(r["text"])) for r in pages.select("doc_id", "text").collect()]
    want = {}
    for pid, ptxt in probe_rows:
        pg = grams(ptxt)
        if not pg:
            continue
        for did, dg in corpus:
            if not dg:
                continue
            j = len(pg & dg) / len(pg | dg)
            if j >= 0.8:
                want[(did, pid)] = j
    assert set(pairs) == set(want)
    for k, j in want.items():
        assert abs(pairs[k] - j) < 1e-9
    assert all(pid != 999 for _, pid in pairs)  # the novel probe matches nothing
    assert len(pairs) >= 3  # each exact probe found its source doc


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")], "doc_id long, text string"
    )
    out = {(-(-r["a_id"]), r["b_id"]): r["jaccard"] for r in dedup.consecutive_jaccard(df, n=2).collect()}
    assert out[(1, 2)] == 1.0 and out[(2, 3)] == 0.0


def test_minhash_lsh_finds_dups(spark, pages):
    pairs = dedup.minhash_lsh_pairs(pages, num_hashes=32, bands=8, n=2, threshold=0.9).collect()
    ids = {(r["a_id"], r["b_id"]) for r in pairs}
    tie_ids = tuple(sorted(make_pages(150).query("text == 'tiebreak quantum flux common signal'")["doc_id"]))
    assert tie_ids in ids
    for r in pairs:
        assert r["jaccard"] >= 0.9


def test_simhash_finds_dups(spark, pages):
    pairs = dedup.simhash_near_dups(pages, max_hamming=2).collect()
    tie_ids = tuple(sorted(make_pages(150).query("text == 'tiebreak quantum flux common signal'")["doc_id"]))
    assert tie_ids in {(r["a_id"], r["b_id"]) for r in pairs}
    assert all(r["hamming"] <= 2 for r in pairs)
    # storage_level knob (VERDICT r3 #8): identical results off-default
    disk = dedup.simhash_near_dups(pages, max_hamming=2, storage_level="DISK_ONLY").collect()
    assert sorted(map(tuple, disk)) == sorted(map(tuple, pairs))


def test_minhash_bucket_cap_drops_degenerate_buckets(spark):
    """The 100 TB guard: a clone swarm (every band bucket holds all
    clones) must be droppable via max_bucket while genuinely small-bucket
    near-dup pairs survive."""
    rows = [(i, "identical boilerplate page text repeated everywhere") for i in range(6)]
    rows += [(100, "a unique document about quantum flux capacitors and physics"),
             (101, "a unique document about quantum flux capacitors and biology")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_pairs(df, num_hashes=16, bands=8, n=2, threshold=0.4)
    assert uncapped.filter("a_id < 6").count() > 0  # clones pair up
    capped = dedup.minhash_lsh_pairs(df, num_hashes=16, bands=8, n=2, threshold=0.4, max_bucket=3)
    got = {(r["a_id"], r["b_id"]) for r in capped.collect()}
    assert all(a >= 100 for a, _ in got), got  # clone buckets (size 6) dropped
    assert (100, 101) in got  # the small-bucket near-dup pair survives


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_cosine_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    q = np.asarray(pdf.loc[pdf["vec_id"] == 0, "embedding"].iloc[0], dtype=np.float64)
    M = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
    cos = M @ q / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = sorted(zip(pdf["vec_id"], cos), key=lambda x: (-x[1], x[0]))[:5]
    got = ann.cosine_topk(emb, q.tolist(), k=5).collect()
    assert [r["vec_id"] for r in got] == [int(d) for d, _ in order]
    for r, (_, c) in zip(got, order):
        assert abs(r["cosine"] - c) < 1e-6


def test_lsh_topk_recall(spark, emb):
    pdf = emb.toPandas()
    q = list(pdf.loc[pdf["vec_id"] == 7, "embedding"].iloc[0])
    exact = [r["vec_id"] for r in ann.cosine_topk(emb, q, k=5).collect()]
    approx = [r["vec_id"] for r in ann.cosine_topk_lsh(emb, q, k=5, n_planes=8, radius=2).collect()]
    assert exact[0] in approx  # the query's own vector must be found
    # random vectors have weak LSH locality; assert mechanism, not magic
    assert len(set(exact) & set(approx)) >= 2


def test_lsh_indexed_matches_onthefly_and_prunes(spark, emb, tmp_path_factory):
    """VERDICT r1 item 5: materialized-signature ANN index must give the
    same results as the on-the-fly variant AND partition-prune the scan."""
    path = str(tmp_path_factory.mktemp("annidx") / "emb_lsh")
    e = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    ann.build_ann_index(spark, e, path, n_planes=6)
    q = [float(x) for x in e.filter(F.col("vec_id") == 7).first()["embedding"]]
    fly = ann.cosine_topk_lsh(e, q, k=5, n_planes=6, radius=2).collect()
    idx = ann.cosine_topk_lsh_indexed(spark, path, q, k=5, n_planes=6, radius=2).collect()
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in fly] == [
        (r["vec_id"], round(r["cosine"], 9)) for r in idx
    ]
    scan = spark.read.parquet(path).filter(F.col("_sig").isin([0, 1, 2]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_sig" in plan.split("PartitionFilters")[1][:200], plan


def test_ivf_full_probe_equals_exact(spark, emb, tmp_path_factory):
    """nprobe == n_centroids must reproduce brute-force exactly (every
    partition probed, exact rerank inside) — the IVF analog of
    pruned==exhaustive."""
    path = str(tmp_path_factory.mktemp("ivfidx") / "emb_ivf")
    e = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    ann.build_ivf_index(spark, e, path, n_centroids=8, sample=1000, iters=5)
    q = [float(x) for x in e.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = ann.cosine_topk(e, q, k=5).collect()
    full = ann.cosine_topk_ivf(spark, path, q, k=5, nprobe=8).collect()
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in exact] == [
        (r["vec_id"], round(r["cosine"], 9)) for r in full
    ]


def test_ivf_probe_prunes_partitions_and_recalls(spark, emb, tmp_path_factory):
    """Small nprobe: the scan must be partition-pruned to the probed
    `_cid` directories; the query's own vector (cosine 1) must be found
    because its centroid is by construction the top-ranked probe; every
    returned row must be sound (appears in the exact ranking with the
    same cosine)."""
    path = str(tmp_path_factory.mktemp("ivfidx2") / "emb_ivf")
    e = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    ann.build_ivf_index(spark, e, path, n_centroids=8, sample=1000, iters=5)
    q = [float(x) for x in e.filter(F.col("vec_id") == 7).first()["embedding"]]
    got = ann.cosine_topk_ivf(spark, path, q, k=5, nprobe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cid" in plan.split("PartitionFilters")[1][:200], plan
    rows = got.collect()
    assert rows and rows[0]["vec_id"] == 7 and abs(rows[0]["cosine"] - 1.0) < 1e-9
    exact = {r["vec_id"]: r["cosine"] for r in ann.cosine_topk(e, q, k=500).collect()}
    for r in rows:  # soundness: approximate may miss, never fabricate
        assert abs(exact[r["vec_id"]] - r["cosine"]) < 1e-9


def test_ivf_batch_matches_single(spark, emb, tmp_path_factory):
    """One shared scan for N queries must reproduce cosine_topk_ivf
    per query exactly (same probes, same cosine fold, same tie-break)."""
    path = str(tmp_path_factory.mktemp("ivfb") / "emb_ivf")
    e = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    ann.build_ivf_index(spark, e, path, n_centroids=8, sample=1000, iters=5)
    qs = {
        str(v): [float(x) for x in e.filter(F.col("vec_id") == v).first()["embedding"]]
        for v in (3, 7, 11)
    }
    got = ann.cosine_topk_ivf_batch(spark, path, qs, k=5, nprobe=2).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], round(r["cosine"], 9)))
    for qid, qv in qs.items():
        single = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in ann.cosine_topk_ivf(spark, path, qv, k=5, nprobe=2).collect()
        ]
        assert by_q[qid] == single, qid


def test_ivf_centroids_deterministic(spark, emb):
    e = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    c1 = ann.ivf_centroids(e, n_centroids=4, sample=300, iters=3)
    c2 = ann.ivf_centroids(e, n_centroids=4, sample=300, iters=3)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_embedding_near_dups_self(spark, emb):
    # duplicate a vector -> the pair must surface at threshold ~1
    dup = emb.filter(F.col("vec_id") == 3).withColumn("vec_id", F.lit(100003).cast("long"))
    pairs = ann.embedding_near_dups(emb.unionByName(dup), threshold=0.999).collect()
    assert (3, 100003) in {(r["a_id"], r["b_id"]) for r in pairs}


def test_embedding_near_dups_max_bucket_guard(spark):
    # 1k identical embeddings land in ONE signature bucket: uncapped that is
    # a ~500k-pair self-join; with the cap the degenerate bucket is dropped
    # (routed to exact dedup) while a normal planted near-dup still surfaces.
    import pandas as pd

    n = 1000
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(n)]
    rows.append((5000, [0.0, 1.0, 0.0, 0.0]))
    rows.append((5001, [0.0, 0.999, 0.001, 0.0]))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    capped = ann.embedding_near_dups(df, threshold=0.99, max_bucket=10).collect()
    got = {(r["a_id"], r["b_id"]) for r in capped}
    assert (5000, 5001) in got
    assert not any(a < 1000 and b < 1000 for a, b in got)  # degenerate bucket dropped
    # uncapped variant keeps exact semantics (spot-check on a small slice)
    small = df.filter((F.col("vec_id") < 3) | (F.col("vec_id") >= 5000))
    full = ann.embedding_near_dups(small, threshold=0.99, max_bucket=None).collect()
    fgot = {(r["a_id"], r["b_id"]) for r in full}
    assert {(0, 1), (0, 2), (1, 2), (5000, 5001)} <= fgot
