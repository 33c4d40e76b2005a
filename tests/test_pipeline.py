"""Declarative curation pipeline: curate() + curation_report() vs a
sequential python twin on a corpus with planted violations."""

import pytest
from pyspark.sql import functions as F

from lsearch_spark.pipeline import CurationRules, curate, curation_report
from lsearch_spark.tokenize import py_tokenize


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, text, lang, source)
        (1, "the cat sat on the mat and it is a fine day today", "en", "a"),
        (2, "the cat sat on the mat and it is a fine day today", "en", "a"),  # dup of 1
        (3, "der hund ist nicht mit dem ball und das ist gut so", "de", "a"),  # lang
        (4, "tiny", "en", "a"),                                   # tokens
        (5, "spam spam spam spam spam spam spam spam spam spam", "en", "a"),  # repetition
        (6, "the dog ran to the park and you see that it is far", "en", "b"),
        (7, "a bird flew over the lake and it is quiet out there", "en", "b"),
        (8, "the sun set over the hill and it is red in the sky", "en", "b"),
        (9, "rain fell on the roof and it is soft to hear at night", "en", "b"),
        (10, "", "en", "b"),                                      # tokens (empty)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


RULES = CurationRules(
    lang="en", min_tokens=5, max_tokens=100, max_dup3=0.4, max_top2=0.5, cap_per_source=2
)


def _py_curate(rows, rules):
    seen, out = {}, []
    for r in sorted(rows, key=lambda x: x[0]):
        doc_id, text, lang, source = r
        if text in seen:
            continue
        seen[text] = doc_id
        toks = py_tokenize(text)
        if lang != rules.lang:
            continue
        if not (rules.min_tokens <= len(toks) <= rules.max_tokens):
            continue
        tri = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        bi = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        dup3 = (len(tri) - len(set(tri))) / len(tri) if tri else 0.0
        from collections import Counter

        top2 = max(Counter(bi).values()) / len(bi) if bi else 0.0
        if dup3 > rules.max_dup3 or top2 > rules.max_top2:
            continue
        out.append((doc_id, source))
    capped, per = [], {}
    for doc_id, source in out:  # already doc_id ASC
        per[source] = per.get(source, 0) + 1
        if per[source] <= rules.cap_per_source:
            capped.append(doc_id)
    return capped


def test_curate_matches_python_twin(spark, docs):
    rows = [tuple(r) for r in docs.collect()]
    want = sorted(_py_curate(rows, RULES))
    got = sorted(r["doc_id"] for r in curate(docs, RULES).collect())
    assert got == want
    # with the quota disabled, doc 9 (3rd of source b) comes back
    no_cap = CurationRules(**{**RULES.__dict__, "cap_per_source": None})
    got2 = sorted(r["doc_id"] for r in curate(docs, no_cap).collect())
    assert set(got2) >= set(got) and len(got2) > len(got)


def test_curation_report_reconciles(spark, docs):
    rep = {r["stage"]: r["n"] for r in curation_report(docs, RULES).collect()}
    assert rep["input"] == 10
    drops = sum(v for k, v in rep.items() if k.startswith("drop_"))
    assert rep["input"] == rep["kept"] + drops
    # sequential attribution: doc 2 counts ONLY against dedup
    assert rep["drop_dedup"] == 1
    assert rep["drop_lang"] == 1          # doc 3
    assert rep["drop_tokens"] == 2        # docs 4, 10
    assert rep["drop_repetition"] == 1    # doc 5
    assert rep["drop_cap"] == 2           # docs 8, 9 (3rd/4th of source b)
    assert rep["kept"] == len(_py_curate([tuple(r) for r in docs.collect()], RULES))


def test_curate_on_corpus(spark):
    # smoke on the synthetic corpus: rules keep a nonempty strict subset
    from lsearch_spark.corpus import pages_df

    pages = pages_df(spark, 80).withColumn("source", F.lit("s"))
    rules = CurationRules(min_tokens=3, max_dup3=0.9, cap_per_source=50)
    kept = curate(pages, rules)
    n, total = kept.count(), pages.count()
    assert 0 < n <= 50
    rep = {r["stage"]: r["n"] for r in curation_report(pages, rules).collect()}
    assert rep["input"] == total and rep["kept"] == n
