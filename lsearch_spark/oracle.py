"""Pure-Python oracle: reference semantics + BM25 ground truth.

Reimplements, straight from the reference:
  - Is/Not/Has/Hasnt (search.rs:199-265): boolean via score <1.0 cut
  - More (search.rs:267-283): 1 + count of non-overlapping occurrences
  - case-insensitive runs: ASCII-lowercase content AND target (cli.rs:381-397)
  - run conjunction: scorers applied in order, first <1.0 aborts row;
    run score = sum of scorer outputs (cli.rs:391-412)
  - cascade: each run consumes prior survivors, score reset (cli.rs:465-500)
  - sort: score desc (cli.rs:495-496); new-engine tie-break doc_id asc

plus the graft's BM25 (k1=1.2, b=0.75, Lucene idf) exhaustive top-k that
the Spark engine must reproduce rank-identically.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from . import B, K1
from .tokenize import ascii_lower, py_tokenize


# ------------------------------------------------------- lsearch scalar ops
def score_is(content: str, target: str) -> float:
    return 1.0 if content == target else 0.0


def score_not(content: str, target: str) -> float:
    return 1.0 if content != target else 0.0


def score_has(content: str, target: str) -> float:
    return 1.0 if target in content else 0.0


def score_hasnt(content: str, target: str) -> float:
    return 1.0 if target not in content else 0.0


def score_more(content: str, target: str) -> float:
    """1 + non-overlapping occurrence count (str::matches semantics)."""
    if not target:
        return 1.0  # Rust matches("") is infinite; reference would hang — define as 1
    return 1.0 + content.count(target)


SCORERS = {"is": score_is, "not": score_not, "has": score_has, "hasnt": score_hasnt, "more": score_more}


def run_scorer(content: str, ops: list[tuple[str, str]], insensitive: bool) -> float | None:
    """One lsearch run over one record: None = filtered out, else score."""
    c = ascii_lower(content) if insensitive else content
    total = 0.0
    for op, target in ops:
        t = ascii_lower(target) if insensitive else target
        s = SCORERS[op](c, t)
        if s < 1.0:
            return None
        total += s
    return total


def cascade(records: list[tuple[int, dict[str, str]]], runs: list[dict]) -> list[tuple[float, int]]:
    """records: (doc_id, {loader_name: content}); runs: [{loader, ops,
    insensitive}]. Returns (score, doc_id) sorted score desc, doc_id asc."""
    survivors = [(1.0, rid, rec) for rid, rec in records]
    for run in runs:
        nxt = []
        for _, rid, rec in survivors:
            s = run_scorer(rec[run["loader"]], run["ops"], run["insensitive"])
            if s is not None:
                nxt.append((s, rid, rec))
        survivors = nxt
    return sorted(((s, rid) for s, rid, _ in survivors), key=lambda x: (-x[0], x[1]))


# ------------------------------------------------------------------ BM25
@dataclass
class PyIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    doc_len: dict[int, int] = field(default_factory=dict)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: tf}
    positions: dict[str, dict[int, list[int]]] = field(default_factory=dict)


def build_index(docs: list[tuple[int, str]]) -> PyIndex:
    idx = PyIndex()
    total = 0
    for doc_id, text in docs:
        toks = py_tokenize(text)
        idx.doc_len[doc_id] = len(toks)
        total += len(toks)
        for pos, t in enumerate(toks):
            idx.postings.setdefault(t, {}).setdefault(doc_id, 0)
            idx.postings[t][doc_id] += 1
            idx.positions.setdefault(t, {}).setdefault(doc_id, []).append(pos)
    idx.n_docs = len(docs)
    idx.avgdl = (total / idx.n_docs) if idx.n_docs else 0.0
    return idx


def idf(n_docs: int, df: int) -> float:
    """Lucene-style BM25 idf (always > 0)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf: int, dl: int, df: int, n_docs: int, avgdl: float) -> float:
    return idf(n_docs, df) * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / max(avgdl, 1e-9)))


def parse_query(query: str) -> tuple[list[str], list[str], list[str]]:
    """'-term' = exclusion (reference Hasnt); '~term' = negative-weight
    scoring (an honest implementation of the reference's declared-but-
    never-implemented `less` scorer, cli.yaml:44-49 — it subtracts the
    term's BM25 contribution instead of being silently ignored). Terms
    normalized via the tokenizer; duplicates dropped (order-preserving)."""
    pos, neg, less = [], [], []
    for raw in query.split():
        bucket = neg if raw.startswith("-") else less if raw.startswith("~") else pos
        for t in py_tokenize(raw.lstrip("-~")):
            if t not in bucket:
                bucket.append(t)
    return pos, neg, less


def bm25_topk(idx: PyIndex, query: str, k: int = 10, mode: str = "or") -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k; returns [(doc_id, score)] with tie-break
    (score desc, doc_id asc). mode='and' keeps only docs with all
    positive terms. '~less' terms subtract their BM25 contribution from
    docs already matched by positive terms (they never add candidates)."""
    pos, neg, less = parse_query(query)
    scores: dict[int, float] = {}
    hits: dict[int, int] = {}
    for t in pos:
        plist = idx.postings.get(t)
        if not plist:
            continue
        df = len(plist)
        for doc_id, tf in plist.items():
            s = bm25_term_score(tf, idx.doc_len[doc_id], df, idx.n_docs, idx.avgdl)
            scores[doc_id] = scores.get(doc_id, 0.0) + s
            hits[doc_id] = hits.get(doc_id, 0) + 1
    if mode == "and":
        scores = {d: s for d, s in scores.items() if hits[d] == len(pos)}
    for t in less:
        plist = idx.postings.get(t)
        if not plist:
            continue
        df = len(plist)
        for doc_id, tf in plist.items():
            if doc_id in scores:
                scores[doc_id] -= bm25_term_score(tf, idx.doc_len[doc_id], df, idx.n_docs, idx.avgdl)
    for t in neg:
        for doc_id in idx.postings.get(t, ()):  # exclusion
            scores.pop(doc_id, None)
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


def phrase_topk(
    idx: PyIndex, phrase: str, k: int = 10, slop: int = 0
) -> list[tuple[int, float]]:
    """Exact-phrase top-k: docs containing the tokens consecutively;
    tf = number of phrase occurrences (overlapping counted); scored with
    BM25 using df = number of phrase-matching docs. slop > 0 allows up
    to slop intervening tokens between consecutive phrase terms
    (ordered proximity; tf = matched final-term positions)."""
    terms = py_tokenize(phrase)
    if not terms:
        return []
    matches: dict[int, int] = {}
    first = idx.positions.get(terms[0], {})
    for doc_id, pos0 in first.items():
        cand = set(pos0)
        for i, t in enumerate(terms[1:], start=1):
            nxt = idx.positions.get(t, {}).get(doc_id)
            if not nxt:
                cand = set()
                break
            cand = {p for p in nxt if any(1 <= p - c <= slop + 1 for c in cand)}
        if cand:
            matches[doc_id] = len(cand)
    df = len(matches)
    scored = [
        (d, bm25_term_score(tf, idx.doc_len[d], df, idx.n_docs, idx.avgdl))
        for d, tf in matches.items()
    ]
    return sorted(scored, key=lambda x: (-x[1], x[0]))[:k]
