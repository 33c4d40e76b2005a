"""Deduplication operators for training-data pipelines.

- exact: md5-fingerprint hash-groupBy (map-side partial agg; no skew —
  fingerprints are uniform).
- n-gram Jaccard: shingle sets + array_intersect/union, JVM-side.
- MinHash + LSH: nested-transform JVM expression for signatures (one
  pass over tokens per hash seed, zero Python); banding -> bucket
  self-join -> exact-Jaccard verification. This is the 100 TB path:
  candidate generation is an equi-join on (band, band_hash), never an
  all-pairs product.
- SimHash: 64-bit signature as a single Catalyst expression (per-bit
  weighted sums packed with shiftleft/bitwise-or).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col
from .util import bind


# ------------------------------------------------------------------- exact
def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: (fingerprint, keep_id=min id, n_dups)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def drop_exact_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of every exact-duplicate group."""
    keep = exact_dup_groups(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


# ----------------------------------------------------------------- shingles
def ngram_set(text: Column | str = "text", n: int = 3) -> Column:
    """Distinct word n-grams of the normalized token stream (JVM-side).
    The token array is BOUND once (util.bind): referencing the
    tokenization from inside the gram lambda would re-run it per gram
    — O(len^2) per doc, the difference between seconds and never at
    600k docs."""
    return bind(
        tokens_col(text),
        lambda ts: F.when(
            F.size(ts) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(ts) - F.lit(n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
                )
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0)).cast("double")


def consecutive_jaccard(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2) -> DataFrame:
    """Jaccard of each doc vs (id+1) — a cheap SQL-oracle-checkable probe
    of the shingle+jaccard kernel."""
    g = df.select(F.col(id_col).alias("a_id"), ngram_set(text_col, n).alias("a_g"))
    h = df.select((F.col(id_col) - 1).alias("a_id"), ngram_set(text_col, n).alias("b_g"), F.col(id_col).alias("b_id"))
    return g.join(h, "a_id").select("a_id", "b_id", jaccard(F.col("a_g"), F.col("b_g")).alias("jaccard"))


# ------------------------------------------------------------------ minhash
def minhash_signature(text: Column | str = "text", num_hashes: int = 64, n: int = 3) -> Column:
    """array<long> of length num_hashes: min over shingles of
    xxhash64(seed, shingle). Single nested-transform expression —
    one JVM pass, no Python. Empty shingle set -> nulls. The gram set
    is BOUND once (util.bind): referencing it from the per-seed lambda
    would rebuild the shingles num_hashes times per doc."""
    return bind(
        ngram_set(text, n),
        lambda gs: F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda s: F.array_min(F.transform(gs, lambda g: F.xxhash64(s, g))),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    storage_level: str = "MEMORY_AND_DISK",
) -> DataFrame:
    """Near-duplicate pairs (a_id < b_id, exact jaccard >= threshold).

    rows_per_band = num_hashes/bands; candidates = docs sharing >=1 band
    hash (equi-join on (band, hash) — shuffle on uniform keys, scales);
    then exact n-gram Jaccard verification on candidates only.

    max_bucket caps the self-join's per-bucket size — THE 100 TB guard:
    a degenerate band hash (boilerplate/empty-ish docs) otherwise makes
    one bucket quadratic. Capped buckets are dropped before the join
    (docs that similar share many bands; at web scale set ~1000 and
    route the dropped buckets to exact dedup instead).

    storage_level controls how the shared grams+signatures relation is
    persisted between its 3 uses (banding + both sides of the verify
    join). The default spills per-partition when memory is short; at
    100 TB pass "DISK_ONLY" (or persist a scratch table yourself and
    call this on that) so executor memory holds shuffle state, not a
    corpus-sized cache competing with it.
    """
    from pyspark import StorageLevel

    r = num_hashes // bands
    base = (
        df.select(
            F.col(id_col).alias("id"),
            ngram_set(text_col, n).alias("grams"),
            minhash_signature(text_col, num_hashes, n).alias("sig"),
        )
        .filter(F.size("grams") > 0)
        .persist(getattr(StorageLevel, storage_level))
    )

    banded = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.concat_ws(",", F.transform(F.slice("sig", b * r + 1, r), lambda x: x.cast("string")))),
            )
        ).alias("band", "band_hash"),
    )
    if max_bucket is not None:
        small = (
            banded.groupBy("band", "band_hash")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("band", "band_hash")
        )
        banded = banded.join(small, ["band", "band_hash"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_hash") == F.col("b.band_hash")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    ga = base.select(F.col("id").alias("a_id"), F.col("grams").alias("a_g"))
    gb = base.select(F.col("id").alias("b_id"), F.col("grams").alias("b_g"))
    return (
        cand.join(ga, "a_id")
        .join(gb, "b_id")
        .select("a_id", "b_id", jaccard(F.col("a_g"), F.col("b_g")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def find_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    storage_level: str = "MEMORY_AND_DISK",
    broadcast_max_ids: int = 4_000_000,
) -> DataFrame:
    """Train/eval DECONTAMINATION: corpus docs whose exact n-gram
    Jaccard with an eval probe >= threshold. Returns DataFrame(doc_id,
    probe_id, jaccard).

    Cross-table twin of minhash_lsh_pairs: both sides get the same
    grams+signature relation, but candidates come from an equi-join of
    the CORPUS banded relation against the PROBES banded relation — the
    probes side (an eval set: thousands of rows, not billions) is
    broadcast, so the corpus is scanned once and there is NO self-join.
    Identical texts share every band, so exact contamination (jaccard 1)
    is found with certainty; 0.8+ pairs at the default 64/16 banding are
    missed with probability (1 - s^4)^16 < 3e-4.

    The candidate count is bounded by probes x their band-bucket sizes,
    NOT by the probe count alone: a degenerate band hash (boilerplate /
    near-empty docs — the same failure minhash_lsh_pairs guards with
    max_bucket) can match one probe band against O(corpus) docs.
    max_bucket drops corpus-side band buckets larger than the cap
    before the probe join (recall note: docs in a capped bucket are that
    similar to each other — route them to exact dedup; at web scale set
    ~10_000). Independently, the verify re-scan's candidate-id semi-join
    only BROADCASTS when the materialized candidate-id count is under
    broadcast_max_ids (one count over the already-persisted candidates),
    else it degrades to a shuffle semi-join — the broadcast can never
    blow driver/executor memory whatever the skew.

    storage_level: how the candidate relation is persisted between its
    two consumers (the verify join's both sides). NOTE (ADVICE r7): this
    function is EAGER — the broadcast gate's count() executes the full
    corpus banding pass at call time and leaves the candidate relation
    persisted for the verify join. The persisted handle rides on the
    returned DataFrame as `._lsearch_persisted`: long-lived sessions
    that call this repeatedly should `out._lsearch_persisted.unpersist()`
    once the result is consumed (or spark.catalog.clearCache())."""
    def _base(df, idc, txc, idname):
        return df.select(
            F.col(idc).alias(idname),
            ngram_set(txc, n).alias(f"{idname}_g"),
            minhash_signature(txc, num_hashes, n).alias("sig"),
        ).filter(F.size(f"{idname}_g") > 0)

    r = num_hashes // bands

    def _banded(base, idname):
        return base.select(
            idname,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.xxhash64(
                        F.concat_ws(",", F.transform(F.slice("sig", b * r + 1, r), lambda x: x.cast("string")))
                    ),
                )
            ).alias("band", "band_hash"),
        )

    cbase = _base(corpus, id_col, text_col, "doc_id")
    pbase = _base(probes, probe_id_col, probe_text_col, "probe_id")
    # candidates persist because they feed two consumers below; without
    # it the whole corpus-wide grams+minhash pass above would re-run for
    # the verify join (measured: the verify side re-scanned 600k docs'
    # n-grams for ~500 candidates — the banding pass ran twice)
    from pyspark import StorageLevel

    cbanded = _banded(cbase, "doc_id")
    if max_bucket is not None:
        # corpus-side degenerate-bucket guard (see docstring): one hash
        # agg on uniform (band, hash) keys, AQE-coalesced — same shape
        # as minhash_lsh_pairs's cap
        small = (
            cbanded.groupBy("band", "band_hash")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("band", "band_hash")
        )
        cbanded = cbanded.join(small, ["band", "band_hash"], "left_semi")
    cand = (
        cbanded
        .join(F.broadcast(_banded(pbase, "probe_id")), ["band", "band_hash"])
        .select("doc_id", "probe_id")
        .distinct()
        .persist(getattr(StorageLevel, storage_level))
    )
    # verify-side grams come from a RAW re-scan semi-joined to the
    # candidate ids — n-grams are recomputed for |candidates| docs only,
    # never a second corpus-wide pass; the re-scan reads just (id, text).
    # The semi-join broadcasts only when the (now materialized) id count
    # provably fits; a skew-blown candidate set shuffles instead.
    cand_ids = cand.select("doc_id").distinct()
    n_cand = cand.count()  # materializes the persist; driver-side gate
    if n_cand <= broadcast_max_ids:
        cand_ids = F.broadcast(cand_ids)
    cgrams = (
        corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", ngram_set("_t", n).alias("doc_id_g"))
    )
    out = (
        cand.join(cgrams, "doc_id")
        .join(F.broadcast(pbase.select("probe_id", "probe_id_g")), "probe_id")
        .select(
            "doc_id",
            "probe_id",
            jaccard(F.col("doc_id_g"), F.col("probe_id_g")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    out._lsearch_persisted = cand  # unpersist handle (see docstring)
    return out


# ------------------------------------------------------------------ simhash
def simhash64(text: Column | str = "text") -> Column:
    """64-bit SimHash of the token stream (tf-weighted), single-pass:
    ONE aggregate over the per-token hashes accumulates all 64 bit
    counters (zip_with over a length-64 array), then bit_j is set iff
    2*count_j > n_tokens — identical signatures to a per-bit +/-1 vote.
    Each token is hashed once (round 1 ran 64 separate aggregate passes,
    re-hashing every token per bit: measured 3.3x slower warm, with a
    64x larger codegen tree). Still zero Python in the hot path."""
    def bits_of(h: Column) -> Column:
        # call_function: the SQL shiftrightunsigned accepts a column shift
        # amount (the classic pyspark wrapper is literal-int only)
        return F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: F.call_function("shiftrightunsigned", h, j).bitwiseAND(F.lit(1)).cast("long"),
        )

    def _sig(ts: Column) -> Column:
        # ts is a BOUND lambda variable (util.bind): the bit-vote lambda
        # below references n = size(ts) per element, which unbound would
        # re-tokenize the text 64 times per row
        hashes = F.transform(ts, lambda t: F.xxhash64(t))
        zeros = F.array_repeat(F.lit(0).cast("long"), 64)
        counts = F.aggregate(hashes, zeros, lambda acc, h: F.zip_with(acc, bits_of(h), lambda a, b: a + b))
        n = F.size(ts)
        return F.aggregate(
            F.zip_with(
                counts,
                F.sequence(F.lit(0), F.lit(63)),
                lambda c, j: F.when(c * 2 > n, F.call_function("shiftleft", F.lit(1).cast("long"), j)).otherwise(
                    F.lit(0).cast("long")
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc.bitwiseOR(x),
        )

    return bind(tokens_col(text), _sig)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = None,
    storage_level: str = "MEMORY_AND_DISK_DESER",
) -> DataFrame:
    """Near-dup pairs by SimHash. Candidates via 4x16-bit band buckets
    (any pair within hamming<=3 of 64 bits shares at least one exact
    16-bit quarter — pigeonhole), then exact hamming verify.

    max_bucket caps a quarter-bucket's size before the self-join — same
    quadratic-blowup guard as minhash_lsh_pairs.max_bucket.

    storage_level persists the signatures relation between its two uses
    (quarter explode feeds both sides of the self-join) — same knob and
    rationale as minhash_lsh_pairs.storage_level; the default matches
    df.cache(), at 100 TB pass "DISK_ONLY" so executor memory holds
    shuffle state rather than a corpus-sized cache."""
    from pyspark import StorageLevel

    sigs = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sig")).persist(
        getattr(StorageLevel, storage_level)
    )
    quarters = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(*[F.shiftrightunsigned(F.col("sig"), 16 * q).bitwiseAND(F.lit(0xFFFF)) for q in range(4)])
        ).alias("q", "qval"),
    )
    if max_bucket is not None:
        small = (
            quarters.groupBy("q", "qval")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("q", "qval")
        )
        quarters = quarters.join(small, ["q", "qval"], "left_semi")
    a, b = quarters.alias("a"), quarters.alias("b")
    cand = (
        a.join(b, (F.col("a.q") == F.col("b.q")) & (F.col("a.qval") == F.col("b.qval")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"), F.col("a.sig").alias("a_sig"), F.col("b.sig").alias("b_sig"))
        .distinct()
    )
    return cand.select("a_id", "b_id", hamming64(F.col("a_sig"), F.col("b_sig")).alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
