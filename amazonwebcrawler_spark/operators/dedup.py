"""Deduplication family for training-data pipelines over ``documents``.

Five dedup strategies, each chosen for a different scale/recall trade-off:

* exact          — hash-groupBy on md5(normalized text). One shuffle.
* n-gram Jaccard — shingle sets + array_intersect/union. Exact similarity,
                   quadratic within blocks; use after LSH blocking.
* MinHash + LSH  — signature → bands → bucket join. The 100 TB path: the
                   only shuffle is by (band, band_hash); candidate pairs are
                   verified with exact Jaccard afterwards, so false positives
                   cost work but never correctness.
* SimHash        — 64-bit near-dup fingerprint via token-hash bit voting;
                   pure column math (explode → md5 → bit-vote aggregate),
                   pigeonhole chunk blocking, hamming join.
* embedding cosine — near-dup by vector similarity (see similarity.py).

Cross-engine determinism: every base hash here is **md5** (not
xxhash64/murmur) because DuckDB computes identical md5 strings; MinHash
derives its k values from ONE md5 per shingle via affine permutations in
int64 (see ``minhash_perm_consts``) — the oracle SQL in ``__spark_entry__``
re-derives signatures and LSH buckets exactly, making even the approximate
path value-checkable.

Scale notes: signatures are computed in one projection (no UDF); LSH
explodes each doc into ``n_bands`` rows — shuffle volume is
``n_bands × docs``, tunable; band-bucket self-join uses a groupBy-collect
within buckets rather than a join, so a hot bucket degrades to a local
quadratic, bounded by ``max_bucket`` guard.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve against module globals

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from amazonwebcrawler_spark.functions.text import bind_once, normalize_text


# ----------------------------------------------------------------- shingles
def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text (sorted for
    determinism). Empty/short docs → empty array.

    The token array is bound ONCE (:func:`bind_once`) before the per-index
    slice lambda — capturing the split(normalize) expression directly in
    the lambda would re-run the regex normalization per shingle index
    (lambda-bearing expressions are excluded from Catalyst CSE), O(n²)
    regex work per document."""
    toks = F.split(normalize_text(text), " ")

    def grams_of(t: Column) -> Column:
        # guard: sequence(0, negative) would generate a DESCENDING range
        grams = F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.array_join(F.slice(t, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.array_sort(F.array_distinct(grams))

    return bind_once(toks, grams_of)


def shingle_rows(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles as ROWS (_id, _s) — the relational form.

    Same shingle set as ``shingles()`` but built with explode + get()
    (whole-stage codegen) instead of higher-order transform/slice/array_join
    (CodegenFallback, interpreted per element — measured ~10× slower on the
    documents table). This is the shape the MinHash pipeline and its DuckDB
    twin both use.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks")).filter(
        F.size("_toks") >= n
    )
    pos = base.select(
        "_id", "_toks", F.explode(F.sequence(F.lit(0), F.size("_toks") - n)).alias("_i")
    )
    gram = F.concat_ws(" ", *[F.get(F.col("_toks"), F.col("_i") + j) for j in range(n)])
    return pos.select("_id", gram.alias("_s")).distinct()


def jaccard_micro(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string arrays (already distinct) as
    an exact micro-unit BIGINT: ``(|∩|·1e6) DIV |∪|`` — pure integer
    arithmetic, so the value hashes identically on every engine (the
    DOUBLE ratio was one engine-rounding quirk away from a driver hash
    flip). For any threshold with integral micro (0.3, 0.5, 0.8 …),
    ``jaccard_micro >= round(t·1e6)`` is EXACTLY equivalent to the real
    ``j >= t``: j ≥ t ⇒ j·1e6 ≥ t_micro ⇒ floor ≥ t_micro, and j < t ⇒
    floor ≤ t_micro − 1."""
    inter = F.size(F.array_intersect(a, b)).cast("long")
    union = F.size(F.array_union(a, b)).cast("long")
    num = inter * F.lit(1_000_000).cast("long")
    # exact floor division without DIV-on-expr plumbing: subtract the
    # remainder first, then the float division is exact (numerator is an
    # exact multiple of the divisor, both well under 2^53)
    return F.when(union > 0, ((num - F.pmod(num, union)) / union).cast("long")).otherwise(
        F.lit(0).cast("long")
    )


# -------------------------------------------------------------- exact dedup
def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id representative of each exact (normalized) duplicate
    group. One hash-aggregate shuffle on the digest — the cheapest dedup."""
    return (
        df.withColumn("_digest", F.md5(normalize_text(F.col(text_col))))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("_digest")
    )


# ------------------------------------------------------------------ minhash
#: MinHash permutation modulus — 2^31-1 (Mersenne prime). Each shingle is
#: md5-hashed ONCE into a 31-bit int h; the k signature values are affine
#: permutations (a_j*h + b_j) mod P (standard universal hashing) instead of
#: k separate md5 calls — measured ~16× less hashing per shingle. All
#: arithmetic stays < 2^62, exactly reproducible in int64 on both engines.
MINHASH_P = 2_147_483_647


def minhash_perm_consts(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) affine-permutation constants, shared verbatim
    by the Spark pipeline and the DuckDB oracle twin (generated into its SQL).
    a_j ≠ 0 mod P because P is prime and the base is not a multiple of P."""
    return [
        ((2654435761 * (j + 1)) % MINHASH_P, (2246822519 * (j + 1) + 3266489917) % MINHASH_P)
        for j in range(k)
    ]


def shingle_hash31(s: Column) -> Column:
    """31-bit integer hash of a shingle: first 8 hex chars of md5, masked to
    31 bits (so a_j*h fits int64). Same expression exists in DuckDB as
    CAST(('0x' || substr(md5(s),1,8)) AS UBIGINT) & 2147483647."""
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long").bitwiseAND(F.lit(0x7FFFFFFF))
    )


def minhash_signature(text: Column, k: int = 16, n: int = 3) -> Column:
    """k-element MinHash signature as array<bigint>: min over shingles of the
    j-th affine permutation of the shingle's 31-bit md5-derived hash."""
    perms = minhash_perm_consts(k)

    def perm_min(hashes: Column, a: int, b: int) -> Column:
        # a fresh function scope per permutation: a default-arg lambda
        # (lambda h, a=a, b=b) would make pyspark emit a THREE-parameter
        # lambdafunction (it counts defaulted params), which transform
        # rejects at analysis time
        return F.array_min(F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)))

    # bind the hashed-shingle array once: each of the k permutation mins
    # iterates the SAME array, and a direct capture would rebuild the full
    # shingle+md5 tree k times (no CSE across lambda-bearing expressions)
    return bind_once(
        F.transform(shingles(text, n), shingle_hash31),
        lambda hashes: F.array(*[perm_min(hashes, a, b) for (a, b) in perms]),
    )


def lsh_bands(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """Signature (array<bigint>) → array<struct<band:int, bh:string>>."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(sig, b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        "|",
                    )
                ).alias("bh"),
            )
            for b in range(n_bands)
        ]
    )


def _lsh_candidates(sh, k: int, n_bands: int, rows_per_band: int, max_bucket: int):
    """MinHash-band candidate pairs from shingle rows ``(_id, _s)`` —
    the banding half of :func:`minhash_lsh_pairs`, shared with
    :func:`lsh_candidate_eval` so the evaluated candidates are EXACTLY the
    pipeline's.

    Signature: hash each shingle ONCE → k affine-permutation partial-min
    aggregates (map-side combine). Mirrors the DuckDB oracle SQL exactly
    (GROUP BY doc_id, j, MIN((a_j*h + b_j) % P)). Band shuffle carries
    ONLY (id, band, bh) — shuffle volume = n_bands×docs; buckets above
    ``max_bucket`` drop (the degenerate all-same-bucket guard); pair
    generation is local inside each surviving bucket."""
    perms = minhash_perm_consts(k)
    sig = (
        sh.select("_id", shingle_hash31(F.col("_s")).alias("_h"))
        .groupBy("_id")
        .agg(
            F.array(
                *[
                    F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"_m{j}")
                    for j, (a, b) in enumerate(perms)
                ]
            ).alias("_sig")
        )
    )
    banded = sig.withColumn("_bands", lsh_bands(F.col("_sig"), n_bands, rows_per_band))
    exploded = banded.select("_id", F.explode("_bands").alias("b")).select(
        "_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    buckets = (
        exploded.groupBy("band", "bh")
        .agg(F.collect_list("_id").alias("members"))
        .filter((F.size("members") >= 2) & (F.size("members") <= max_bucket))
    )
    return (
        buckets.select(F.explode("members").alias("id_a"), F.col("members"))
        .select("id_a", F.explode("members").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact Jaccard.

    Plan shape: project signature (no shuffle) → explode bands (n_bands×
    rows) → groupBy (band, bh) collecting [id, shingles] → local pair
    generation inside each bucket → exact-Jaccard filter ≥ threshold →
    distinct pairs. Buckets above ``max_bucket`` are dropped (logged
    upstream) — the standard guard against degenerate all-same buckets.
    Returns (id_a, id_b, jaccard_micro) with id_a < id_b —
    ``jaccard_micro`` is the exact integer ``(|∩|·1e6) DIV |∪|`` (see
    :func:`jaccard_micro`); the threshold filter compares in micro space,
    exactly equivalent for integral-micro thresholds.
    """
    threshold_micro = int(round(threshold * 1_000_000))
    rows_per_band = k // n_bands
    # a documents table often arrives as ONE small parquet file = one input
    # partition; the shingle/signature work is the CPU-heavy step, so spread
    # it across the cluster first (tiny shuffle of (id, text) rows —
    # measured 25 s single-task vs <2 s parallel at sf0.1)
    n_part = df.sparkSession.sparkContext.defaultParallelism
    docs = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .repartition(n_part, "_id")
    )
    # relational shingle rows — persisted: reused by the signature, the
    # intersection counts, and the sizes (cheap: (id, short-string) rows)
    sh = shingle_rows(docs, "_t", "_id", shingle_n).persist()

    cand = _lsh_candidates(sh, k, n_bands, rows_per_band, max_bucket)
    # exact-Jaccard verify, relationally: |A∩B| by joining the candidate set
    # (small — broadcast) against the shingle rows twice; |A|,|B| from a
    # per-doc count. Pairs with zero intersection fall out of the inner join
    # — correct for any threshold > 0. (r6 note: a broadcast-semi
    # candidate-doc prefilter of the verify exchanges was measured and
    # REVERTED — at every tested density the extra materialization +
    # probe passes cost more than the shrunken exchange saved; see
    # OPTIMIZATION_r06.md.)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    sh_a = sh.select(F.col("_id").alias("id_a"), "_s")
    sh_b = sh.select(F.col("_id").alias("id_b"), "_s")
    inter = (
        sh_a.join(F.broadcast(cand), "id_a")
        .join(sh_b, ["id_b", "_s"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_ni"))
    )
    pairs = (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr("(_ni * 1000000L) DIV (_na + _nb - _ni)").alias("jaccard_micro"),
        )
        .filter(F.col("jaccard_micro") >= threshold_micro)
    )
    # pairs are tiny (candidate near-dups); materialize them eagerly so the
    # shingle cache can be released HERE instead of leaking per call (the
    # checkpoint also truncates the 4-way reuse of `sh` out of the lineage,
    # so downstream consumers never recompute shingles)
    pairs = pairs.localCheckpoint(eager=True)
    sh.unpersist()
    return pairs


def lsh_candidate_eval(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Banding quality evaluation — the dedup twin of ann_recall's
    "measure, don't guess" discipline: LSH CANDIDATE pairs (post-banding,
    PRE-verify — precision of the verified output is 1 by construction,
    so the banding is the only thing worth measuring) against the exact
    ground truth of all pairs with exact Jaccard ≥ threshold.

    Returns ONE row ``(n_true, n_cand, n_hit, precision_micro,
    recall_micro)`` — exact integer ratios. The theoretical recall of
    b bands × r rows at similarity s is ``1−(1−s^r)^b``; this measures
    the real thing on the real corpus instead.

    Scale shape: candidates are :func:`_lsh_candidates` (exactly the
    pipeline's); ground truth joins the shingle table with itself on the
    shingle key (any pair with J ≥ t > 0 shares a shingle, so the join is
    EXACT) — that self-join is quadratic in per-shingle document
    frequency, which is precisely why evaluation runs on a bounded sample
    of the corpus in production (the ann_recall discipline), while the
    banding path it grades stays the linear production shape. The three
    result counts are bounded 1-row aggregates."""
    threshold_micro = int(round(threshold * 1_000_000))
    rows_per_band = k // n_bands
    n_part = df.sparkSession.sparkContext.defaultParallelism
    docs = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .repartition(n_part, "_id")
    )
    sh = shingle_rows(docs, "_t", "_id", shingle_n).persist()
    # both pair slivers feed TWO consumers each (their own count + the hit
    # join) — checkpoint them once so the banding chain and the exact-truth
    # chain execute once instead of per consumer (r6, guide §1.2)
    cand = _lsh_candidates(sh, k, n_bands, rows_per_band, max_bucket).localCheckpoint(
        eager=True
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    sh_a = sh.select(F.col("_id").alias("id_a"), "_s")
    sh_b = sh.select(F.col("_id").alias("id_b"), "_s")
    inter_all = (
        sh_a.join(sh_b, "_s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_ni"))
    )
    truth = (
        inter_all.join(
            sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a"
        )
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .filter(
            F.expr("(_ni * 1000000L) DIV (_na + _nb - _ni)") >= threshold_micro
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    hit = truth.join(cand, ["id_a", "id_b"])
    n_true = truth.agg(F.count("*").alias("n_true"))
    n_cand = cand.agg(F.count("*").alias("n_cand"))
    n_hit = hit.agg(F.count("*").alias("n_hit"))
    out = (
        n_true.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_true",
            "n_cand",
            "n_hit",
            F.expr(
                "CASE WHEN n_cand > 0 THEN (n_hit * 1000000L) DIV n_cand ELSE 0 END"
            ).alias("precision_micro"),
            F.expr(
                "CASE WHEN n_true > 0 THEN (n_hit * 1000000L) DIV n_true ELSE 0 END"
            ).alias("recall_micro"),
        )
        .localCheckpoint(eager=True)
    )
    sh.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard pairs within blocks (e.g. same source/lang).

    Blocked self-join — the exactness oracle for the MinHash path. At scale
    only viable with tight blocks; that is the point of the block_col.
    Emits ``jaccard_micro`` (exact integer — see :func:`jaccard_micro`).
    """
    threshold_micro = int(round(threshold * 1_000_000))
    keyed = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), shingle_n).alias("_sh"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, (F.col("a._blk") == F.col("b._blk")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            jaccard_micro(F.col("a._sh"), F.col("b._sh")).alias("jaccard_micro"),
        )
        .filter(F.col("jaccard_micro") >= threshold_micro)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    max_df: int = 10,
) -> DataFrame:
    """One-sided shingle containment pairs (Broder 1997, "On the
    resemblance and containment of documents"):

        cont(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|

    The asymmetric companion to Jaccard that the symmetric measures
    structurally miss: a short document quoted inside a much longer one
    has ``cont(A in B) ≈ 1`` while ``J(A,B) ≈ |A|/|B| ≈ 0`` — below any
    usable Jaccard threshold. This is the quote / boilerplate-wrapped
    copy / superset-page detector in a training-data pipeline (keep the
    superset, drop the contained fragment — or the reverse for
    boilerplate).

    Blocking: candidate pairs share at least one *rare* shingle —
    corpus document frequency in ``[2, max_df]``. A shingle carried by
    thousands of documents generates quadratic candidates and carries no
    identity signal; bounding df bounds per-shingle fan-out at
    ``max_df²`` rows, the skew guard. Pairs that share ONLY ubiquitous
    (df > max_df) shingles are missed by construction — the documented
    post-blocking semantic (the ngram_jaccard caveat), mirrored exactly
    in the DuckDB twin. Verification is exact over ALL shared shingles
    (not just rare ones): the candidate sliver broadcasts back onto the
    full shingle table twice (the minhash_lsh_pairs verify idiom).

    Emits ``(id_a, id_b, n_inter, cont_a_micro, cont_b_micro)`` with
    ``id_a < id_b``, kept when ``greatest(cont_a, cont_b) ≥ threshold``
    — all exact integers (``(n_inter·1e6) DIV n``, the jaccard_micro
    floor-division equivalence argument), so the twin is bit-identical.
    """
    threshold_micro = int(round(threshold * 1_000_000))
    sh = shingle_rows(df, text_col, id_col, shingle_n).persist()
    # candidate pairs directly from ONE shingle-keyed aggregate (the
    # _lsh_candidates bucket idiom, r6): collect the ≤max_df member ids per
    # rare shingle and pair them locally — same pair set as the former
    # df-count + semi-join + shingle-keyed self-join, with two fewer
    # exchanges of the shingle table (guide §2.4); the df∈[2,max_df] guard
    # still bounds per-shingle fan-out at max_df².
    buckets = (
        sh.groupBy("_s")
        .agg(F.collect_list("_id").alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= max_df))
    )
    cand = (
        buckets.select(F.explode("_ids").alias("id_a"), "_ids")
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # (r6 note: a broadcast-semi candidate-doc prefilter of the verify
    # exchanges was measured here and in minhash_lsh_pairs and REVERTED —
    # the extra materialization + probe passes cost more than the
    # shrunken exchange saved at every tested density; OPTIMIZATION_r06.md.)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    sh_a = sh.select(F.col("_id").alias("id_a"), "_s")
    sh_b = sh.select(F.col("_id").alias("id_b"), "_s")
    inter = (
        sh_a.join(F.broadcast(cand), "id_a")
        .join(sh_b, ["id_b", "_s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    pairs = (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("_ni").alias("n_inter"),
            F.expr("(_ni * 1000000L) DIV _na").alias("cont_a_micro"),
            F.expr("(_ni * 1000000L) DIV _nb").alias("cont_b_micro"),
        )
        .filter(
            F.greatest("cont_a_micro", "cont_b_micro") >= F.lit(threshold_micro)
        )
    )
    # the containment sliver is tiny; eager-checkpoint it so the shingle
    # cache releases here instead of leaking per call (minhash discipline)
    pairs = pairs.localCheckpoint(eager=True)
    sh.unpersist()
    return pairs


# ------------------------------------------- connected components (groups)
def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup PAIRS → dedup GROUPS: (doc_id, group_id) where group_id is
    the minimum doc id in the connected component.

    A pair list alone doesn't dedup a corpus — A~B and B~C must collapse to
    one keep-decision for {A,B,C}. This is min-label propagation over the
    undirected pair graph: each round every node adopts the smallest label
    among itself and its neighbors; fixpoint in diameter(G) rounds.

    Scale shape: each round is one join (labels ⋈ edges on src) + one
    groupBy-min — both shuffle on the node id, so AQE can reuse the
    partitioning. Convergence is detected with a single count of changed
    labels; lineage is truncated every round via localCheckpoint (the loop
    would otherwise re-derive all prior rounds each action). Near-dup
    components are overwhelmingly tiny (pairs, triangles, short chains), so
    rounds ≈ 2-4 in practice; the O(log n) large-star/small-star variant is
    the documented upgrade path if a pathological corpus produces long
    chains at 100 TB.
    """
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    converged = False
    # LAZY per-round checkpoints + AQE coalescing scoped to the label loop
    # (the _exec.coalesced_stages rationale — the label table is the pair
    # sliver, byte-tiny): the per-round convergence probe is the forcing
    # action, so each round is one action instead of checkpoint + probe.
    try:
        with coalesced_stages(pairs.sparkSession):
            labels = (
                edges.select(F.col("src").alias("id"))
                .distinct()
                .withColumn("lbl", F.col("id"))
                .localCheckpoint(eager=False)
            )
            for _ in range(max_iter):
                # neighbor minimum: dst inherits the smallest label at any src
                prop = (
                    edges.join(labels.withColumnRenamed("id", "src"), "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min("lbl").alias("_nbr"))
                )
                new_labels = (
                    labels.join(prop, "id", "left")
                    .select("id", F.least("lbl", F.coalesce("_nbr", "lbl")).alias("lbl"),
                            (F.least("lbl", F.coalesce("_nbr", "lbl")) != F.col("lbl")).alias("_chg"))
                ).localCheckpoint(eager=False)
                changed = new_labels.filter("_chg").limit(1).count()
                labels = new_labels.drop("_chg")
                if changed == 0:
                    converged = True
                    break
    finally:
        edges.unpersist()
    if not converged:
        # partial labels are WRONG group ids — never return them silently
        # (the DuckDB twin computes the exact transitive closure and would
        # mismatch; a dedup run would split components). Long-diameter graphs
        # should use connected_components_star (O(log n) rounds) instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "component diameter exceeds max_iter; use "
            "connected_components_star for long-chain graphs"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("lbl").alias("group_id"))


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> tuple[DataFrame, int]:
    """Large-star/small-star connected components (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — converges in **O(log n)**
    rounds on ANY graph shape, vs ``connected_components``'s O(diameter):
    min-label propagation needs 10⁴ joins on a 10⁴-node chain; this needs ~20.

    Each round is two groupBy-min + join steps over the edge list:

    * **large-star(u)**: connect every strictly-larger neighbor of u to
      ``m = min(Γ(u) ∪ {u})`` — long tendrils snap toward small labels;
    * **small-star(u)**: orient edges (big → small), connect every smaller
      neighbor AND u itself to the minimum — stars flatten.

    The fixpoint is a star per component centered at its minimum id, read
    off directly as (doc_id, group_id). Convergence is detected with a
    one-job (count, bit_xor-of-hash) fingerprint of the edge set per round.

    Returns (labels, rounds). Same output contract as
    ``connected_components`` — every node appearing in ``pairs`` is
    labelled, including nodes whose only pair is a self-loop
    (``id_a == id_b``): they label themselves, matching min-label
    propagation (LSH pair lists never contain self-loops, but the contract
    holds for arbitrary input). Use this for long-chain graphs, min-label
    for the tiny near-dup components the LSH pipelines produce (2-4
    rounds, half the per-round work).
    """

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.least("_mn", "u").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        d = (
            e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        mins = d.groupBy("u").agg(F.min("v").alias("_m"))  # all v < u, so min(Γ∪{u}) = min(v)
        return (
            d.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
            .unionByName(mins.select("u", F.col("_m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    edges = (
        pairs.select(F.greatest(id_a, id_b).alias("u"), F.least(id_a, id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_fp = None
    prev_edges: DataFrame | None = None
    rounds = 0
    for rounds in range(1, max_iter + 1):
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        row = new_edges.agg(
            F.count("*").alias("n"), F.expr("bit_xor(xxhash64(u, v))").alias("x")
        ).collect()[0]
        fp = (row["n"], row["x"])
        # fingerprint match → confirm EXACT set equality (equal counts make
        # a one-sided except sufficient); runs once, at convergence only —
        # a bit_xor collision can never silently end the loop early
        if (
            fp == prev_fp
            and prev_edges is not None
            and new_edges.exceptAll(prev_edges).limit(1).count() == 0
        ):
            edges = new_edges
            break
        prev_fp, prev_edges, edges = fp, new_edges, new_edges
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # fixpoint: every edge is (node, component_min); roots label themselves
    labels = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("group_id")).unionByName(
        edges.select(F.col("v").alias("doc_id"), F.col("v").alias("group_id"))
    ).distinct()
    # nodes whose only pairs were self-loops never entered the edge list —
    # they are their own singleton component (min-label labels them too)
    verts = (
        pairs.select(F.col(id_a).alias("doc_id"))
        .unionByName(pairs.select(F.col(id_b).alias("doc_id")))
        .distinct()
    )
    labels = labels.unionByName(
        verts.join(labels, "doc_id", "left_anti").select(
            "doc_id", F.col("doc_id").alias("group_id")
        )
    )
    return labels, rounds


# ------------------------------------------------------------------ simhash
def with_simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Relational SimHash — pure column math end-to-end (whole-stage
    codegen), no Python in the hot path. Returns (_id, _fp:long) with one
    row per doc that has ≥1 token (token-less docs get no fingerprint,
    matching the Arrow kernel's None).

    Same recipe that relationalized MinHash: explode tokens (multiplicity
    preserved — every occurrence votes) → built-in ``md5`` → per-bit
    extraction → groupBy bit-vote partial sums (map-side combine; the
    shuffle carries one 65-int row per doc regardless of doc length).

    The 64-bit token hash is the first 8 md5 bytes big-endian — parsed as
    two 32-bit halves with ``conv`` (a single 64-bit parse would overflow
    signed long under ANSI for hashes ≥ 2^63); bit b < 32 comes from the low
    half, b ≥ 32 from the high. Bit-identical to both the Arrow kernel
    (``simhash64_udf``, kept as the test oracle) and the DuckDB twin, which
    draw bits from the same md5 prefix.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("_tok"),
    ).filter(F.col("_tok") != "")
    hexv = F.md5(F.col("_tok"))
    halves = toks.select(
        "_id",
        F.conv(F.substring(hexv, 1, 8), 16, 10).cast("long").alias("_hi"),
        F.conv(F.substring(hexv, 9, 8), 16, 10).cast("long").alias("_lo"),
    )

    def _bit(b: int) -> Column:
        src = F.col("_lo") if b < 32 else F.col("_hi")
        return F.shiftrightunsigned(src, b % 32).bitwiseAND(F.lit(1))

    agg = halves.groupBy("_id").agg(
        F.count("*").alias("_n"),
        *[F.sum(_bit(b)).alias(f"_s{b}") for b in range(64)],
    )
    # vote_b > 0  ⟺  sum(±1) > 0  ⟺  2·(count of 1-bits) > n_tokens;
    # OR the winning bits together (bit 63 set → negative int64, exactly the
    # kernel's int(fp.astype(np.int64)) two's complement)
    fp: Column = F.lit(0).cast("long")
    for b in range(64):
        fp = fp.bitwiseOR(
            F.when(
                F.col(f"_s{b}") * 2 > F.col("_n"),
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
        )
    return agg.select("_id", fp.alias("_fp"))


def simhash64_udf():
    """Pandas-UDF SimHash: md5-derived 64-bit token hashes, bitwise ±1 vote,
    sign → fingerprint. Arrow-batched; the bit voting is numpy over the
    whole batch's token matrix.

    NOT the production path — ``with_simhash64`` (pure column math) is.
    Kept as an independent implementation for the equality test in
    tests/test_dedup_similarity.py (two engines, one contract)."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        out: list[int | None] = []
        shifts = np.arange(64, dtype=np.uint64)
        for t in texts:
            toks = (t or "").lower().split()
            if not toks:
                out.append(None)  # token-less docs have no fingerprint
                continue
            votes = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big"))
                bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
                votes += 2 * bits - 1
            fp = np.uint64(0)
            for bpos in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(bpos)
            out.append(int(fp.astype(np.int64)))
        return pd.Series(out, dtype="Int64")

    return simhash


def hamming_chunks(n_chunks: int) -> list[tuple[int, int]]:
    """(bit_offset, width) per chunk, splitting 64 bits into ``n_chunks``
    near-equal contiguous chunks (the first ``64 % n_chunks`` chunks get the
    extra bit). Pure arithmetic, shared by the operator, its tests, and the
    golden checkers."""
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if c < extra else 0) for c in range(n_chunks)]
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    return list(zip(offsets, widths))


def _fp_chunks(keyed: DataFrame, id_col: str, fp_col: str, max_hamming: int) -> DataFrame:
    """Explode a 64-bit fingerprint column into its ``max_hamming + 1``
    pigeonhole chunks → ``(_id, _fp, c, v)`` — the blocking key shared by
    the self-join (:func:`hamming_neardup_pairs`) and the incremental
    cross-join (:func:`hamming_neardup_join`) forms."""
    # normalize names in their own projection: referencing "_fp" inside the
    # explode of the SAME select would be a lateral column alias (Spark
    # internal error when the input column isn't already named _fp)
    keyed = keyed.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"))
    return keyed.select(
        "_id",
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        # logical shift: arithmetic shiftright would smear the
                        # sign bit into the top chunk of negative fingerprints.
                        # width == 64 (t=0, one chunk = whole fingerprint) must
                        # skip the mask: (1<<64)-1 exceeds Long.MAX_VALUE and
                        # cannot be a LongType literal
                        (
                            F.shiftrightunsigned("_fp", off)
                            if width == 64
                            else F.shiftrightunsigned("_fp", off).bitwiseAND(
                                F.lit((1 << width) - 1)
                            )
                        ).alias("v"),
                    )
                    for c, (off, width) in enumerate(hamming_chunks(max_hamming + 1))
                ]
            )
        ).alias("ch"),
    ).select("_id", "_fp", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))


def hamming_neardup_pairs(
    keyed: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit fingerprint column by hamming
    distance ≤ ``max_hamming`` — the generic pigeonhole-blocked form shared
    by SimHash (text) and pHash (image) dedup.

    Blocking: ``max_hamming + 1`` near-equal-width chunks of the
    fingerprint — a pair within hamming ≤ t differs in ≤ t chunks, so with
    t+1 chunks at least one chunk matches exactly (pigeonhole) and the join
    is on (chunk_idx, chunk_value), never a full cross join. EXACT: every
    qualifying pair is found; false candidates are discarded by the
    ``bit_count(xor)`` verify, which is pure JVM column math. Shuffle
    volume is ``(t+1) × rows`` — at 10^10 images and t=4 that is one
    5×-exploded exchange on a 2-int key, the same shape as LSH banding.

    ``max_bucket`` is the skew guard for degenerate fingerprint clusters
    (e.g. millions of solid-color thumbnails sharing one pHash — a cluster
    of n identical fingerprints is n²/2 candidate pairs). When set, chunk
    buckets larger than ``max_bucket`` are dropped before the self-join —
    the same graceful degradation as ``minhash_lsh_pairs``: a pair is
    missed only if EVERY chunk the two fingerprints share lives in an
    oversized bucket, so diverse pairs are unaffected. Default ``None``
    keeps the operator EXACT (and is right whenever a quality gate runs
    first, as in ``images_io.image_pipeline`` — flat/near-black images are
    exactly what the gate removes).

    Returns (id_a, id_b, hamming) with id_a < id_b, hamming: int.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    chunks = _fp_chunks(keyed, id_col, fp_col, max_hamming)
    if max_bucket is not None:
        ok = (
            chunks.groupBy("c", "v").count()
            .filter(F.col("count") <= max_bucket).drop("count")
        )
        chunks = chunks.join(ok, ["c", "v"])  # same key as the pair join below
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.v") == F.col("b.v")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                F.col("a._fp").alias("fp_a"), F.col("b._fp").alias("fp_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int")
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(F.col("hamming") <= max_hamming)


def hamming_neardup_join(
    new: DataFrame,
    corpus: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    corpus_chunked: bool = False,
) -> DataFrame:
    """Incremental near-dup ingest: pairs between a NEW batch and the
    accumulated corpus only — never corpus×corpus, never new×new. This is
    how near-dup dedup runs at crawl time: the corpus's pigeonhole chunk
    table ``(id, fp, chunk_idx, chunk_value)`` is persistable state,
    written once and appended per wave, and each wave shuffles only
    ``(max_hamming + 1) × |new|`` chunk rows against it — the 10^10-image
    corpus is re-joined by key, not re-paired (|corpus|² never appears in
    any stage). Same EXACT pigeonhole blocking + ``bit_count`` verify as
    :func:`hamming_neardup_pairs`; ``max_bucket`` (measured on the corpus
    side, where the degenerate mass lives) degrades identically.

    Returns ``(new_id, corpus_id, hamming)`` — every corpus row within
    ``max_hamming`` of each new row; a new row with no match is novel and
    enters the corpus.

    ``corpus_chunked=True`` takes ``corpus`` as an ALREADY-exploded chunk
    table ``(_id, _fp, c, v)`` — i.e. the persisted state written by
    :func:`write_chunk_table`. Bucketed+sorted on ``(c, v)``, that table
    joins with ZERO corpus-side shuffle: only the ``(t+1) × |new|`` batch
    chunk rows exchange to the bucket layout each wave (plan-asserted in
    tests/test_dedup_similarity.py::TestBucketedChunkTable).
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    n = _fp_chunks(new, id_col, fp_col, max_hamming)
    c = corpus if corpus_chunked else _fp_chunks(corpus, id_col, fp_col, max_hamming)
    if max_bucket is not None:
        ok = (
            c.groupBy("c", "v").count()
            .filter(F.col("count") <= max_bucket).drop("count")
        )
        c = c.join(ok, ["c", "v"])
    cand = (
        n.alias("n")
        .join(c.alias("cp"), (F.col("n.c") == F.col("cp.c")) & (F.col("n.v") == F.col("cp.v")))
        .select(
            F.col("n._id").alias("new_id"), F.col("cp._id").alias("corpus_id"),
            F.col("n._fp").alias("fp_n"), F.col("cp._fp").alias("fp_c"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fp_n").bitwiseXOR(F.col("fp_c"))).cast("int")
    return cand.select("new_id", "corpus_id", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def simhash_pairs(df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    At the default t=3 the blocking is 4 equal 16-bit chunks — bit-identical
    to the DuckDB twin's ``i // 16`` chunking (hamming_chunks(4) =
    [(0,16),(16,16),(32,16),(48,16)]).
    """
    keyed = with_simhash64(df, text_col, id_col)
    return hamming_neardup_pairs(keyed, "_id", "_fp", max_hamming)


def write_chunk_table(
    corpus: DataFrame,
    id_col: str,
    fp_col: str,
    table: str,
    max_hamming: int = 3,
    n_buckets: int = 64,
    path: str | None = None,
) -> None:
    """Persist the corpus pigeonhole chunk table as a BUCKETED+SORTED
    Spark table on the blocking key ``(c, v)`` — the state-table form of
    incremental near-dup dedup at 10^10 images.

    Why bucketed: the per-wave ingest join (:func:`hamming_neardup_join`
    with ``corpus_chunked=True``) then reads the corpus pre-partitioned on
    the join key — the 10^10-row side is NEVER shuffled again; each wave
    exchanges only its own ``(t+1) × |batch|`` chunk rows to the bucket
    layout. Without bucketing, every wave would re-shuffle the entire
    corpus chunk table just to co-locate it with a batch 10^6× smaller.

    ``path`` makes it an external table (data at ``path``, catalog entry
    only in the metastore) — on a real cluster this is the Iceberg/Hive
    table the state store tracks; size ``n_buckets`` ≈ corpus chunk rows /
    target partition rows. New waves' novel rows append with the SAME
    bucket spec (``insertInto`` preserves bucketing).
    """
    chunks = _fp_chunks(corpus, id_col, fp_col, max_hamming)
    w = (
        chunks.write.bucketBy(n_buckets, "c", "v")
        .sortBy("c", "v")
        .mode("overwrite")
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


# ------------------------------------------------------------- image near-dup
PHASH_SCHEMA = "image_id string, phash long"


def _phash_batches(batches):
    """Arrow-batched bytes → pHash kernel (the same decode the validation and
    crawl paths use); per-image loop is inside one Arrow batch, like PIL."""
    from amazonwebcrawler_spark.functions.images import decode_image, phash64

    for pdf in batches:
        out = []
        for image_id, data in zip(pdf["image_id"], pdf["bytes"]):
            try:
                ph = phash64(decode_image(bytes(data)))
            except Exception:  # noqa: BLE001  # corrupt/unknown container → no fingerprint
                ph = None
            out.append({"image_id": image_id, "phash": ph})
        pdf_out = pd.DataFrame(out, columns=["image_id", "phash"])
        # a None in the batch coerces the column to float64, silently
        # truncating int64 hashes past 2^53 — rebuild as nullable Int64
        pdf_out["phash"] = pd.array([r["phash"] for r in out], dtype="Int64")
        yield pdf_out


QPHASH_SCHEMA = "image_id string, q_idx int, qhash long"


def _quadrant_phash_batches(batches):
    """Arrow-batched bytes → 4 quadrant pHashes per image (ONE decode;
    the 4-row fan-out happens inside the kernel, not as a Spark explode)."""
    from amazonwebcrawler_spark.functions.images import decode_image, quadrant_phashes

    for pdf in batches:
        out = []
        for image_id, data in zip(pdf["image_id"], pdf["bytes"]):
            try:
                qs = quadrant_phashes(decode_image(bytes(data)))
            except Exception:  # noqa: BLE001  # corrupt/unknown container → no fingerprint
                continue
            out.extend(
                {"image_id": image_id, "q_idx": i, "qhash": q} for i, q in enumerate(qs)
            )
        yield pd.DataFrame(out, columns=["image_id", "q_idx", "qhash"])


def quadrant_neardup_pairs(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    max_hamming: int = 2,
    min_quadrants: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Crop/watermark-robust image near-dup pairs by QUADRANT pHash vote:
    two images pair when ≥ ``min_quadrants`` of their 4 quadrant hashes
    (functions/images.quadrant_phashes) are within hamming ≤
    ``max_hamming``. The whole-image pHash (:func:`phash_neardup_pairs`)
    misses a corner-logo / timestamp / letterbox variant — the overlay
    shifts the global 8×8 mean and flips bits across the WHOLE hash —
    while here the perturbation is confined to one quadrant and the other
    three vote the pair through. min_quadrants=4 degrades to a stricter
    whole-image match; 3 is the single-overlay setting.

    Scale shape: ONE Arrow decode pass emits 4 fingerprint rows per image
    (kernel-side fan-out); each quadrant slice rides the exact pigeonhole
    blocker (:func:`hamming_neardup_pairs` — (t+1)-chunk equi-join, never
    a cross join, same ``max_bucket`` skew guard), and the vote is one
    map-side-combinable (id_a, id_b) count. A 10^10-image corpus shuffles
    4·(t+1) rows per image on 2-int keys — the SimHash/LSH band shape.
    Returns ``(id_a, id_b, n_quadrants_close)``, id_a < id_b, all exact
    integers.
    """
    if not 1 <= min_quadrants <= 4:
        raise ValueError(f"need 1 <= min_quadrants <= 4, got {min_quadrants}")
    q = (
        images.select(F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes"))
        .mapInPandas(_quadrant_phash_batches, QPHASH_SCHEMA)
        .localCheckpoint()  # decode once; 4 blocked joins consume it
    )
    votes = None
    for qi in range(4):
        p = hamming_neardup_pairs(
            q.filter(F.col("q_idx") == qi),
            "image_id",
            "qhash",
            max_hamming,
            max_bucket=max_bucket,
        ).select("id_a", "id_b")
        votes = p if votes is None else votes.unionByName(p)
    return (
        votes.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_quadrants_close"))
        .filter(F.col("n_quadrants_close") >= min_quadrants)
    )


def _flip_canon_batches(batches):
    """Arrow-batched bytes → orientation-canonical pHash (ONE decode; the
    four orientation hashes are numpy views, not re-decodes)."""
    from amazonwebcrawler_spark.functions.images import decode_image, flip_canonical_phash

    for pdf in batches:
        out = []
        for image_id, data in zip(pdf["image_id"], pdf["bytes"]):
            try:
                ph = flip_canonical_phash(decode_image(bytes(data)))
            except Exception:  # noqa: BLE001  # corrupt container → no fingerprint
                ph = None
            out.append({"image_id": image_id, "canon": ph})
        pdf_out = pd.DataFrame(out, columns=["image_id", "canon"])
        # a None in the batch coerces the column to float64, silently
        # truncating int64 hashes past 2^53 — rebuild as nullable Int64
        pdf_out["canon"] = pd.array([r["canon"] for r in out], dtype="Int64")
        yield pdf_out


def flip_neardup_pairs(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    max_hamming: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Flip/rotation-robust image near-dup pairs: hamming dedup over the
    orientation-CANONICAL pHash (functions/images.flip_canonical_phash —
    unsigned-min over identity / h-mirror / v-mirror / 180°). A mirrored
    re-upload sits ~32 hamming bits from its master on the plain pHash
    (:func:`phash_neardup_pairs` at t=2 misses it categorically; the
    flip_dedup golden pins this) but hamming 0 on the canonical hash.

    Scale shape: identical to phash_neardup_pairs — ONE Arrow decode per
    image (the 4 orientations are numpy views inside the kernel, never
    extra decodes or Spark rows), then the exact (t+1)-chunk pigeonhole
    blocker on a single 64-bit column. Corrupt images drop (no
    fingerprint). Returns ``(id_a, id_b, hamming)``, id_a < id_b.
    """
    keyed = images.select(
        F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes")
    ).mapInPandas(_flip_canon_batches, "image_id string, canon long")
    return hamming_neardup_pairs(
        keyed.filter(F.col("canon").isNotNull()),
        "image_id",
        "canon",
        max_hamming,
        max_bucket=max_bucket,
    )


def phash_neardup_pairs(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str | None = "bytes",
    phash_col: str = "phash",
    max_hamming: int = 2,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance —
    the multimodal member of the dedup family (input_hint image schema).

    The canonical near-dup case is the SAME picture stored through different
    codecs (PNG master vs lossy JPEG thumbnail): pixel values shift a little,
    the 8×8 average-hash flips 0-4 bits, and exact dedup misses the pair
    entirely. With ``bytes_col`` set (default) the fingerprint is recomputed
    from the opaque ``bytes`` column via the decode kernel — trusting no
    stored metadata, exactly like ``validate_images`` — and undecodable
    images drop out with no fingerprint. Pass ``bytes_col=None`` to pair on
    an existing ``phash_col`` without touching Python at all (pure JVM path).

    Pairing is :func:`hamming_neardup_pairs`: pigeonhole chunk blocking +
    ``bit_count(xor)`` verify — never a full cross join, so it holds at
    10^10 images exactly like the SimHash text path.
    """
    if bytes_col is not None:
        keyed = images.select(
            F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes")
        ).mapInPandas(_phash_batches, PHASH_SCHEMA).filter(F.col("phash").isNotNull())
    else:
        keyed = images.select(
            F.col(id_col).alias("image_id"), F.col(phash_col).cast("long").alias("phash")
        ).filter(F.col("phash").isNotNull())
    return hamming_neardup_pairs(keyed, "image_id", "phash", max_hamming)


# ----------------------------------------------------------- materialization
def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    use_star: bool = False,
) -> DataFrame:
    """Materialize the dedup decision: near-dup PAIRS → one kept
    representative per connected component, over the FULL corpus.

    Pair finding (MinHash/SimHash/pHash/embedding) and grouping
    (connected components) still leave the question a pipeline actually
    asks: *which rows survive?* This operator answers it with the standard
    corpus-dedup policy — keep the highest-``quality_col`` member of each
    group (ties broken by smallest id, so the decision is total and
    deterministic); every document outside any pair keeps itself.

    Returns (doc_id, group_id, keep) over ALL of ``docs`` — ``keep`` is
    int 0/1 (exactly one 1 per group), ``group_id`` the component minimum
    (own id for singletons). ``filter(keep = 1)`` is the deduplicated
    corpus; ``filter(keep = 0)`` is the drop list.

    Scale shape: the corpus never enters the CC loop — ``labels`` covers
    only pair members (near-dup graphs are a sliver of a 10^10-doc corpus),
    so both joins here are corpus ⋈ tiny (AQE broadcasts them), and the
    winner election is a map-side-combinable ``max_by`` groupBy on the
    small labelled slice, not a corpus-wide window sort. Singletons take
    the left_anti branch and are never shuffled by group.

    ``use_star=True`` routes grouping through the O(log n)
    large-star/small-star CC for long-chain pair graphs; the default
    min-label propagation is cheaper on the tiny components LSH emits.
    """
    if use_star:
        labels, _ = connected_components_star(pairs)
    else:
        labels = connected_components(pairs)
    corpus = docs.select(F.col(id_col).alias("doc_id"), F.col(quality_col).alias("_q"))
    winners = corpus.join(labels, "doc_id").groupBy("group_id").agg(
        # min over (-quality, id): highest quality wins, ties to smallest id
        # — negating quality (numeric by contract) instead of id keeps the
        # election valid for ANY orderable id type (string image ids too)
        F.min_by("doc_id", F.struct(-F.col("_q"), F.col("doc_id"))).alias("_keep_id")
    )
    # ONE merged output pass instead of decided ∪ singletons (r6): the old
    # three-branch form scanned ``docs`` three times per action (labelled,
    # its reuse under winners, and the singleton anti-join). A left join
    # against the label sliver + the winner sliver folds both branches into
    # one projection — a null group_id can never equi-match ``winners``, so
    # singletons surface with _keep_id null and take the keep=1 arm; rows
    # and values are identical (same election, same singleton policy).
    return (
        corpus.join(labels, "doc_id", "left")
        .join(winners, "group_id", "left")
        .select(
            "doc_id",
            F.coalesce("group_id", "doc_id").alias("group_id"),
            F.when(F.col("group_id").isNull(), F.lit(1))
            .otherwise((F.col("doc_id") == F.col("_keep_id")).cast("int"))
            .alias("keep"),
        )
    )


# -------------------------------------------- exact substring (span) dedup
def duplicated_span_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Cross-document EXACT substring dedup profile (the ExactSubstr
    deduplication of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", re-expressed relationally): every k-token
    window that occurs ``min_count``+ times ANYWHERE in the corpus
    (across documents or repeated inside one) is a duplicated span; per
    document, overlapping duplicated windows are merged into maximal
    spans and removed.

    Lee et al. build a corpus-wide suffix array — a sequential,
    single-machine construction. The relational form needs only (1) one
    posexplode into positional k-grams, (2) ONE map-side-combinable
    count per gram, (3) a join back keyed by gram, and (4) a per-document
    gaps-and-islands window to merge overlapping [p, p+k) intervals —
    every stage partitioned by data keys (gram, then doc), no global
    structure, so it scales to 10^10 documents where a suffix array
    cannot. This implements the "remove ALL occurrences" variant (no
    duplicated k-gram survives), which is order-independent and therefore
    repartition-invariant; keep-one-copy needs a global occurrence order
    (see ``keep_canonical`` for the doc-level analogue).

    Returns one row per input document:
      (doc_id, n_tokens, n_dup_spans, dup_tokens, kept_tokens, clean_fp)
    where clean_fp = md5 of the space-joined surviving tokens — the twin
    re-derives the full removal, so span MERGING (not just counting) is
    value-checked. All counts are exact BIGINTs.

    Scale notes: the gram-count aggregate carries the k-gram string as
    the grouping key for twin exactness; at 100 TB the key would be the
    gram's 128-bit md5 (collision-negligible) to cut shuffle bytes ~5×,
    with everything downstream unchanged. The islands window partitions
    by doc_id over ONLY the duplicated occurrences (a sliver of the
    corpus); the final token filter is pure column math on the already
    doc-partitioned rows.
    """
    from amazonwebcrawler_spark.functions.text import tokens

    base = df.select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks"))
    pos = base.filter(F.size("_toks") >= k).select(
        "_id", "_toks", F.explode(F.sequence(F.lit(0), F.size("_toks") - k)).alias("_p")
    )
    gram = F.concat_ws(" ", *[F.get(F.col("_toks"), F.col("_p") + j) for j in range(k)])
    occ = pos.select("_id", "_p", gram.alias("_g"))
    dup_grams = (
        occ.groupBy("_g").count().filter(F.col("count") >= min_count).select("_g")
    )
    dup_occ = occ.join(dup_grams, "_g").select("_id", "_p")
    # merge overlapping/adjacent [p, p+k) windows: with equal lengths and
    # ascending p the running end is monotone, so a new span starts exactly
    # when p > prev_p + k (a gap of uncovered tokens in between)
    w = Window.partitionBy("_id").orderBy("_p")
    lag_p = F.lag("_p").over(w)
    spans = (
        dup_occ.withColumn(
            "_new", F.when(lag_p.isNull() | (F.col("_p") > lag_p + k), 1).otherwise(0)
        )
        .withColumn(
            "_isl",
            F.sum("_new").over(
                Window.partitionBy("_id").orderBy("_p").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("_id", "_isl")
        .agg(F.min("_p").alias("_s"), (F.max("_p") + k).alias("_e"))
    )
    per_doc = spans.groupBy("_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("_e") - F.col("_s")).cast("long").alias("dup_tokens"),
        F.collect_list(F.struct(F.col("_s").alias("s"), F.col("_e").alias("e"))).alias(
            "_spans"
        ),
    )
    joined = base.join(per_doc, "_id", "left")
    kept = F.filter(
        "_toks",
        lambda _, i: ~F.coalesce(
            F.exists("_spans", lambda sp: (i >= sp["s"]) & (i < sp["e"])), F.lit(False)
        ),
    )
    return joined.select(
        F.col("_id").alias(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        (F.size("_toks") - F.coalesce(F.col("dup_tokens"), F.lit(0)))
        .cast("long")
        .alias("kept_tokens"),
        F.md5(F.concat_ws(" ", kept)).alias("clean_fp"),
    )


# ------------------------------------------------- multimodal pair dedup
def multimodal_dedup_keep(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
    max_hamming: int = 2,
    caption_threshold: float = 0.8,
) -> DataFrame:
    """Joint image+caption dedup over an image-caption pair table (the
    input_hint schema): two records are duplicates when their IMAGES are
    near-identical (pHash hamming ≤ ``max_hamming``) **or** their CAPTIONS
    are near-identical (MinHash-blocked exact Jaccard ≥
    ``caption_threshold``) — the standard curation rule for web-scraped
    pair datasets, where the same picture circulates under rewritten alt
    text and the same boilerplate caption decorates different thumbnails.

    The two edge sets are unioned BEFORE grouping, so mixed-modality
    chains collapse correctly: A ~image~ B ~caption~ C is one group of
    three even though A and C share neither pixels nor words. Keep
    election is :func:`keep_canonical` on byte size (the lossless master
    outlives its re-encodes).

    Scale shape: both pair finders are the blocked forms (pigeonhole
    chunks / LSH bands — never all-pairs); the caption side never touches
    Python, the image side crosses once through the Arrow pHash kernel;
    the union is a set-op on id pairs (a sliver), and the corpus enters
    only the final broadcast-sized keep join.

    Returns (doc_id, group_id, keep) over every input record.
    """
    img_pairs = phash_neardup_pairs(
        images, id_col=id_col, bytes_col=bytes_col, max_hamming=max_hamming
    )
    cap_pairs = minhash_lsh_pairs(
        images.select(F.col(id_col), F.col(caption_col)),
        caption_col,
        id_col,
        threshold=caption_threshold,
    )
    edges = (
        img_pairs.select("id_a", "id_b")
        .unionByName(cap_pairs.select("id_a", "id_b"))
        .distinct()
    )
    docs = images.select(F.col(id_col), F.length(F.col(bytes_col)).alias("n_bytes"))
    return keep_canonical(docs, edges, id_col=id_col, quality_col="n_bytes")


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    modulus: int = 16,
) -> DataFrame:
    """Content-defined chunking (Rabin/FastCDC-style) + chunk-level dedup.

    Fixed-width chunking breaks storage dedup the moment one byte is
    inserted — every later chunk shifts. CDC cuts where a rolling hash of
    the last ``window`` characters satisfies ``h % modulus == 0``, so cut
    points are a pure function of LOCAL content: two documents sharing a
    boilerplate tail (or any long common substring) produce identical
    chunks there no matter how their prefixes differ. This is the dedup
    the WARC/revisit storage layer runs below the document-level family —
    expected chunk length ``modulus`` characters past the window.

    The hash is md5 of the window substring (the cross-engine md5
    discipline; a production kernel would use a true O(1) rolling
    polynomial inside ``mapInPandas`` — the md5-per-position form keeps
    the operator relational and value-checkable, at O(len·window) hash
    bytes). Positions explode to one row per character offset ≥
    ``window``; short documents (< window chars) become a single chunk
    via the unconditional end-of-text cut. ``is_first`` elects the
    canonical owner of each distinct chunk digest by (id, start) order —
    storage savings = chunk bytes where NOT is_first.

    Scale shape: the explode is linear in corpus characters and never
    shuffles (cut detection is per-row column math); the only exchanges
    are the per-doc cut window and the digest-ownership window, both
    key-partitioned. Reference scraper stores every page whole
    (``html = browser.page_source``, getStockNumber.py:59 — every
    revisit re-captures the full page); this is the delta-storage
    replacement.

    Returns ``(id, chunk_idx, start, chunk_len, digest, is_first)``.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_t"),
        F.length(F.col(text_col)).alias("_len"),
    ).filter(F.col("_len") > 0)

    pos = base.filter(F.col("_len") >= window).select(
        "_id",
        "_t",
        "_len",
        F.explode(F.sequence(F.lit(window), F.col("_len"))).alias("i"),
    )
    win = F.substring(F.col("_t"), F.col("i") - F.lit(window - 1), F.lit(window))
    h = F.conv(F.substring(F.md5(win), 1, 8), 16, 10).cast("long")
    cuts = (
        pos.filter((h % modulus == 0) | (F.col("i") == F.col("_len")))
        .select("_id", "i")
        .unionByName(base.select("_id", F.col("_len").alias("i")))
        .distinct()
    )
    w = Window.partitionBy("_id").orderBy("i")
    spans = cuts.select(
        "_id",
        F.row_number().over(w).alias("chunk_idx"),
        (F.coalesce(F.lag("i").over(w), F.lit(0)) + 1).alias("start"),
        F.col("i").alias("end"),
    )
    chunks = spans.join(base, "_id").select(
        F.col("_id").alias(id_col),
        "chunk_idx",
        F.col("start").cast("long").alias("start"),
        (F.col("end") - F.col("start") + 1).cast("long").alias("chunk_len"),
        F.md5(F.substring(F.col("_t"), F.col("start"), F.col("end") - F.col("start") + 1)).alias(
            "digest"
        ),
    )
    own = Window.partitionBy("digest").orderBy(id_col, "start")
    return chunks.withColumn("is_first", F.row_number().over(own) == 1)


def cdc_chunks_oracle_sql(
    docs_sql: str, window: int = 8, modulus: int = 16
) -> str:
    """DuckDB twin of :func:`cdc_chunks` over ``docs_sql`` → (id, text)."""
    return f"""
WITH base AS (SELECT id AS _id, text AS _t, length(text) AS _len FROM ({docs_sql}) WHERE length(text) > 0),
pos AS (
  SELECT _id, _t, _len, CAST(u.i AS INT) AS i
  FROM base, UNNEST(generate_series({window}, _len)) AS u(i)
),
cuts AS (
  SELECT _id, i FROM pos
  WHERE CAST(('0x' || substr(md5(substr(_t, i - {window - 1}, {window})), 1, 8)) AS UBIGINT)
          % {modulus} = 0
     OR i = _len
  UNION
  SELECT _id, _len FROM base
),
spans AS (
  SELECT _id,
    CAST(row_number() OVER (PARTITION BY _id ORDER BY i) AS INT) AS chunk_idx,
    COALESCE(lag(i) OVER (PARTITION BY _id ORDER BY i), 0) + 1 AS start,
    i AS e
  FROM cuts
),
chunks AS (
  SELECT s._id AS id, s.chunk_idx, CAST(s.start AS BIGINT) AS start,
    CAST(s.e - s.start + 1 AS BIGINT) AS chunk_len,
    md5(substr(b._t, s.start, s.e - s.start + 1)) AS digest
  FROM spans s JOIN base b ON b._id = s._id
)
SELECT id, chunk_idx, start, chunk_len, digest,
  row_number() OVER (PARTITION BY digest ORDER BY id, start) = 1 AS is_first
FROM chunks
"""


def cluster_size_stats(
    docs: DataFrame, labels: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate-cluster size distribution — the corpus-health report a
    dedup pass publishes before anyone trusts its keep decisions: the
    histogram's head ("94% of docs are singletons") calibrates how
    aggressive the blocking was, and its tail ("one cluster holds 40 000
    docs") is the boilerplate/mirror alarm that routinely means a
    template page, not 40 000 real duplicates. (The reference workbook
    reports per-keyword row counts as its sanity signal,
    getRank.py:358-377; this is the dedup-side analogue.)

    ``labels`` is any (id, group_id) output of the CC family; docs
    outside every pair are their own singleton cluster (the dedup_keep
    contract). Scale shape: one left join docs→labels on the id key,
    one (group_id) count agg, one (size) histogram agg — each map-side
    combinable — and the grand total rides a 1-row broadcast cross
    join, so nothing global ever sorts or collects. ``docs_ppm`` is an
    exact integer DIV share of the corpus.

    Returns (cluster_size, n_clusters, n_docs, docs_ppm) — one row per
    observed size."""
    allg = (
        docs.select(F.col(id_col).alias("_id"))
        .join(labels.withColumnRenamed(labels.columns[0], "_id"), "_id", "left")
        .select(F.coalesce(F.col("group_id"), F.col("_id")).alias("group_id"))
    )
    sizes = allg.groupBy("group_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )
    hist = hist.select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
    )
    total = docs.select(F.count(F.lit(1)).alias("_total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        F.expr("(n_docs * 1000000) DIV _total").alias("docs_ppm"),
    )


def phash_bit_stats(
    df: DataFrame, hash_col: str = "phash", min_balance_milli: int = 100
) -> DataFrame:
    """Per-bit population balance of a 64-bit perceptual-hash column —
    the health audit for every hamming-distance consumer downstream
    (hamming_neardup_pairs, the pigeonhole blocker, flip-canonical
    dedup): a bit that is ~always 0 or ~always 1 across the corpus
    carries no discriminating information, so effective hash width
    shrinks and near-dup recall quietly degrades — the classic failure
    when a corpus is dominated by one template image whose downsample
    fixes half the grid. (pHash is the average-hash over the 8×8 grid,
    functions/images.phash64; a uniform corpus should balance each bit
    near 500‰.)

    One pass: explode the 64 bit positions from a literal array (64×
    row fan-out, constant factor), one map-side-combinable (bit) count
    — never a per-bit job, never a collect. ``balance_milli =
    1000·min(ones, n−ones) DIV n`` (0 = degenerate, 500 = perfectly
    balanced); ``is_degenerate`` flags bits under ``min_balance_milli``.
    Returns 64 rows: (bit, n_ones, balance_milli, is_degenerate)."""
    bits = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        F.col(hash_col).alias("_h"),
    ).select("bit", F.expr("shiftrightunsigned(_h, bit) & 1").alias("_b"))
    return (
        bits.groupBy("bit")
        .agg(
            F.sum("_b").cast("long").alias("n_ones"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "bit",
            "n_ones",
            F.expr("(least(n_ones, _n - n_ones) * 1000) DIV _n").alias("balance_milli"),
            (
                F.expr("(least(n_ones, _n - n_ones) * 1000) DIV _n")
                < min_balance_milli
            ).alias("is_degenerate"),
        )
    )


def hamming_certify(
    keyed: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 4,
) -> DataFrame:
    """Per-distance certification of the pigeonhole hamming blocker
    against exhaustive ground truth — the eval-on-a-sample discipline
    (lsh_eval's sibling): the blocker is exact BY CONSTRUCTION
    (a pair within hamming ≤ t differs in at most t of the t+1 chunks),
    and this op turns that proof into DATA — a per-distance
    recall row the pipeline's audit record carries, re-verified on
    every sample instead of trusted from a docstring.

    Truth is a broadcast O(n²) bit_count self-join — which is exactly
    why this runs on a SAMPLE (hash_sample upstream), never the corpus:
    the certified property transfers because the blocker's chunking
    logic is input-independent. Returns one row per distance
    d ∈ 0..max_hamming: (hamming, n_true_pairs, n_blocked_pairs,
    recall_milli) — recall_milli must read 1000 at every distance, and
    a silent blocker regression (chunk-width bug, radix change) is a
    red row here before it is a recall cliff downstream."""
    ids = keyed.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"))
    a, b = ids.alias("a"), ids.alias("b")
    truth = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.bit_count(F.col("a._fp").bitwiseXOR(F.col("b._fp"))).alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))
    )
    blocked = (
        hamming_neardup_pairs(keyed, id_col, fp_col, max_hamming=max_hamming)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("long").alias("n_blocked_pairs"))
    )
    grid = keyed.sparkSession.range(max_hamming + 1).select(
        F.col("id").cast("int").alias("hamming")
    )
    return (
        grid.join(truth, "hamming", "left")
        .join(blocked, "hamming", "left")
        .select(
            "hamming",
            F.coalesce("n_true_pairs", F.lit(0)).cast("long").alias("n_true_pairs"),
            F.coalesce("n_blocked_pairs", F.lit(0)).cast("long").alias("n_blocked_pairs"),
            F.expr(
                "CASE WHEN coalesce(n_true_pairs, 0) = 0 THEN 1000 "
                "ELSE (coalesce(n_blocked_pairs, 0) * 1000) DIV n_true_pairs END"
            ).alias("recall_milli"),
        )
    )
