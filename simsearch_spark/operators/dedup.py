"""Deduplication operators for large-scale training-data pipelines.

Five tiers, cheapest-first — exactly the ladder a 100 TB corpus pipeline
runs (the reference engine has no dedup; these generalize its K4 set-sim
machinery, SURVEY.md §7 step 7):

- exact: fingerprint (normalized rolling hash) → groupBy.  One shuffle on a
  64-bit key; at 100 TB this is the classic first pass.
- minhash LSH: shingle → minhash signature → band-bucket join → verified
  Jaccard.  Candidate generation shuffles only (band_hash, id) pairs;
  verification touches candidate pairs, not the n² space.
- simhash: 32-bit signature per doc, near-dup = hamming ≤ r.  Signature is a
  pure map; the pair join is block-partitioned by signature prefix at scale.
- n-gram Jaccard: the exact prefix-filtered set-similarity join
  (operators/setsim.py) over word shingles.
- embedding cosine: near-dup by vector similarity; brute pairs locally,
  LSH-bucketed (operators/ann.py) at scale.

All hash arithmetic uses the char-fold base hash (functions/hashing.py) so
every tier is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from simsearch_spark.functions import measures
from simsearch_spark.functions.hashing import hamming64
from simsearch_spark.functions.text import doc_fingerprint
from simsearch_spark.operators.setsim import jaccard_self_join


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (order-preserving token n-grams).  Token-set
    Jaccard saturates on small vocabularies; shingles keep word order and are
    the standard dedup unit (MinHash over shingles).  NULL/whitespace-only
    text yields the EMPTY shingle set (not [""]) — shared contract with the
    Arrow kernels, so empty documents reach the minhash sentinel instead of
    colliding on the hash of the empty string."""
    w = F.split(col, " ")
    count = F.greatest(F.size(w) - F.lit(n - 1), F.lit(1))
    # F.get is 0-based and NULL-safe out of bounds (no ANSI error for short
    # docs); concat_ws skips NULLs — mirrored by DuckDB's concat_ws in oracles
    grams = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.concat_ws(" ", *[F.get(w, i + j) for j in range(n)]),
    )
    return F.when(
        col.isNull() | (F.trim(col) == ""), F.array().cast("array<string>")
    ).otherwise(F.array_distinct(grams))


def shingle_frame(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingles) via an Arrow-batched pandas kernel — pure string
    slicing, so output is byte-identical to `word_shingles` (equality-tested)
    but ~5x faster than the interpreted higher-order-function chain.  All
    dedup tiers build on this frame; callers persist it (signature-table
    pattern, see minhash_lsh_pairs)."""
    from collections.abc import Iterator

    import pandas as pd

    from simsearch_spark.operators.fanout import fanout_for_kernel

    df = fanout_for_kernel(df, id_col)
    id_dtype = dict(df.dtypes)[id_col]

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                if t is None or t.strip() == "":
                    out.append([])
                    continue
                words = t.split(" ")
                count = max(len(words) - (n - 1), 1)
                # dict.fromkeys = first-occurrence dedupe, same contents as
                # array_distinct
                out.append(list(dict.fromkeys(" ".join(words[i : i + n]) for i in range(count))))
            yield pd.DataFrame({id_col: pdf[id_col], "shingles": out})

    return df.select(id_col, text_col).mapInPandas(
        proc, f"{id_col} {id_dtype}, shingles array<string>"
    )


def simhash_frame(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32, shingle_n: int = 3
) -> DataFrame:
    """(id, sig): the SimHash signature table in ONE Arrow-batched pass —
    shingling, char-fold hashing, Knuth spread, and per-bit majority fused,
    replacing three interpreted HOF stages (measured the bulk of the banded
    query's cost at sf0.1).  All-integer math, so the signatures are
    bit-identical to ``simhash(token_hashes(...))`` (equality-tested) and
    the DuckDB oracle replays them verbatim."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from simsearch_spark.functions.hashing import MOD as _MOD
    from simsearch_spark.operators.fanout import fanout_for_kernel

    # the fused shingle/permutation kernel is the corpus pass this table
    # costs — spread a single-split scan across the cores first (r14)
    df = fanout_for_kernel(df, id_col)
    from simsearch_spark.functions.hashing import SPREAD_MULT

    id_dtype = dict(df.dtypes)[id_col]
    jbits = np.arange(bits, dtype=np.uint64)

    from simsearch_spark.functions.hashing import batch_kgram_hashes

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, nonempty = [], []
            for t in pdf[text_col]:
                ok = t is not None and t.strip() != ""
                nonempty.append(ok)
                if ok:
                    texts.append(t)
            # batched char-fold over every k-gram (r15, guide §4.2).
            # SimHash counts each DISTINCT shingle once, so the per-doc
            # hash vector is the all-k-gram vector selected at the FIRST
            # OCCURRENCE index of each distinct shingle string — dedup
            # stays by string (hash-value dedup could merge two distinct
            # shingles on a hash collision), arithmetic stays identical.
            all_hs = iter(batch_kgram_hashes(texts, shingle_n)[0])
            ti = iter(texts)
            sigs = []
            for ok in nonempty:
                if not ok:
                    sigs.append(0)
                    continue
                t = next(ti)
                hs_all = next(all_hs)
                words = t.split(" ")
                count = max(len(words) - (shingle_n - 1), 1)
                seen, first_idx = set(), []
                for i in range(count):
                    s = " ".join(words[i : i + shingle_n])
                    if s not in seen:
                        seen.add(s)
                        first_idx.append(i)
                hs = (
                    hs_all
                    if len(first_idx) == count
                    else hs_all[np.asarray(first_idx, dtype=np.int64)]
                )
                # h*SPREAD_MULT < 2^62 — exact in uint64, same value the
                # old Python-int product produced
                hs = hs.astype(np.uint64) * np.uint64(SPREAD_MULT)
                mat = (hs[:, None] >> jbits) & np.uint64(1)
                contrib = (2 * mat.astype(np.int64) - 1).sum(axis=0)
                sigs.append(int(((contrib > 0).astype(np.uint64) << jbits).sum()))
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(proc, f"{id_col} {id_dtype}, sig long")


def minhash_banded_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    fanout: bool = True,
) -> DataFrame:
    """(id, shingles, bands): the MinHash-LSH signature table in ONE Arrow
    pass — shingling, char-fold hashing, the n permutation minima, and band
    folding fused (the JVM chain evaluated n_hashes array-min HOF
    expressions per row).  All-integer modular arithmetic identical to
    ``minhash_bands(minhash_signature(token_hashes(...)))``
    (equality-tested on non-empty texts).  NULL/empty texts produce an
    EMPTY shingle set and the PERM_MOD sentinel signature (the column chain
    shingles them as [""], which made m empty docs collide into the same
    buckets and verify at jaccard 1.0 — O(m²) false pairs);
    ``minhash_lsh_pairs`` additionally filters them out of the candidate
    universe, so the sentinel is defense-in-depth for direct callers."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from simsearch_spark.functions.hashing import MOD as _MOD
    from simsearch_spark.functions.hashing import PERM_MOD, perm_params
    from simsearch_spark.operators.fanout import fanout_for_kernel

    # the fused shingle/permutation kernel is the corpus pass this table
    # costs — spread a single-split scan across the cores first (r14).
    # fanout=False is the delta-append tier: its work is ∝|delta| by
    # design and the caller's 1-job limit-probe must stay single-job
    if fanout:
        df = fanout_for_kernel(df, id_col)
    id_dtype = dict(df.dtypes)[id_col]
    rows_per_band = n_hashes // bands
    params = perm_params(n_hashes, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in params], dtype=np.int64)[:, None]

    from simsearch_spark.functions.hashing import batch_kgram_hashes

    def _band_fold(sig, j, rpb):
        acc = 0
        for r in range(rpb):
            acc = (acc * 31 + int(sig[j * rpb + r])) % _MOD
        return acc

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, nonempty = [], []
            for t in pdf[text_col]:
                ok = t is not None and t.strip() != ""
                nonempty.append(ok)
                if ok:
                    texts.append(t)
            # one batched char-fold over EVERY k-gram of the whole Arrow
            # batch (r15, guide §4.2 — was an interpreted per-char loop).
            # Duplicate shingles are hashed too: a permutation's MIN over
            # the k-gram multiset equals its min over the distinct set, so
            # the signatures are bit-identical (equality still pinned in
            # tests); the distinct STRING list below is the output column
            # and keeps the first-occurrence dedup.
            all_hs = iter(batch_kgram_hashes(texts, shingle_n)[0])
            sh_out, band_out = [], []
            ti = iter(texts)
            for ok in nonempty:
                if not ok:
                    sh_out.append([])
                    band_out.append(
                        [_band_fold(np.full(n_hashes, PERM_MOD, dtype=np.int64),
                                    j, rows_per_band) for j in range(bands)]
                    )
                    continue
                t = next(ti)
                words = t.split(" ")
                count = max(len(words) - (shingle_n - 1), 1)
                shingles = list(
                    dict.fromkeys(" ".join(words[i : i + shingle_n]) for i in range(count))
                )
                hs = next(all_hs)
                # (n_hashes, n_kgrams) permuted hashes; a*h ≤ 9e8·1e9 < 2^63
                perm = (a_vec * hs + b_vec) % PERM_MOD
                sig = perm.min(axis=1)
                bvals = [_band_fold(sig, j, rows_per_band) for j in range(bands)]
                sh_out.append(shingles)
                band_out.append(bvals)
            yield pd.DataFrame({id_col: pdf[id_col], "shingles": sh_out, "bands": band_out})

    return df.select(id_col, text_col).mapInPandas(
        proc, f"{id_col} {id_dtype}, shingles array<string>, bands array<long>"
    )


#: hot-bucket guard (VERDICT r9 task 4): adaptive params keep RANDOM
#: collisions flat, but an adversarial/skewed corpus (near-constant
#: vectors, boilerplate shingles) can still put s >> cap members in one
#: LSH bucket, whose s²/2 pairs would otherwise land in one quadratic
#: task.  Each bucket therefore contributes pairs from at most this many
#: members (its LOWEST ids — deterministic); overflow members are DROPPED
#: from that bucket (MMDS drop-with-count practice: a cluster that large
#: is boilerplate the exact tier owns; each member usually still pairs
#: through its other, healthier bands).  4096 bounds a bucket task at
#: ~8M pairs and is far above anything a healthy corpus produces; the
#: dropped mass is one agg away (count rows ranked past the cap).
LSH_BUCKET_CAP = 4096


#: driver bound on distinct oversized buckets — a corpus exceeding it is
#: degenerate (>10⁴ buckets each holding >cap near-identical members has a
#: quadratic ANSWER no guard can fix; the exact tier owns it)
MAX_HOT_BUCKETS = 10_000


def _hot_bucket_rows(
    expl: DataFrame,
    key_cols: list[str],
    cap: int,
    max_hot: int = MAX_HOT_BUCKETS,
):
    """The over-cap bucket keys WITH their sizes — ONE map-side-combinable
    count, collected (driver-bounded by ``max_hot``; empty on every
    healthy corpus)."""
    hot_rows = (
        expl.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") > int(cap))
        .limit(max_hot + 1)
        .collect()
    )
    if len(hot_rows) > max_hot:
        raise ValueError(
            f"_cap_lsh_buckets: more than {max_hot} buckets exceed cap={cap} "
            "— the corpus is boilerplate-degenerate; run exact dedup first"
        )
    return hot_rows


def _bucket_key_expr(key_cols: list[str]):
    return F.concat_ws("\x00", *[F.col(c).cast("string") for c in key_cols])


def _cap_lsh_buckets(
    expl: DataFrame,
    key_cols: list[str],
    id_col: str,
    cap: int | None,
    max_hot: int = MAX_HOT_BUCKETS,
) -> DataFrame:
    """Keep each LSH bucket's ``cap`` lowest-id member rows (the
    deterministic drop-with-count contract above); ``cap=None`` disables.

    Eager two-path: bucket sizes come from ONE map-side-combinable count
    whose over-cap keys are COLLECTED (driver-bounded by ``max_hot``; the
    set is empty on every healthy corpus).  Empty → the input plan is
    returned UNTOUCHED, so the guard's steady-state cost is exactly one
    narrow count job — a first cut ran every row through a row_number
    window (full shuffle+sort: 3× the candidate stage at 30×), a second
    routed all rows through a static broadcast-join split (still 4× on the
    join front).  Only when hot keys exist do their rows pay the
    per-bucket sort; healthy buckets never do."""
    if cap is None:
        return expl
    hot_rows = _hot_bucket_rows(expl, key_cols, cap, max_hot)
    if not hot_rows:
        return expl
    keyed = _bucket_key_expr(key_cols)
    hot_set = [
        "\x00".join(str(r[c]) for c in key_cols) for r in hot_rows
    ]
    is_hot = keyed.isin(hot_set)
    healthy = expl.where(~is_hot)
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    capped = (
        expl.where(is_hot)
        .withColumn("_bucket_rn", F.row_number().over(w))
        .where(F.col("_bucket_rn") <= int(cap))
        .drop("_bucket_rn")
    )
    return healthy.unionByName(capped)


def _with_block_group(
    expl: DataFrame, key_cols: list[str], hot_rows, cap: int
) -> DataFrame:
    """Annotate each hot-bucket row with its block-group count
    ``_g = ceil(n / cap)`` via a broadcast hkey→G map — the shared
    boilerplate of the salted tiers (batch ``_salted_hot_candidates``
    and the mounted delta-asymmetric lane, mount/dedup.py), factored so
    the skew-join discipline cannot silently diverge between them."""
    keyed = _bucket_key_expr(key_cols)
    spark = expl.sparkSession
    g_rows = [
        (
            "\x00".join(str(r[c]) for c in key_cols),
            int(-(-int(r["_bn"]) // int(cap))),  # ceil(n / cap)
        )
        for r in hot_rows
    ]
    gdf = spark.createDataFrame(g_rows, "_hkey string, _g int")
    return expl.withColumn("_hkey", keyed).join(F.broadcast(gdf), "_hkey")


def _salted_hot_candidates(
    expl: DataFrame,
    key_cols: list[str],
    id_col: str,
    hot_rows,
    cap: int,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs for the HOT buckets only, via a
    BLOCKED (salted) self-join — the recall-preserving tier above the cap
    (VERDICT r10 task 2; the MMDS skew-join discipline).

    Every member of a hot bucket is assigned a deterministic block
    ``xxhash64(id) mod G`` with ``G = ceil(n / cap)`` (per bucket, from
    the already-collected sizes), and the bucket's pair space is
    enumerated block-pair by block-pair: the left side replicates each row
    across the G right-block lanes, the right side across the G
    left-block lanes, and the join key carries (bucket, left_block,
    right_block).  Each unordered pair lands in EXACTLY one (bi, bj) task
    (the ``id_a < id_b`` filter keeps one orientation), so:

    - recall is TOTAL — all n²/2 true candidate pairs of the bucket are
      generated and go on to exact Jaccard verification ("verify across
      salts"), where the cap tier dropped members;
    - no single task is quadratic in the bucket — each (bucket, bi, bj)
      join key holds ~cap left × ~cap right rows, i.e. O(cap²) pairs per
      task, G² bounded tasks per bucket, instead of one n²/2 task;
    - the assignment is a pure function of the id — split/partition/
      arrival invariant, like every selection rule in this module.

    The honest cost statement: total verified volume for a hot bucket is
    still its true n²/2 candidates (that IS the recall the caller asked
    for); what the salt buys is that no executor ever materializes the
    bucket quadratically.  Replication factor is G per side — rows touched
    scale n·G = n²/cap, strictly bounded by the pair volume itself."""
    he = _with_block_group(expl, key_cols, hot_rows, cap)
    own = F.pmod(F.xxhash64(F.col(id_col)), F.col("_g")).cast("int")
    lanes = F.explode(F.sequence(F.lit(0), F.col("_g") - 1))
    left = he.select(
        *key_cols,
        F.col(id_col).alias("id_a"),
        own.alias("_bi"),
        lanes.alias("_bj"),
    )
    right = he.select(
        *key_cols,
        F.col(id_col).alias("id_b"),
        lanes.alias("_bi"),
        own.alias("_bj"),
    )
    return (
        left.join(right, [*key_cols, "_bi", "_bj"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: (fingerprint, keeper=min id, group size).  Whitespace/case
    jitter collapses via the normalized fingerprint."""
    fp = df.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint"))
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_docs")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    auto_params: bool = False,
    bucket_cap: int | None = LSH_BUCKET_CAP,
    hot_mode: str = "cap",
) -> DataFrame:
    """MinHash-LSH candidate pairs verified with exact shingle Jaccard.

    bucket_cap: hot-bucket guard (``LSH_BUCKET_CAP``) — each (band_idx,
    band_hash) bucket contributes candidates from at most its ``cap``
    lowest-id members; a boilerplate cluster can no longer turn one bucket
    key into a quadratic join key.  The streaming dual
    (streaming/lshdedup.py) applies the same cap to its keyed state.

    hot_mode: what happens ABOVE the cap (VERDICT r10 task 2).
    ``"cap"`` (default): drop-with-count — overflow members are dropped
    from that bucket deterministically; recall inside hot buckets is
    reduced, cost stays bounded.  ``"salt"``: the recall-preserving tier —
    hot buckets keep EVERY member and enumerate their full pair space
    through a blocked (salted) self-join (``_salted_hot_candidates``):
    per-task volume O(cap²), total volume the bucket's honest n²/2
    verified pairs.  Choose "salt" for boilerplate-heavy LEGITIMATE
    corpora where the hot buckets' dups are wanted (web text with shared
    templates); keep "cap" when a hot bucket is adversarial noise.
    Batch-only — the streaming state keeps the cap contract.

    auto_params=True sizes (n_hashes, bands) from the corpus via
    ``operators/lshparams.py auto_minhash_params`` — the S-curve midpoint
    matched to ``threshold`` with an N-driven rows-per-band floor that
    suppresses random-pair band collisions as the corpus grows; one
    bounded count() when enabled.  The fixed defaults (16, 4) remain the
    small-corpus/registry contract.

    candidate generation: explode band hashes → groupBy-join on
    (band_index, band_hash) → distinct (a,b) pairs; verification: exact
    Jaccard on the pair's shingle sets.  Output: (id_a, id_b, jaccard) with
    jaccard ≥ threshold among LSH candidates (banding may miss pairs — the
    recall/perf trade LSH exists for; same contract as every production
    minhash dedup).

    NULL/whitespace-only documents are excluded from the candidate universe:
    they have no shingle content to be "near-duplicates" BY (m of them would
    otherwise bucket together and verify at jaccard 0/0); exact duplicates of
    empty documents are the exact tier's job (``exact_dedup_groups``).
    """
    df = df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    if auto_params:
        from simsearch_spark.operators.lshparams import auto_minhash_params

        prm = auto_minhash_params(df.count(), float(threshold))
        n_hashes, bands = prm.n_hashes, prm.bands
    # fused Arrow signature kernel (bit-identical to the
    # shingle→hash→sig→band column chain, equality-tested).
    # materialization barrier: the signature table is computed ONCE and
    # reused by candidate generation (twice: both join sides) and
    # verification.  Without it, Spark's Generate stage re-evaluates the
    # whole signature chain outside whole-stage codegen (measured 270s vs
    # 7s at sf0.1).  At corpus scale this frame is the persisted signature
    # *table* every production minhash pipeline stores.
    banded = minhash_banded_frame(df, id_col, text_col, n_hashes, bands, shingle_n).persist()

    # explode to (band_idx, band_hash, id): the only shuffled relation —
    # shingle arrays stay out of the shuffle; verification re-joins by id.
    # persisted: the hot-bucket count pass and BOTH join sides read this
    # narrow triple from cache instead of re-exploding the signature table
    expl = banded.select(
        F.col(id_col), F.posexplode("bands").alias("band_idx", "band_hash")
    ).persist()
    try:
        keys = ["band_idx", "band_hash"]
        if hot_mode not in ("cap", "salt"):
            raise ValueError(f"hot_mode {hot_mode!r} not in ('cap', 'salt')")
        if bucket_cap is None:
            # no cap → no bucket is "hot" under either policy: plain join
            hc, capped = None, expl
        elif hot_mode == "salt":
            # recall-preserving tier: hot buckets pay their true pair
            # volume through the blocked self-join (no drop), healthy
            # buckets keep the plain equi-join; one shared hot-key count
            hot_rows = _hot_bucket_rows(expl, keys, int(bucket_cap))
            if hot_rows:
                hot_set = ["\x00".join(str(r[c]) for c in keys) for r in hot_rows]
                is_hot = _bucket_key_expr(keys).isin(hot_set)
                healthy = expl.where(~is_hot)
                hc = _salted_hot_candidates(
                    expl.where(is_hot), keys, id_col, hot_rows, int(bucket_cap)
                )
                capped = healthy
            else:
                hc, capped = None, expl
        else:  # "cap"
            hc = None
            capped = _cap_lsh_buckets(expl, keys, id_col, bucket_cap)
        left = capped.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
        right = capped.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
        cand = (
            left.join(right, ["band_idx", "band_hash"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        if hc is not None:
            cand = cand.unionByName(hc)
        cand = cand.dropDuplicates(["id_a", "id_b"])
        # Materialize the (bounded) verified pair set eagerly so the two
        # intermediate caches can be dropped HERE instead of accumulating
        # across a multi-query session (ADVICE r10 — leaked persists also
        # trip the CacheManager InMemoryRelation-substitution trap for
        # later plan assertions).  The checkpointed frame is k pairs above
        # threshold — driver-bounded by construction.
        return verify_shingle_pairs(cand, banded, id_col, threshold).localCheckpoint(
            eager=True
        )
    finally:
        expl.unpersist()
        banded.unpersist()


def verify_shingle_pairs(
    cand: DataFrame, banded: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs against a
    (id, shingles, ...) signature frame — the shared tail of the batch LSH
    join and the streaming candidate sink (streaming/lshdedup.py)."""
    shingle_map = banded.select(F.col(id_col), F.col("shingles"))
    ver = (
        cand.join(shingle_map.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(shingle_map.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    ).cast("double")
    return (
        ver.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= float(threshold))
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    bits: int = 32,
    shingle_n: int = 3,
    banded: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs: signature map + pair join with
    ``bit_count(a XOR b) <= r``.

    banded=False: all-pairs join (exact, simple; fine to ~10⁴ rows/side).
    banded=True: the scale path — split each signature into r+1 bit blocks;
    by pigeonhole, hamming ≤ r forces at least one block to match exactly,
    so candidates come from r+1 equi-joins on (block_idx, block_value) and
    only candidates pay the bit_count verify.  Exact (no recall loss),
    verified equal to the all-pairs join in tests.

    The blocks partition [0, bits) EXACTLY with variable widths
    (remainder spread over the first blocks).  A fixed ceil(bits/blocks)
    width would push the last block past the meaningful bit range — the
    char-fold base hash is < 2^30, so such a block is the constant 0 for
    every row and its equi-join silently degenerates to the n² cross
    product (found in round-1 advice).
    """
    # NULL/whitespace-only docs share one degenerate signature and would all
    # pair at hamming 0 — same exclusion contract as minhash_lsh_pairs
    df = df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    # fused pandas signature kernel (bit-identical to the column chain,
    # equality-tested); persist: computed once, read by both join sides
    sh = simhash_frame(df, id_col, text_col, bits, shingle_n).persist()
    if banded:
        n_blocks = max_hamming + 1
        if bits < n_blocks:
            # a zero-width block would mask to the constant 0 and equi-join
            # every row against every row — the exact degeneration the
            # variable-width partition exists to prevent
            raise ValueError(
                f"banded simhash needs bits >= max_hamming + 1 ({bits} < {n_blocks}); "
                "use banded=False for radii that wide"
            )
        base_w, rem = divmod(bits, n_blocks)
        widths = [base_w + 1] * rem + [base_w] * (n_blocks - rem)
        offsets = [sum(widths[:i]) for i in range(n_blocks)]
        blocks = F.array(
            *[
                F.shiftright(F.col("sig"), off).bitwiseAND(F.lit((1 << w) - 1))
                for off, w in zip(offsets, widths)
            ]
        )
        expl = sh.withColumn("blocks", blocks).select(
            F.col(id_col), F.col("sig"), F.posexplode("blocks").alias("blk_idx", "blk_val")
        )
        left = expl.select(
            F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "blk_idx", "blk_val"
        )
        right = expl.select(
            F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "blk_idx", "blk_val"
        )
        # verify hamming BEFORE deduplicating: signatures already travel with
        # the joined row, so the bit_count filter costs nothing extra and the
        # dropDuplicates exchange then shuffles only ACCEPTED pairs (a few
        # hundred) instead of every candidate (O(n²/2^width) rows)
        return (
            left.join(right, ["blk_idx", "blk_val"])
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
            .dropDuplicates(["id_a", "id_b"])
        )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.7, shingle_n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard dedup via the prefix-filtered set-similarity join
    (no LSH recall loss; higher cost — the verification tier)."""
    sh = shingle_frame(df, id_col, text_col, shingle_n)
    out = jaccard_self_join(sh, id_col, "shingles", threshold)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


#: Per-task executor-memory budget for the numpy pair kernels: a tile
#: materializes two (block_rows × dim) float64 matrices plus ~4
#: block_rows²-sized float64-equivalent intermediates (acc, denom, cos,
#: and the mask/outer temporaries — tracemalloc-measured at 1.03× this
#: model across (br, dim) shapes, SCALE.md §r14).  The 128 GiB local
#: sandbox hides overruns a 4 GiB-executor cluster would OOM on
#: (VERDICT r13 task 4), so block sizing is CLAMPED to this budget from
#: (block_rows, dim) BEFORE the shuffle is planned — wide embeddings
#: shrink the tile instead of inflating the task.
PAIR_KERNEL_TASK_BYTES = 512 * 1024 * 1024


def _clamp_block_rows(
    block_rows: int, dim: int, budget_bytes: int = PAIR_KERNEL_TASK_BYTES
) -> int:
    """Largest tile edge whose kernel working set fits the per-task
    budget: 8·(4·br² + 2·br·dim) ≤ budget, solved closed-form.  A floor
    of 16 keeps a degenerate budget from collapsing to per-row tiles
    (correctness holds at any size; the floor bounds shuffle blowup)."""
    import math

    br_max = int((math.sqrt(dim * dim + 4.0 * budget_bytes / 8.0) - dim) / 4.0)
    return max(16, min(int(block_rows), br_max))


def _score_pair_group(pdf, loose: float, diagonal: bool):
    """Shared numpy scoring kernel for one pair group (a block tile or an
    LSH bucket): n·m dot products as ascending rank-1 updates
    (``acc += A[:,j] ⊗ B[:,j]``), the SAME IEEE left-fold the JVM
    ``aggregate(zip_with(...))`` and the DuckDB ``list_reduce`` oracle
    evaluate — raw cosines are bit-identical across engines, so the
    authoritative round-6 threshold can stay JVM-side."""
    import numpy as np
    import pandas as pd

    if diagonal:
        a = b = pdf
    else:
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
    a_ids = a["rid"].to_numpy(dtype=np.int64)
    b_ids = b["rid"].to_numpy(dtype=np.int64)
    if len(a_ids) == 0 or len(b_ids) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "cos_raw": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cos_raw": "float64"}
        )
    a_mat = np.array(list(a["v"]), dtype=np.float64)
    b_mat = np.array(list(b["v"]), dtype=np.float64)
    a_nrm = a["nrm"].to_numpy(dtype=np.float64)
    b_nrm = b["nrm"].to_numpy(dtype=np.float64)
    denom = np.outer(a_nrm, b_nrm)
    # GEMM pre-filter (r14, guide §4.2): ONE BLAS matmul screens the n·m
    # grid instead of dim rank-1 full-matrix updates (each a complete
    # pass over the accumulator — the old kernel's memory traffic was
    # dim× the matrix size).  The gemm cosine differs from the exact
    # ascending-j left fold only by summation associativity, bounded by
    # dim·eps ≈ 1e-14 (Cauchy-Schwarz), so a 1e-9 slack under ``loose``
    # can never drop a pair the exact fold would keep.  Survivors — the
    # near-threshold sliver plus true pairs — get their cosine recomputed
    # with the EXACT fold, so emitted cos_raw values are bit-identical to
    # the JVM ``aggregate(zip_with(...))`` / DuckDB ``list_reduce`` arms
    # (the cross-engine pin the equality tests enforce).
    with np.errstate(divide="ignore", invalid="ignore"):
        cos_mm = np.where(denom == 0, 0.0, (a_mat @ b_mat.T) / denom)
    if diagonal:
        cand = (a_ids[:, None] < b_ids[None, :]) & (cos_mm >= loose - 1e-9)
    else:
        cand = cos_mm >= loose - 1e-9
    ai, bi = np.nonzero(cand)
    if len(ai):
        acc = np.zeros(len(ai))
        for j in range(a_mat.shape[1]):  # exact ascending-index left fold
            acc += a_mat[ai, j] * b_mat[bi, j]
        dsel = denom[ai, bi]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(dsel == 0, 0.0, acc / dsel)
        keep = cos >= loose
        ai, bi, cos = ai[keep], bi[keep], cos[keep]
    else:
        cos = np.zeros(0)
    if diagonal:
        lo, hi = a_ids[ai], b_ids[bi]
    else:
        lo = np.minimum(a_ids[ai], b_ids[bi])
        hi = np.maximum(a_ids[ai], b_ids[bi])
    return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_raw": cos})


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    blocked: bool = True,
    block_rows: int = 4096,
    n_rows: int | None = None,
    pruned: bool = False,
    n_planes: int = 16,
    band_bits: int = 4,
    planes_seed: int = 7,
    center: bool = False,
    auto_params: bool = False,
    bucket_cap: int | None = LSH_BUCKET_CAP,
    task_mem_bytes: int = PAIR_KERNEL_TASK_BYTES,
) -> DataFrame:
    """Embedding near-dup pairs by cosine ≥ threshold.

    bucket_cap (pruned route only): hot-bucket guard (``LSH_BUCKET_CAP``)
    — each (band_idx, band_key) bucket scores at most its ``cap``
    lowest-id members, so an adversarial near-constant corpus (every sign
    bit equal → one bucket) is bounded at cap²/2 pairs in a cap-row task
    instead of one quadratic straggler.  Overflow members are dropped from
    that bucket (drop-with-count; see LSH_BUCKET_CAP).  The streaming dual
    applies the same cap to its keyed state.

    blocked=True (default): distributed block-tiled pair join.  Rows are
    hashed into B ≈ n/block_rows blocks; each unordered block pair (p ≤ q)
    is one ``applyInPandas`` group scored by the shared numpy kernel
    (`_score_pair_group` — bit-identical fold across engines).  Driver
    memory is O(1); executor memory per task is O(block_rows·dim +
    block_rows²).  Each row is shuffled B times (block-nested-loop
    replication) — EXACT, the declared-query path.

    pruned=True: the corpus-scale route — banded sign-LSH candidate
    pruning COMPOSED with the same scoring kernel.  Each row gets an
    `n_planes`-bit hyperplane signature (operators/ann.py LCG planes);
    the signature is split into ``n_planes // band_bits`` bands and a pair
    is scored only when it agrees exactly on at least one band (the
    MinHash-LSH banding construction applied to sign bits).  Shuffle moves
    (band_idx, band_key, id, vec) — bands× replication instead of blocks×,
    and random pairs are pruned at rate ≈ 1-(1-2^-band_bits)^bands while
    a cos-s pair survives with p = 1-acos(s)/π per plane, band recall
    1-(1-p^band_bits)^bands.  RECALL-LOSSY like MinHash LSH: tune
    n_planes/band_bits to the threshold (defaults suit thresholds ≥0.9;
    low thresholds need wider probes).  A pair matching several bands is
    scored per band group with an identical raw cosine, so the final
    ``distinct()`` is exact.  Hot buckets (near-identical corpora) bound
    by band_key cardinality; tile the bucket interior with the blocked
    kernel if a single key overflows a task.

    blocked=False (and not pruned): pure column-expression pair join (the
    cross-engine reference path; kept for equality testing).

    n_rows: optional row-count hint for sizing the block tiling.  At corpus
    scale the pre-count is itself a full scan before any work — pass
    catalog/statistics counts (or any upper bound; block sizing only needs
    the right magnitude) to skip it.  Default: one bounded count().

    Norms are always precomputed per row (never per pair) JVM-side with the
    same fold as the oracle.
    """
    # cast float vectors to double ONCE here: the pair stage must not
    # re-cast element-wise for every pair
    normed = df.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
        measures.l2_norm(F.col(vec_col)).alias("nrm"),
    ).persist()
    # pre-filter margin must cover the round-half-width: raw cosines in
    # [threshold - 5e-7, threshold) round UP to the threshold and must
    # survive to the authoritative round-6 filter (ADVICE r01)
    loose = float(threshold) - 1e-6

    if center and not pruned:
        raise ValueError(
            "center=True only affects the pruned sign-LSH route's hashing; "
            "the blocked/plain paths score raw vectors and need no centering"
        )
    if pruned:
        from simsearch_spark.operators.ann import lcg_hyperplanes, lsh_band_keys

        # planes are generated for the table's vector width (1-row probe)
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            return df.sparkSession.createDataFrame([], "id_a long, id_b long, cos_sim double")
        dim = int(first.d)
        if auto_params:
            # mount-time sizing profile (operators/lshparams.py): band_bits
            # ~log2(N) keeps random candidates-per-row flat; bands widened
            # for recall ≥0.95 at the threshold.  One bounded count when no
            # statistics hint is passed (same contract as the block tiling)
            from simsearch_spark.operators.lshparams import auto_sign_lsh_params

            n_est = n_rows if n_rows is not None else df.count()
            prm = auto_sign_lsh_params(n_est, float(threshold))
            n_planes, band_bits = prm.n_planes, prm.band_bits
        planes = lcg_hyperplanes(dim, n_planes, seed=planes_seed)
        n_bands = max(1, n_planes // band_bits)
        hash_vec = F.col("v")
        if center:
            # ONE-SIDED data (e.g. non-negative luminance/count features)
            # collapses sign-LSH: every vector lives in one orthant, so a
            # random hyperplane through the origin gives near-constant
            # signs and a handful of hot buckets — measured 6 s → 208 s at
            # 10× on image features (quadratic bucket interiors).  Subtract
            # the corpus per-dimension mean BEFORE hashing only: buckets
            # balance (~50/50 signs), while SCORING stays on the raw
            # vectors so the cosine semantics are untouched.  Candidate
            # recall becomes heuristic rather than p=1-θ/π exact — the
            # planted-pair recall test pins it for the image route.
            mean_row = normed.agg(
                F.array(*[F.avg(F.col("v")[i]) for i in range(dim)]).alias("m")
            ).first()
            # avg() is NULL for an empty frame or an all-NULL dimension;
            # centering by 0.0 there degrades to plain sign-LSH instead of
            # raising TypeError on the driver (bounded-behavior contract)
            mean_lit = F.lit(
                [float(x) if x is not None else 0.0 for x in mean_row["m"]]
            )
            hash_vec = F.zip_with(F.col("v"), mean_lit, lambda x, m: x - m)
        # per-band INDEPENDENT 63-bit keys (ann.py lsh_band_keys) — value-
        # identical to slicing one packed signature when bands·band_bits
        # ≤ 63 (bit i of a bucket is plane i), and the construction that
        # lets band_bits keep growing ~log2(N) past the old single-key cap
        # (auto_sign_lsh_params sizes it; SCALE.md r9)
        keys = lsh_band_keys(hash_vec, planes, band_bits)
        tagged = normed.withColumn("keys", keys)
        banded = tagged.select(
            F.col(id_col).alias("rid"),
            "v",
            "nrm",
            F.posexplode("keys").alias("band_idx", "band_key"),
        )

        def score_bucket(pdf):
            # hot-bucket cap applied INSIDE the kernel: the groupBy already
            # delivers the whole bucket to one task, so truncating to the
            # cap LOWEST rids here kills the quadratic pair work with ZERO
            # extra plan passes (a pre-pass count/window costs a full
            # re-hash of the corpus on this front — measured 1.4×).  The
            # residual exposure is the O(s·dim) group materialization of a
            # pathological bucket, vs the O(s·dim + s²) task it replaces.
            if bucket_cap is not None and len(pdf) > bucket_cap:
                pdf = pdf.sort_values("rid").head(bucket_cap)
            return _score_pair_group(pdf, loose, diagonal=True)

        raw = banded.groupBy("band_idx", "band_key").applyInPandas(
            score_bucket, "id_a long, id_b long, cos_raw double"
        )
        return (
            raw.distinct()  # identical raw cosine in every matching band
            .withColumn("cos_sim", F.round("cos_raw", 6))
            .where(F.col("cos_sim") >= float(threshold))
            .select("id_a", "id_b", "cos_sim")
        )

    if blocked:
        # bounded driver work: ONE scalar (row count) sizes the tiling —
        # skipped entirely when the caller passes a statistics-based hint
        if n_rows is None:
            n_rows = normed.count()
        # auto-clamp the tile edge to the per-task memory budget from the
        # vector width (one 1-row probe; VERDICT r13 task 4) — a wide
        # embedding would otherwise push the kernel's working set past
        # what a small-executor cluster can hold
        probe = df.select(F.size(vec_col).alias("d")).first()
        dim = int(probe.d) if probe is not None and probe.d is not None else 0
        block_rows = _clamp_block_rows(block_rows, dim, task_mem_bytes)
        n_blocks = max(1, -(-n_rows // int(block_rows)))
        blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
        tagged = normed.withColumn("blk", blk)
        # row with block b joins tile (pa=b, pb=q) as side A for q ≥ b, and
        # tile (pa=p, pb=b) as side B for p < b — every unordered row pair
        # lands in exactly one tile (diagonal tiles carry side A only)
        side_a = tagged.select(
            F.col("blk").alias("pa"),
            F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1))).alias("pb"),
            F.lit("a").alias("side"),
            F.col(id_col).alias("rid"),
            "v",
            "nrm",
        )
        side_b = tagged.where(F.col("blk") > 0).select(
            F.explode(F.sequence(F.lit(0), F.col("blk") - 1)).alias("pa"),
            F.col("blk").alias("pb"),
            F.lit("b").alias("side"),
            F.col(id_col).alias("rid"),
            "v",
            "nrm",
        )
        tiles = side_a.unionByName(side_b)

        def score_tile(pdf):
            # diagonal is a property of the tile COORDINATES, never of side-b
            # emptiness: an off-diagonal tile whose q-block happens to be
            # empty must stay empty, not re-score block p against itself
            # (that would duplicate every pair tile (p,p) already emitted).
            # Diagonal tiles carry side A only, so diagonal=True scoring the
            # whole group is exactly the old a-vs-a case.
            diagonal = bool(len(pdf) and pdf["pa"].iat[0] == pdf["pb"].iat[0])
            return _score_pair_group(pdf, loose, diagonal=diagonal)

        raw = tiles.groupBy("pa", "pb").applyInPandas(
            score_tile, "id_a long, id_b long, cos_raw double"
        )
        return (
            raw.withColumn("cos_sim", F.round("cos_raw", 6))
            .where(F.col("cos_sim") >= float(threshold))
            .select("id_a", "id_b", "cos_sim")
        )

    a = normed.select(F.col(id_col).alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a"))
    b = normed.select(F.col(id_col).alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    denom = F.col("n_a") * F.col("n_b")
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(
        measures.dot_product(F.col("v_a"), F.col("v_b")) / denom
    )
    return (
        pairs.withColumn("cos_sim", F.round(cos, 6))
        .where(F.col("cos_sim") >= float(threshold))
        .select("id_a", "id_b", "cos_sim")
    )


def clustered_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    threshold: float = 0.9,
    block_rows: int = 4096,
    task_mem_bytes: int = PAIR_KERNEL_TASK_BYTES,
) -> DataFrame:
    """Within-cluster cosine near-dup pairs — the SemDeDup pair stage.

    Semantically ``a JOIN b ON cluster AND id_a < id_b WHERE cos ≥ t``,
    but the physical plan survives scale where the naive cluster-keyed
    self-join does not: a plain ``join(b, cluster_col)`` shuffles the
    corpus onto k reducers (maximal skew by construction when k is small)
    and materializes O((N/k)²) pairs per reducer.  Here each cluster is
    independently block-tiled exactly like `embedding_cosine_pairs`
    blocked=True — per-cluster block count Bc = ceil(|c|/block_rows), the
    shuffle key is (cluster, pa, pb) with Σ Bc² keys, and every task
    scores at most block_rows² pairs regardless of how fat its cluster
    is.  Per-cluster sizes come from ONE k-row aggregate broadcast back.

    Scoring reuses `_score_pair_group`, so raw cosines are bit-identical
    to the JVM/DuckDB fold and the result set equals the naive join's —
    equality-tested in tests/test_cluster.py."""
    normed = df.select(
        F.col(cluster_col).alias("cl"),
        F.col(id_col).alias("rid"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
        measures.l2_norm(F.col(vec_col)).alias("nrm"),
    )
    loose = float(threshold) - 1e-6
    # auto-clamp the tile edge to the per-task budget from the vector
    # width before the per-cluster block counts are derived (r13 task 4)
    probe = df.select(F.size(vec_col).alias("d")).first()
    dim = int(probe.d) if probe is not None and probe.d is not None else 0
    block_rows = _clamp_block_rows(block_rows, dim, task_mem_bytes)
    sizes = (
        normed.groupBy("cl")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("nb", F.ceil(F.col("cnt") / F.lit(int(block_rows))).cast("int"))
        .select("cl", "nb")
    )
    tagged = normed.join(F.broadcast(sizes), "cl").withColumn(
        "blk", F.pmod(F.xxhash64(F.col("rid")), F.col("nb")).cast("int")
    )
    side_a = tagged.select(
        "cl",
        F.col("blk").alias("pa"),
        F.explode(F.sequence(F.col("blk"), F.col("nb") - 1)).alias("pb"),
        F.lit("a").alias("side"),
        "rid",
        "v",
        "nrm",
    )
    side_b = tagged.where(F.col("blk") > 0).select(
        "cl",
        F.explode(F.sequence(F.lit(0), F.col("blk") - 1)).alias("pa"),
        F.col("blk").alias("pb"),
        F.lit("b").alias("side"),
        "rid",
        "v",
        "nrm",
    )
    tiles = side_a.unionByName(side_b)

    def score_tile(pdf):
        diagonal = bool(len(pdf) and pdf["pa"].iat[0] == pdf["pb"].iat[0])
        return _score_pair_group(pdf, loose, diagonal=diagonal)

    raw = tiles.groupBy("cl", "pa", "pb").applyInPandas(
        score_tile, "id_a long, id_b long, cos_raw double"
    )
    return (
        raw.withColumn("cos_sim", F.round("cos_raw", 6))
        .where(F.col("cos_sim") >= float(threshold))
        .select("id_a", "id_b", "cos_sim")
    )


#: driver-tier cap for connected_components: pair graphs at or below this
#: many edge rows are labeled by a driver union-find (one LIMIT-probe job)
#: instead of the iterative label-propagation loop (~3 jobs/round).  The
#: dup graph is dedup-rate-sized, orders below corpus size; 2^18 rows of
#: (long, long) is ~4 MB on the driver.  Above the cap the distributed
#: loop runs unchanged — the 100 TB tier.
DRIVER_CC_MAX_EDGES = 1 << 18


def _cc_driver_rows(rows) -> list[tuple]:
    """Union-find labeling of a collected edge list: (id, component) with
    component = min id reachable through the graph — EXACTLY the
    distributed loop's fixpoint (min over a connected set is independent
    of traversal/union order, so the two arms agree bitwise)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, d in rows:
        if s not in parent:
            parent[s] = s
        if d not in parent:
            parent[d] = d
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    comp_min: dict = {}
    for node in parent:
        r = find(node)
        m = comp_min.get(r)
        if m is None or node < m:
            comp_min[r] = node
    return [(node, comp_min[find(node)]) for node in sorted(parent)]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    broadcast_threshold: int = 2_000_000,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Transitive near-dup clusters from a pair relation: (id, component)
    with component = the smallest id reachable through the pair graph —
    the step every dedup pipeline needs between pair generation and keeper
    selection (pairs (1,2) and (2,3) are ONE group keeping doc 1, which no
    per-pair rule can decide).

    Algorithm: distributed hash-min label propagation with a pointer-jump
    shortcut each round (the hooking + pointer-jumping shape of
    large-star/small-star CC).  Init fuses the first hop — label =
    min(self, neighbors) in the edge aggregation — so the pair-shaped
    components that dominate near-dup graphs converge in a single round.
    Per round: (1) every node takes the min label across its neighbors,
    (2) labels chase their own label's label (path halving), so convergence
    is O(log diameter) rounds, not O(diameter).  The driver carries one
    monotone scalar (Σ labels, strictly decreasing until the fixpoint) per
    round for the convergence test; labels are non-increasing per node, so
    sum-equality IS per-node fixpoint.  Raises after ``max_iters`` rounds
    rather than returning a partially-merged clustering.

    At 100 TB the pair relation is the output of the banded/tiled tiers
    above (already bucketed); the label frame shuffles on id each round —
    the standard iterative-CC cost, bounded by dup-graph size, never corpus
    size.  When the dup graph is broadcast-sized (node count from the init
    action ≤ ``broadcast_threshold``, ~16 B/row) the per-round joins hint
    `broadcast` on the label side, collapsing each round to one map stage —
    the node count is already on the driver, so the choice costs nothing;
    above the threshold the same loop runs as key-partitioned shuffle
    joins.

    DRIVER TIER (r14, guide §1.2 step 1): the dup graph is dedup-rate-
    sized — at or below ``driver_max_edges`` pair rows (LIMIT-probed in
    one job), a driver union-find labels it with the IDENTICAL
    min-reachable-id fixpoint (order-independent, so the tiers agree
    bitwise — pinned in tests/test_dedup_ann.py::
    test_cc_driver_tier_equals_distributed_tier), replacing ~3 driver
    jobs per propagation round.  Integral-id graphs only (the callers'
    shape); NULL ids or overflow fall through to the distributed loop.
    """
    proj = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
    dts = dict(proj.dtypes)
    if driver_max_edges > 0 and {dts["s"], dts["d"]} <= {
        "tinyint", "smallint", "int", "bigint"
    }:
        probe = proj.limit(driver_max_edges + 1).collect()
        if len(probe) <= driver_max_edges and not any(
            r["s"] is None or r["d"] is None for r in probe
        ):
            # schema from the distributed arm's OWN analysis (no action),
            # so the two tiers can never diverge on output dtypes
            out_schema = (
                proj.groupBy(F.col("s").alias("id"))
                .agg(F.least(F.min("d"), F.col("s")).alias("component"))
                .schema
            )
            data = _cc_driver_rows([(r["s"], r["d"]) for r in probe])
            return pairs.sparkSession.createDataFrame(data, out_schema)
    edges = (
        pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
        .unionByName(pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d")))
        .distinct()
        .persist()
    )
    # Fused first hop: start from min(self, all neighbors), not self.
    # localCheckpoint (not persist) each round: an iterative plan references
    # its previous round twice (union + self-join), so without lineage
    # truncation the LOGICAL plan doubles per round — exponential plan-string
    # generation in AQE long before any data problem.  localCheckpoint cuts
    # the plan at materialized partitions; on a cluster prefer a reliable
    # checkpoint dir if executor loss mid-loop matters.
    labels = (
        edges.groupBy(F.col("s").alias("id"))
        .agg(F.least(F.min("d"), F.col("s")).alias("label"))
        .localCheckpoint()
    )
    stats = labels.agg(F.sum("label").alias("s"), F.count(F.lit(1)).alias("n")).first()
    prev_sum, n_nodes = stats["s"], stats["n"]
    if prev_sum is None:  # no pairs at all
        edges.unpersist()
        return labels.select("id", "label")
    bc = F.broadcast if n_nodes <= broadcast_threshold else (lambda df: df)
    converged = False
    for _ in range(max_iters):
        # (1) neighbor min: labels flow one hop along edges
        prop = edges.join(bc(labels.withColumnRenamed("id", "s")), "s").select(
            F.col("d").alias("id"), "label"
        )
        stepped = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        # (2) pointer jump: chase label -> label's label (path halving);
        # every label is itself a node id, so the self-join always resolves
        jumped = (
            stepped.alias("x")
            .join(
                bc(stepped.select(F.col("id").alias("label"), F.col("label").alias("ll"))),
                "label",
            )
            .select("id", F.col("ll").alias("label"))
            .localCheckpoint()
        )
        new_sum = jumped.agg(F.sum("label")).first()[0]
        labels = jumped
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "the pair graph is deeper than any near-dup clustering should be"
        )
    out = labels.select("id", F.col("label").alias("component"))
    return out
