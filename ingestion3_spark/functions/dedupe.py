"""Document deduplication operators for the training-data pipeline.

All distributed, expression-first implementations (no driver-side loops):

- exact dedup           — hash-groupBy on a content fingerprint
- n-gram Jaccard        — shingle explode + pair-join + set overlap
- MinHash + LSH         — k permutations via xxhash64(seeded), banding,
                          bucket self-join (candidate pairs without O(n^2))
- SimHash               — bitwise majority of per-token hashes, hamming pairs

The reference only dedups whole records by id (``utils/NaraMergeUtil.scala:
129-135``) and per-field arrays (``enrichments/normalizations/
Deduplication.scala:16-75``); near-dup detection is a new, scale-first
capability of this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ingestion3_spark.functions.text import normalize_text, words


# ------------------------------------------------------------------ exact
def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) docs: (fp, n_docs, doc_ids)."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def drop_exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per fingerprint (deterministic winner)."""
    fp = df.withColumn("_fp", F.md5(normalize_text(text_col)))
    keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, ["_fp", id_col], "left_semi").drop("_fp")


# ------------------------------------------------------- portable 64-bit hash
def portable_hash64(col):
    """Engine-portable 64-bit hash: first 8 md5 bytes, little-endian, as a
    signed long. Bit-identical to DuckDB's ``md5_number_upper`` (signed
    view), so sketches built on it keep a cross-engine SQL oracle —
    xxhash64 (the fast default) has no DuckDB counterpart. Cost: one
    MessageDigest per value (JVM-side, no Python)."""
    hx = F.md5(F.col(col) if isinstance(col, str) else col.cast("string"))
    # little-endian: reverse the byte pairs of each 8-hex-char half
    def le32(start):  # 4 bytes from hex offset `start`, little-endian
        rev = F.concat(*[F.substring(hx, start + 6 - 2 * j, 2) for j in range(4)])
        return F.conv(rev, 16, 10).cast("long")
    return F.shiftleft(le32(9), 32).bitwiseOR(le32(1))


# ---------------------------------------------------------------- shingles
def shingles(col, n: int = 3):
    """Word n-gram shingle array (distinct)."""
    ws = words(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0)))
    return F.when(
        F.size(ws) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(ws, i + 1, n), " "))
        ),
    ).otherwise(F.array(F.array_join(ws, " ")))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 10_000,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold.

    Exact but candidate-limited: pairs are generated ONLY for docs sharing at
    least one shingle (explode + self-join on shingle, then intersection
    counts via groupBy) — never a full cross join. At 100TB the shingle join
    is the shuffle; shingle strings are replaced by xxhash64 values to keep
    exchange rows narrow.

    ``max_shingle_df`` drops shingles occurring in more than that many docs
    BEFORE the self-join: a boilerplate shingle shared by k docs otherwise
    contributes k^2 join rows — the quadratic hot key that kills the plan
    at scale. Sizes (`sz`) still count every shingle, so for a true pair
    the computed Jaccard can only DROP when a shared stop-shingle is
    capped — i.e. the >= threshold guarantee keeps precision (no false
    pairs) and trades bounded recall on pairs whose overlap is mostly
    boilerplate (recall is exact whenever doc frequency of every shared
    shingle <= the cap). Set None to disable.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    ).select("id", F.xxhash64("shingle").alias("sh"))
    # (id, int64) is narrow — persisting it is cheap and stops the self-join
    # + sizes agg from re-running the shingle expression three times (the
    # reference's no-cache rule, NaraMergeUtil.scala:99-117, is about WIDE
    # payload rows; sketch intermediates are the opposite shape)
    sh = sh.persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    joinable = sh
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("sh").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        joinable = sh.join(F.broadcast(hot), "sh", "left_anti")
    pairs = (
        joinable.alias("a")
        .join(joinable.alias("b"), "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------------- minhash
def shingle_hashes(col, shingle_n: int = 3, portable: bool = False):
    """Each distinct shingle hashed ONCE to 64 bits (JVM-side).

    Downstream sketches (minhash/simhash) work on these longs — never
    re-hashing the strings k times. ``portable=True`` swaps xxhash64 for
    the md5-based :func:`portable_hash64` so the whole sketch keeps a
    DuckDB oracle (the correctness-gate configuration); the default stays
    xxhash64 (~10x cheaper per shingle)."""
    hash_fn = portable_hash64 if portable else F.xxhash64
    return F.transform(shingles(col, shingle_n), lambda s: hash_fn(s))


def _splitmix_mins(hashes, num_hashes: int):
    """numpy splitmix64-style mixer: k derived hashes per input, min per k.

    Vectorized across the WHOLE Arrow batch (flatten all rows' hash arrays,
    one (m x k) mix, per-row mins via np.minimum.reduceat) — the per-row
    Python loop was ~2 ms/row of interpreter overhead, which dominated the
    sketch queries. Chunk boundaries are by cumulative ELEMENT count (sum
    of array lens), not row count, so the (sum_lens x k) temp is actually
    bounded (~256 MB) for long-document batches too."""
    import numpy as np
    import pandas as pd

    seeds = (np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    arrs = hashes.tolist()
    lens = np.array([0 if a is None else len(a) for a in arrs], dtype=np.int64)
    out: list = [None] * len(arrs)
    nz_idx = np.nonzero(lens > 0)[0]
    max_elems = max(1, (1 << 25) // max(num_hashes, 1))  # ~32M mixed cells
    cum = np.cumsum(lens[nz_idx])
    bounds = [0]
    while bounds[-1] < len(nz_idx):
        lo = bounds[-1]
        base = cum[lo - 1] if lo else 0
        hi = int(np.searchsorted(cum, base + max_elems, side="left")) + 1
        bounds.append(min(max(hi, lo + 1), len(nz_idx)))
    for c0, c1 in zip(bounds[:-1], bounds[1:]):
        idx = nz_idx[c0:c1]
        flat = np.concatenate([np.asarray(arrs[i], dtype=np.int64) for i in idx]).astype(np.uint64)
        h = flat[:, None] ^ seeds[None, :]
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
        starts = np.concatenate([[0], np.cumsum(lens[idx])[:-1]]).astype(np.int64)
        mins = np.minimum.reduceat(h, starts, axis=0).astype(np.int64)
        for j, i in enumerate(idx):
            out[i] = mins[j]
    return pd.Series(out)


def minhash_signature_udf(num_hashes: int = 64):
    """Pandas UDF: array<long> shingle hashes -> array<long> signature."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def sig(hashes):  # type: ignore[no-untyped-def]
        return _splitmix_mins(hashes, num_hashes)

    return sig


def minhash_signature(col, num_hashes: int = 64, shingle_n: int = 3,
                      portable: bool = False):
    """MinHash signature over word shingles.

    Hybrid plan: shingle strings hashed once JVM-side (xxhash64, or the
    md5-based portable hash), then the k permutations are a numpy
    splitmix64 mix inside an Arrow-batched pandas UDF — O(n_shingles x k)
    integer SIMD, no per-bit expression blowup (the pure-expression form
    generated 2MB task binaries and ran ~50x slower)."""
    return minhash_signature_udf(num_hashes)(shingle_hashes(col, shingle_n, portable))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs agreeing on ALL rows of
    at least one band. rows-per-band = num_hashes/bands; candidates are then
    typically verified with `ngram_jaccard_pairs` or signature similarity.

    ``portable=True`` (the correctness-gate configuration) uses the
    md5-based hash family AND verifies band equality on the actual
    signature slices after the bucket join, so the result is exactly
    "pairs agreeing on >=1 band" (no bucket-hash false positives) and
    matches the DuckDB all-pairs oracle.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = df.select(F.col(id_col).alias("id"),
                    minhash_signature(F.col(text_col), num_hashes, shingle_n,
                                      portable).alias("sig"))
    # narrow (id, k longs) — persist so the banding self-join computes the
    # shingle+UDF signature pass once, not once per join side
    sig = sig.persist()
    bucket_hash = portable_hash64 if portable else F.xxhash64
    banded = sig.select(
        "id",
        F.col("sig"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    bucket_hash(
                        F.concat_ws(",", *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ])
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    joined = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
    )
    if portable:
        # exact band equality — bucket-hash collisions cannot add pairs
        joined = joined.filter(
            F.slice(F.col("a.sig"), F.col("band") * rows_per_band + 1, rows_per_band)
            == F.slice(F.col("b.sig"), F.col("band") * rows_per_band + 1, rows_per_band)
        )
    return (
        joined.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_similarity(df_pairs: DataFrame, sig_df: DataFrame) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature positions."""
    a = sig_df.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sig_df.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        df_pairs.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                            lambda v: v)) / F.size("sig_a"),
        )
        .select("id_a", "id_b", "est_jaccard")
    )


# ------------------------------------------------------------------ simhash
def simhash64_udf():
    """Pandas UDF: array<long> shingle hashes -> 64-bit SimHash (long)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bits_idx = np.arange(64, dtype=np.uint64)

    @pandas_udf("long")
    def sim(hashes):  # type: ignore[no-untyped-def]
        # whole-batch vectorization (flatten + reduceat), same math as the
        # per-row form but without ~2 ms/row of interpreter overhead
        arrs = hashes.tolist()
        lens = np.array([0 if a is None else len(a) for a in arrs], dtype=np.int64)
        out = np.zeros(len(arrs), dtype=np.int64)
        nz_idx = np.nonzero(lens > 0)[0]
        # chunk by cumulative ELEMENT count so the (sum_lens x 64) bits
        # temp stays bounded (~256 MB) regardless of per-row array length
        max_elems = 1 << 19
        cum = np.cumsum(lens[nz_idx])
        bounds = [0]
        while bounds[-1] < len(nz_idx):
            lo = bounds[-1]
            base = cum[lo - 1] if lo else 0
            hi = int(np.searchsorted(cum, base + max_elems, side="left")) + 1
            bounds.append(min(max(hi, lo + 1), len(nz_idx)))
        for c0, c1 in zip(bounds[:-1], bounds[1:]):
            idx = nz_idx[c0:c1]
            flat = np.concatenate(
                [np.asarray(arrs[i], dtype=np.int64) for i in idx]
            ).astype(np.uint64)
            bits = ((flat[:, None] >> bits_idx[None, :]) & np.uint64(1)).astype(np.int64)
            starts = np.concatenate([[0], np.cumsum(lens[idx])[:-1]]).astype(np.int64)
            sums = np.add.reduceat(bits, starts, axis=0)  # k x 64
            maj = (sums * 2) > lens[idx][:, None]
            words = (maj.astype(np.uint64) * (np.uint64(1) << bits_idx[None, :])).sum(
                axis=1, dtype=np.uint64
            )
            out[idx] = words.astype(np.int64)
        return pd.Series(out, dtype="int64")

    return sim


def simhash64(col, shingle_n: int = 2, portable: bool = False):
    """64-bit SimHash: per-bit majority vote over shingle hashes.

    Hybrid plan like minhash: strings hashed once JVM-side, bit-majority in
    a numpy pandas UDF (the 64-pass expression form generated huge codegen
    and ran ~50x slower)."""
    return simhash64_udf()(shingle_hashes(col, shingle_n, portable))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, pigeonhole-blocked.

    Pigeonhole: two 64-bit hashes within hamming distance h agree exactly
    on >=1 of any (h+1) disjoint chunks, so blocking uses ``max_hamming+1``
    chunks (round-1 bug: a fixed 4-chunk split silently lost every pair
    with 4 <= distance <= 8 when called with max_hamming=8). Chunk widths
    are floor/ceil(64/(h+1)); the join is on (chunk, key), exact hamming is
    verified via bit_count(xor). Full recall at any ``max_hamming`` <= 63.
    """
    n_chunks = min(max_hamming + 1, 64)
    base, extra = divmod(64, n_chunks)
    # chunk c covers [off_c, off_c + w_c) with w_c = base+1 for c < extra
    offs, widths = [], []
    o = 0
    for c in range(n_chunks):
        w = base + (1 if c < extra else 0)
        offs.append(o)
        widths.append(w)
        o += w
    h = df.select(F.col(id_col).alias("id"),
                  simhash64(F.col(text_col), shingle_n, portable).alias("h"))
    # narrow (id, int64) — persist so the chunk self-join computes the
    # shingle+UDF simhash pass once, not once per join side
    h = h.persist()
    chunks = h.select(
        "id", "h",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned("h", offs[c])
                .bitwiseAND(F.lit((1 << widths[c]) - 1)).alias("key"),
            )
            for c in range(n_chunks)
        ])).alias("ck"),
    ).select("id", "h", "ck.chunk", "ck.key")
    return (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------- embedding-cosine near-dup
def sign_bucket(vec_col, n_dims: int = 8):
    """Deterministic LSH bucket: sign pattern of the first ``n_dims`` dims.

    Axis-aligned random-hyperplane LSH with fixed (identity) planes — fully
    reproducible in any engine (no seeded RNG), so the near-dup operator
    keeps a cross-engine oracle. At scale the bucket key is what turns the
    O(n^2) pair space into an equi-join shuffle keyed on 2^n_dims buckets.
    """
    return F.concat(*[
        F.when(F.element_at(vec_col, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(1, n_dims + 1)
    ])


def embed_near_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
    sign_dims: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, sign-bucket blocked.

    The dedup-family counterpart of similarity.lsh_topk: candidate pairs
    share a sign bucket (equi-join — no crossJoin), then exact cosine in
    double precision filters at ``threshold``. Output (id_a, id_b, cos).

    Scale: the join shuffles on the bucket key only; per-bucket pair count
    is (n/2^d)^2 per bucket, tunable via ``sign_dims``. Hot buckets (skewed
    sign patterns) are handled by AQE skew-join splitting since this is a
    plain equi-join.
    """
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_bucket(F.col(vec_col), sign_dims).alias("sb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm_a = F.aggregate(F.col("a.v"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    norm_b = F.aggregate(F.col("b.v"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return (
        b.alias("a")
        .join(b.alias("b"), "sb")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot / (F.sqrt(norm_a) * F.sqrt(norm_b))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
