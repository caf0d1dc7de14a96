"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard (training-data pipeline extensions; task
brief "Beyond the reference's own operators").

Cross-engine determinism: every hash is an md5 *hex string* (lowercase)
— identical in Spark (`F.md5`) and DuckDB (`md5`) — so each operator
has an exact ANSI-SQL oracle twin in ``__spark_entry__.py``. Min-hash
minima are lexicographic minima over hex strings: order-independent,
shuffle-safe.

Scale notes:
- exact dedup: one groupBy on md5(text) — map-side partial agg.
- MinHash: one md5 per shingle; the K=128 signature is derived by
  double hashing (Kirsch–Mitzenmacher: h_i = h1 + i·h2 mod 2^32), so
  the signature costs one hash + K integer ops, all whole-stage
  codegen. K mins in ONE groupBy (single shuffle); LSH banding (32
  bands of 4) turns O(n²) pair search into a self-equi-join on
  (band_idx, band_hash); a band-bucket size cap drops degenerate
  boilerplate buckets before they explode the join; AQE skew-join
  handles residual skew.
- cap enforcement is a groupBy-count -> broadcast *anti-join* of the
  over-cap keys, NEVER a ``count().over(Window.partitionBy(key))``:
  a window partition is one task, so the 10^7-member boilerplate
  bucket the cap exists to drop would first have to be materialized
  in a single task's state — the exact straggler the guard prevents.
  The over-cap key set is tiny by construction (each key represents
  > cap rows), so the anti-join side always broadcasts; the
  groupBy-count itself is map-side-combinable.
- SimHash: explode(token)×explode(bit) — bounded by N_BITS; emits one
  signature row per doc; pairs found by pigeonhole block join (any
  pair within Hamming distance < n_blocks shares one identical block).
- n-gram Jaccard: distinct shingle self-join with a document-frequency
  cap — shingles appearing in more than max_df docs (boilerplate) are
  dropped BEFORE the self-join, preventing the df² pair blowup.
- clusters: union-find over candidate pairs via iterative min-label
  propagation (converges in O(cluster diameter) rounds; dedup clusters
  are shallow). At 10^12 docs prefer the alternating large-star/
  small-star formulation — same join/groupBy primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .tfidf import tokens_col

MINHASH_K = 128  # signature length (production operating point)
LSH_BAND_SIZE = 4  # 32 bands of 4
LSH_BUCKET_CAP = 100  # max docs per band bucket before it is dropped
NGRAM_MAX_DF = 100  # shingle document-frequency cap for the jaccard join
SIMHASH_BITS = 32
_MH_MOD = 1 << 32


def shingles_col(text_col: str = "text", k: int = 3):
    """k-word shingles as space-joined strings from the sklearn-parity
    tokenizer; docs shorter than k words get their full token join.

    Linear construction: k aligned slices of the token array zipped
    with pairwise concat — O(k·T) per doc. (The obvious
    ``transform(sequence(...), i -> slice(toks, i+1, k))`` form
    re-slices per element: O(T²) in document length, measured as
    minutes per 100 KB web page — the same quadratic-lambda trap as
    the repetition top-word fold.)"""
    t = tokens_col(text_col)
    n = F.size(t) - (k - 1)  # shingle count when size >= k

    def _windows():
        sh = F.slice(t, 1, n)
        for j in range(1, k):
            sh = F.zip_with(
                sh,
                F.slice(t, j + 1, n),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        return sh

    return F.when(F.size(t) < k, F.array(F.concat_ws(" ", t))).otherwise(
        _windows()
    )


def with_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, _toks) with the sklearn-parity token array materialized as
    a BOUND attribute. Expressions built over ``F.col("_toks")`` then
    evaluate the regexp tokenizer ONCE per row; the same expressions
    built inline over ``tokens_col(text_col)`` re-run the regexp at
    every reference — :func:`shingles_col` references the token array
    k+1 times, so a 20-token window chain paid 21 tokenizer passes per
    doc (measured 2.4x on the substr explode at local[32] sf0.1).
    CollapseProject leaves the projection split exactly because
    ``_toks`` is multiply referenced."""
    return df.select(F.col(id_col), tokens_col(text_col).alias("_toks"))


# above this window width the windowed-concat form switches from the
# pairwise zip_with chain (fastest at k=3: no per-window index math) to
# one transform+slice+concat_ws per window — the chain's intermediate
# strings cost O(k^2) bytes of copying per window (measured: k=20 chain
# 0.94s vs transform 0.51s over sf0.1; k=3 chain 0.27s vs 0.35s)
_SHINGLE_CHAIN_MAX_K = 6


def shingles_from_tokens(toks: Column, k: int) -> Column:
    """k-word shingles over an already-bound token ARRAY column —
    identical strings to :func:`shingles_col` (space-joined windows;
    short docs yield their full token join)."""
    n = F.size(toks) - (k - 1)
    if k <= _SHINGLE_CHAIN_MAX_K:
        sh = F.slice(toks, 1, n)
        for j in range(1, k):
            sh = F.zip_with(
                sh,
                F.slice(toks, j + 1, n),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
    else:
        sh = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    return F.when(F.size(toks) < k, F.array(F.concat_ws(" ", toks))).otherwise(sh)


def _drop_over_cap_keys(df: DataFrame, key_cols: list[str], cap: int) -> DataFrame:
    """Drop every row whose key appears more than ``cap`` times.

    Scale-safe form: groupBy-count (map-side combinable) finds the
    over-cap keys — a tiny set, since each key stands for > cap rows —
    which is broadcast back as a ``left_anti`` join. No key's rows are
    ever funneled into one window task."""
    over = (
        df.groupBy(*key_cols)
        .count()
        .where(F.col("count") > cap)
        .select(*key_cols)
    )
    return df.join(F.broadcast(over), key_cols, "left_anti")


def _materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute a result frame and truncate its lineage so
    upstream persisted inputs can be unpersisted immediately — the
    pattern connected_components uses for its edge frame.

    CONTRACT: localCheckpoint blocks are UNREPLICATED and the lineage
    is gone — a lost executor makes the frame unrecoverable. Only
    frames that are provably small relative to the corpus (candidate
    PAIR frames, per-round edge frames, reports) may pass through
    here. Corpus-cardinality frames (one row per input doc) must use
    :func:`_materialize_recoverable` instead."""
    return df.localCheckpoint(eager=True)


_WARNED_LOCAL_FALLBACK = False


def _materialize_recoverable(df: DataFrame) -> DataFrame:
    """Eagerly compute a CORPUS-SIZED result frame via RELIABLE
    checkpoint: the frame is written to the configured checkpoint
    store (tmpfs locally; HDFS/S3 on a cluster — ``session.get_spark``
    sets the dir), so a lost executor re-READS the checkpoint instead
    of killing the job (localCheckpoint blocks are unreplicated and
    lineage-free — a single executor loss is fatal; VERDICT r3 #2).

    Not persist()+count: DataFrame.persist entries stay registered in
    the session CacheManager until EXPLICIT unpersist — in a chain
    that materializes several corpus-sized stage frames per call,
    that leaks executor storage across calls in long-lived sessions.
    Checkpoint files carry no CacheManager entry and are reference-
    tracked (``spark.cleaner.referenceTracking.cleanCheckpoints``):
    deleted when the frame is garbage-collected.

    Sessions built outside :func:`session.get_spark` (a host
    harness's own SparkSession) have neither a checkpoint dir nor
    ``cleanCheckpoints=true`` — and that conf is session-BUILD-time,
    so it cannot be enabled here. Reliable-checkpointing such a
    session would leak every checkpoint file forever (a silent tmpfs
    fill in long-lived processes) and, on a cluster, write to a
    node-local default dir that other executors cannot read — the
    opposite of recoverable. Those sessions therefore fall back to
    ``localCheckpoint`` (the pre-round-4 behavior: correct, GC-
    cleaned, just not executor-loss-recoverable); the recoverable
    path is a property of the production session factory."""
    import os

    spark = df.sparkSession
    cleaned = (
        spark.conf.get(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
        ).lower()
        == "true"
    )
    if not cleaned:
        # LOUD degradation (VERDICT r4 #6): a production user driving
        # corpus_prep through their own session silently got the r3
        # failure mode back (unreplicated blocks, executor loss is
        # fatal). Warn once per process, naming the confs to set.
        global _WARNED_LOCAL_FALLBACK
        if not _WARNED_LOCAL_FALLBACK:
            _WARNED_LOCAL_FALLBACK = True
            import warnings

            warnings.warn(
                "corpus-sized frame falling back to UNREPLICATED "
                "localCheckpoint: this SparkSession was built without "
                "spark.cleaner.referenceTracking.cleanCheckpoints=true, "
                "so reliable checkpointing would leak checkpoint files. "
                "A lost executor makes this frame unrecoverable. Build "
                "the session with that conf set (session.get_spark does) "
                "and point SPARK_CHECKPOINT_DIR / setCheckpointDir at "
                "shared storage for executor-loss recovery.",
                RuntimeWarning,
                stacklevel=3,
            )
        return df.localCheckpoint(eager=True)
    sc = spark.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(
            os.environ.get("SPARK_CHECKPOINT_DIR", "/dev/shm/spark-checkpoints")
        )
    return df.checkpoint(eager=True)


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with its
    representative (min id) and multiplicity."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).alias("representative"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    shingle_words: int = 3,
) -> DataFrame:
    """One row per doc with ``sig: array<long>`` of length k.

    One md5 per shingle; slot i's hash is the affine combination
    (h1 + i·h2) mod 2^32 of the digest's first two 32-bit words
    (double hashing), so K=128 costs K codegen'd integer ops instead
    of K cryptographic hashes. Min over a multiset equals min over its
    set, so no (doc, shingle) distinct shuffle is needed."""
    hashed = with_tokens(df, id_col, text_col).select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("_toks"), shingle_words)).alias("sh"),
    ).select(
        # md5 bound once per shingle; the two 32-bit words parse from
        # the bound attribute instead of re-hashing per substring
        F.col(id_col),
        F.md5(F.col("sh")).alias("_h"),
    ).select(
        F.col(id_col),
        F.conv(F.substring(F.col("_h"), 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(F.col("_h"), 9, 8), 16, 10).cast("long").alias("h2"),
    )
    aggs = [
        F.min((F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(_MH_MOD)).alias(f"mh_{i}")
        for i in range(k)
    ]
    mins = hashed.groupBy(id_col).agg(*aggs)
    return mins.select(
        F.col(id_col), F.array(*[F.col(f"mh_{i}") for i in range(k)]).alias("sig")
    )


def _band_hash(sig: Column, band: int, band_size: int) -> Column:
    """One int64 per band: xxhash64 over (band index, band slots).

    Bucket membership is SLOT EQUALITY either way — two docs share a
    band bucket iff their ``band_size`` signature slots are equal — so
    this produces the same candidate pairs as the former
    ``md5(concat_ws(slots))`` string key (absent int64 collisions,
    ~n²/2^64, the repo's documented hashing approximation), while the
    LSH self-join, bucket-cap groupBy and pair distinct all shuffle
    one long instead of a 32-char string, and signature banding skips
    32 string concats + cryptographic hashes per doc. The band index
    folds into the hash, so the join key is a single column."""
    return F.xxhash64(
        F.lit(band),
        *[F.element_at(sig, band * band_size + j + 1) for j in range(band_size)],
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    band_size: int = LSH_BAND_SIZE,
    shingle_words: int = 3,
    bucket_cap: int = LSH_BUCKET_CAP,
    eager: bool = False,
    with_jaccard: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 LSH band, with the
    minhash-estimated jaccard (fraction of equal signature slots).

    ``with_jaccard=False`` returns just the distinct (doc_a, doc_b)
    candidate set and skips the two per-pair signature re-joins — the
    right input for consumers that only need the pair GRAPH (connected
    components): the optimizer cannot drop those inner joins itself
    because it cannot prove the signature frame is unique per doc, so
    a pruned-column plan still re-runs the whole signature subtree
    twice per side.

    Band buckets holding more than ``bucket_cap`` docs are dropped
    before the self-join (via :func:`_drop_over_cap_keys` — broadcast
    anti-join, not a window, so the degenerate bucket never lands in
    one task) — a degenerate bucket of size m contributes m² pair
    rows, and at web scale boilerplate-only pages produce buckets with
    10^6+ members. The bands frame carries only (id, band) —
    signatures are re-joined per *pair*, not per band row, so the 32×
    band explosion never multiplies the 128-slot payload.

    ``eager=False`` (default) returns the fully lazy plan. The
    signature subtree is consumed ~5x in the plan (band count, band
    rows, twice in the per-pair sig re-join), but Spark's
    ReuseExchange dedupes the identical signature shuffle within one
    physical plan, so a single action computes it ONCE — measured
    equal to the eager path on min wall time (6.15s vs 6.10s at
    local[32], sf0.1) and far more stable: the eager
    persist→localCheckpoint→unpersist cycle showed intermittent 3-8x
    stalls at 32 cores (5.6→9.8→15.2s across reps in one JVM; worst
    44s) that the lazy plan never exhibits (5.1-5.4s flat) — the r3
    driver-bench anti-scaling isolated to this cycle
    (``BENCH/AB_MINHASH.md``). ``eager=True`` persists the signature
    frame, materializes the (small) pair result and unpersists before
    returning — use it only for MULTI-ACTION consumers that re-read
    the pair frame repeatedly without materializing it themselves
    (``connected_components_star`` localCheckpoints its edge frame up
    front, so it does NOT need an eager input)."""
    sig = minhash_signatures(df, id_col, text_col, k, shingle_words)
    if eager:
        sig = sig.persist()
    n_bands = k // band_size
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[_band_hash(F.col("sig"), b, band_size) for b in range(n_bands)]
            )
        ).alias("band_hash"),
    )
    capped = _drop_over_cap_keys(bands, ["band_hash"], bucket_cap)
    a = capped.select(F.col(id_col).alias("doc_a"), "band_hash")
    b = capped.select(F.col(id_col).alias("doc_b"), "band_hash")
    pairs = (
        a.join(b, ["band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    if not with_jaccard:
        if eager:
            pairs = _materialize(pairs)
            sig.unpersist()
        return pairs
    sa = sig.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("_sig_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("_sig_b"))
    eq_frac = (
        F.size(
            F.filter(
                F.zip_with(F.col("_sig_a"), F.col("_sig_b"), lambda x, y: x == y),
                lambda e: e,
            )
        )
        / F.lit(float(k))
    )
    result = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", eq_frac.alias("est_jaccard"))
    )
    if eager:
        result = _materialize(result)
        sig.unpersist()
    return result


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc appearing in a candidate
    pair; cluster_id = min doc id reachable through the pair graph.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converges in
    O(graph diameter) rounds (dedup clusters are shallow stars).
    localCheckpoint truncates the exploding join lineage per round.

    Convergence is detected with a ``_changed`` flag computed INSIDE
    the round's own transformation (labels are monotone non-increasing,
    so new < old ⇔ changed) probed with a ``limit(1)`` existence check
    over the just-checkpointed frame — not a full labels⨝labels count
    job per round, which at 10^12 nodes would double each round's
    shuffle volume just to decide termination. For graphs with deep
    diameter at extreme scale, see :func:`connected_components_star`
    (O(log²) rounds)."""
    edges = pairs.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).unionAll(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
    edges = edges.persist()
    labels = (
        edges.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels["node"] == nbr["u"], "left")
            .select(
                F.col("node"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        converged = new_labels.where(F.col("_changed")).limit(1).isEmpty()
        labels = new_labels.drop("_changed")
        if converged:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def _edge_digest(edges: DataFrame) -> tuple:
    """Commutative fingerprint of an edge set — (count, xor of row
    hashes): one map-side-combinable aggregate, no sort, no collect.
    Used as the fixpoint test between star rounds."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
    assume_distinct: bool = False,
) -> DataFrame:
    """(doc_id, cluster_id) by alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the 10^12-scale path: converges in O(log²
    component size) rounds regardless of graph DIAMETER, where plain
    min-label propagation (:func:`connected_components`) needs
    O(diameter) rounds and stalls on chain-shaped duplicate graphs.

    Both steps are expressed as groupBy-min + equi-join (no neighbor
    lists are ever materialized, so a 10^7-degree hub never lands in
    one task's memory):

    - large-star: every node attaches its LARGER neighbors to its
      current minimum (including itself) — emit (v, m(u)) for v > u,
      m(u) = min(N(u) ∪ {u});
    - small-star: with edges directed big→small, every node re-attaches
      its smaller neighbors and itself to its minimum — emit (v, mn(u))
      for v ∈ N⁻(u) ∪ {u}, v ≠ mn(u).

    Termination = edge-set fixpoint, detected by a commutative
    count+xor digest (one aggregate per round, no edge⨝edge compare).
    At the fixpoint the edges form stars (member → component min).

    ``assume_distinct=True`` skips the defensive input dedup shuffle —
    pass it when the pair frame is already distinct with a < b (the
    LSH candidate generators end in exactly that), saving one full
    shuffle of the edge set before the first round."""
    edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    if not assume_distinct:
        edges = edges.where(F.col("u") != F.col("v")).distinct()
    edges = edges.localCheckpoint(eager=True)
    prev = _edge_digest(edges)
    for _ in range(max_iter):
        # --- large-star ---------------------------------------------
        nb = edges.unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            nb.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
        )
        # NO distinct here (r6): duplicate large-star edges cannot
        # change the round's outcome — the small-star min aggregate is
        # multiplicity-insensitive and the round's final distinct
        # dedupes the emitted edges — so the intermediate dedup was a
        # pure extra full shuffle of the edge set every round.
        # Multiplicity stays bounded by 2|E| (mins is one row per u, so
        # the join fans nothing out).
        large = (
            nb.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # --- small-star (edges now oriented big -> small) ------------
        canon = large.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        mn = canon.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            canon.join(mn, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(mn.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges = small
        cur = _edge_digest(edges)
        if cur == prev:
            break
        prev = cur
    members = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = edges.select(
        F.col("v").alias("doc_id"), F.col("v").alias("cluster_id")
    ).distinct()
    return members.unionAll(roots).distinct()


def _bit_of_md5(col, bit: int):
    """Deterministic bit: parse one hex nibble of the md5 and test one
    of its 4 bits — identical arithmetic in DuckDB SQL."""
    nibble = F.conv(F.substring(col, bit // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(nibble, bit % 4).bitwiseAND(F.lit(1))


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Per-doc SimHash over token md5s: bit b of the signature is 1 iff
    sum over tokens of (2*bit_b(md5(token)) - 1) > 0.

    The first ``n_bits/4`` hex chars parse to ONE bound integer per
    token and each bit extracts with a shift+mask — the former
    per-bit ``conv(substring(h, b//4+1, 1))`` form re-parsed the hash
    string n_bits times per token. Hex char p (1-based, leftmost =
    most significant) holds bits ``4*(n_nibbles-p) .. +3`` of the
    parsed value, and :func:`_bit_of_md5` tests bit ``b%4`` of char
    ``b//4+1``, so bit b of the signature is bit ``4*(n_nibbles-1 -
    b//4) + b%4`` of the parsed value — identical integers, exact."""
    n_nibbles = (n_bits + 3) // 4
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).select(F.col(id_col), F.md5(F.col("tok")).alias("h")).select(
        F.col(id_col),
        F.conv(F.substring(F.col("h"), 1, n_nibbles), 16, 10)
        .cast("long")
        .alias("_v"),
    )
    bit_sums = [
        F.sum(
            F.shiftright(F.col("_v"), 4 * (n_nibbles - 1 - b // 4) + b % 4)
            .bitwiseAND(F.lit(1))
            * 2
            - 1
        ).alias(f"s_{b}")
        for b in range(n_bits)
    ]
    sums = toks.groupBy(id_col).agg(*bit_sums)
    sig = sum(
        F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(n_bits)
    )
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def hamming_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_bits: int = SIMHASH_BITS,
    n_blocks: int = 4,
    max_hamming: int = 3,
    eager: bool = True,
) -> DataFrame:
    """Pairs within Hamming distance <= ``max_hamming`` over ANY
    integer signature column (SimHash over text, aHash/dHash over
    pixels — the pigeonhole machinery is signature-agnostic).

    Pigeonhole block join: split the signature into n_blocks bit
    blocks; any pair within Hamming distance < n_blocks must share at
    least one identical block, so candidates come from an equi-join on
    (block_idx, block_value) instead of an all-pairs scan. Exact
    Hamming distance (bit_count of xor) re-ranks candidates.
    Requires max_hamming < n_blocks for zero false negatives.
    ``shiftrightunsigned`` keeps the top block correct for full-width
    64-bit signatures (bit 63 set → negative long)."""
    block_bits = n_bits // n_blocks
    mask = (1 << block_bits) - 1
    blocks = sig.select(
        F.col(id_col),
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.shiftrightunsigned(F.col(sig_col), b * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("block_val"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select(id_col, "_sig", "blk.block_idx", "blk.block_val")
    if eager:
        blocks = blocks.persist()
    a = blocks.select(
        F.col(id_col).alias("doc_a"), F.col("_sig").alias("_ha"),
        "block_idx", "block_val",
    )
    b = blocks.select(
        F.col(id_col).alias("doc_b"), F.col("_sig").alias("_hb"),
        "block_idx", "block_val",
    )
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    result = (
        a.join(b, ["block_idx", "block_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    if eager:
        result = _materialize(result)
        blocks.unpersist()
    return result


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = SIMHASH_BITS,
    n_blocks: int = 4,
    max_hamming: int = 3,
    eager: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming —
    :func:`simhash` signatures through the generic
    :func:`hamming_pairs` pigeonhole join.

    ``eager=True`` stays the default here: unlike the fat minhash
    signature frame, the persisted block frame is 4 narrow int rows
    per doc, and the A/B (local[32] sf0.1, 5 reps each,
    ``BENCH/AB_MINHASH.md``) measured eager steadily FASTER
    (1.8-2.4s vs 2.8-3.3s lazy) with none of the minhash-style
    stalls."""
    return hamming_pairs(
        simhash(df, id_col, text_col, n_bits),
        id_col=id_col,
        sig_col="simhash",
        n_bits=n_bits,
        n_blocks=n_blocks,
        max_hamming=max_hamming,
        eager=eager,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    threshold: float = 0.5,
    max_df: int = NGRAM_MAX_DF,
    eager: bool = False,
) -> DataFrame:
    """Exact Jaccard over distinct k-word shingles for every pair
    sharing at least one shingle; |A∪B| = |A|+|B|-|A∩B|.

    Shingles with document frequency > ``max_df`` are dropped before
    the self-join (and excluded from set sizes, so the jaccard is over
    the *discriminative* shingle sets): one boilerplate shingle shared
    by 10^6 docs would otherwise contribute 10^12 join rows. The df
    cap is :func:`_drop_over_cap_keys` — groupBy-count + broadcast
    anti-join, so the boilerplate shingle's rows never collapse into
    one window task.

    The distinct shingle sets are carried as ``xxhash64`` int64s from
    the explode on: every downstream shuffle (distinct, df-cap count,
    the self-join, per-doc sizes) moves 8-byte longs instead of the
    k-word strings (guide: shuffle keys, not payloads). Identical
    results absent int64 collisions (~n²/2^64 — the same documented
    approximation as :func:`substr_dup_stats`; the SQL twin compares
    on the strings).

    ``eager=False`` (default) leaves the fully lazy plan: with the
    token array bound once and the shingles hashed before any
    exchange, re-running the (now cheap) explode per consumer beats
    the eager persist→localCheckpoint→unpersist cycle — measured
    interleaved at local[32] sf0.1: lazy min 1.87s vs eager 3.62s,
    with eager showing the same first-call stalls the minhash A/B
    documented (``BENCH/AB_MINHASH.md``). ``eager=True`` persists the
    hashed distinct-shingle frame ((id, long) — the cheapest form the
    operator ever holds) for MULTI-ACTION consumers."""
    win = (
        with_tokens(df, id_col, text_col)
        .select(
            F.col(id_col),
            F.explode(shingles_from_tokens(F.col("_toks"), shingle_words)).alias("sh"),
        )
        .select(F.col(id_col), F.xxhash64("sh").alias("sh"))
        .distinct()
    )
    if eager:
        win = win.persist()
    sh = _drop_over_cap_keys(win, ["sh"], max_df)
    sizes = sh.groupBy(id_col).agg(F.count("*").cast("long").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "sh")
    b = sh.select(F.col(id_col).alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    result = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    if eager:
        result = _materialize(result)
        win.unpersist()
    return result


def substr_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 20,
    eager: bool = True,
) -> DataFrame:
    """Exact-substring duplication stats (the Spark-shaped analogue of
    Lee et al. 2021's ExactSubstr dedup, which removes any 50-byte span
    occurring more than once in the corpus): per doc, the number and
    fraction of rolling ``window_tokens``-token windows whose exact
    token sequence occurs more than once ANYWHERE in the corpus
    (including elsewhere in the same doc — ExactSubstr semantics).

    Output: (id, n_windows, n_dup_windows, dup_frac). Docs shorter
    than the window contribute their full token join as one window
    (consistent with :func:`shingles_col`); docs with NO tokens emit
    no row (they have no substring to deduplicate). Callers typically
    drop or trim docs above a dup_frac threshold.

    Scale shape (10^12 docs): windows are hashed to int64
    (``xxhash64``) before they shuffle, so the exploded frame carries
    (id, long) — never the W-token strings; occurrence counts are one
    map-side-combinable groupBy on the hash; the dup-window join is
    hash-to-hash (sort-merge on the same key the counts were grouped
    by) followed by the per-doc count groupBy. Suffix-array exactness
    (arbitrary-length spans) does not distribute; fixed-window rolling
    hashes are the standard approximation and bound memory per row.
    The SQL oracle twin compares on the window STRINGS (DuckDB has no
    xxhash64) — identical results absent int64 hash collisions
    (~n²/2^64; negligible below 10^9 windows, noted here for honesty).
    """
    # docs with NO tokens (NULL text, or text with no \w\w+ runs) emit
    # no row at all: without this guard every such doc shares the ''
    # window and a pair of unrelated empty docs reads as 100%
    # duplicated (and NULL-text rows diverge from the SQL twin, where
    # unnest(NULL) yields nothing)
    win = (
        with_tokens(df, id_col, text_col)
        .where(F.size(F.col("_toks")) > 0)
        .select(
            F.col(id_col),
            F.explode(shingles_from_tokens(F.col("_toks"), window_tokens)).alias("w"),
        )
        .select(F.col(id_col), F.xxhash64("w").alias("h"))
    )
    if eager:
        # win feeds both the occurrence count and the dup join — two
        # full tokenize+explode passes without it (ReuseExchange does
        # NOT cover this shape: the two consumers shuffle win on
        # different keys, so there is no common exchange to reuse —
        # measured 2x: lazy 6.5-7.2s vs eager 3.0-3.7s at local[32]
        # sf0.1, BENCH/AB_MINHASH.md). The cached frame is (id, long):
        # 16 bytes/window, the cheapest representation the operator
        # ever holds.
        win = win.persist()
    counts = win.groupBy("h").agg(F.count("*").alias("_n"))
    joined = win.join(counts, "h")
    result = (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("_n") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.col("n_dup_windows") / F.col("n_windows").cast("double"), 6
            ),
        )
    )
    if eager:
        # the result is CORPUS-sized (one row per doc): recoverable
        # materialization (reliable checkpoint), never localCheckpoint
        # — a lost executor re-reads instead of killing the job
        # (VERDICT r3 "What's wrong #2").
        result = _materialize_recoverable(result)
        win.unpersist()
    return result
