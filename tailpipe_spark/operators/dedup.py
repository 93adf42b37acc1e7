"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — all shuffle-on-key DataFrame plans, no
Python in the hot path:

- exact: md5 over (normalized) text → groupBy hash. One shuffle on a
  16-byte key regardless of document size.
- fingerprint: md5 over the sorted distinct token set — catches
  reorderings/duplicated-whitespace variants at exact-dedup cost.
- n-gram Jaccard: explode token n-grams → self-join on gram →
  common-gram counts → |A∩B| / (|A|+|B|−|A∩B|). Exact pairwise
  similarity; the gram join keys the shuffle so only documents sharing
  a gram ever meet (never the full cross product). Hot grams can be
  frequency-capped before the join at scale.
- MinHash + LSH: k min-hashes per doc → band signatures → equi-join on
  (band, signature) buckets → candidate pairs (optionally verified with
  the Jaccard op above). Cost linear in corpus + bucket collisions —
  the 100 TB path.

SimHash (Hamming-ball near-dup) lives here too: 64-bit fingerprint from
xxhash64 token bits; near-dup candidates = equal 16-bit chunks (LSH on
4 chunks catches all pairs within Hamming distance 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalize_text(col):
    """Lowercase + collapse whitespace — shared by every dedup tier."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-level exact-duplicate summary (1 row)."""
    h = docs.select(F.md5(normalize_text(F.col(text_col))).alias("h"))
    return h.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct("h").alias("distinct_docs"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("duplicate_docs"),
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id document per exact-normalized-text group."""
    h = docs.withColumn("__h", F.md5(normalize_text(F.col(text_col))))
    keep = h.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return h.join(keep, [id_col, "__h"], "inner").drop("__h")


def token_ngrams(docs: DataFrame, text_col: str, n: int, id_col: str = "doc_id") -> DataFrame:
    """(id, gram) pairs — distinct word n-grams per document."""
    toks = docs.select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("t")
    )
    # docs shorter than n tokens yield no grams; the sequence bound makes
    # every emitted slice exactly n tokens, so no post-filter re-split.
    # Per-doc set semantics come from array_distinct BEFORE the explode:
    # a row-local array op instead of a corpus-wide DISTINCT shuffle.
    return toks.where(F.size("t") >= n).select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.array_join(F.slice("t", i + 1, n), " "),
                )
            )
        ).alias("gram"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_df: int | None = 100_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 gram.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.

    ``max_gram_df`` drops grams whose document frequency exceeds the cap
    BEFORE the self-join: one stop-phrase gram shared by m documents
    produces an O(m²) bucket, which at web scale is quadratic in the
    corpus. Similarity is then Jaccard over the remaining informative
    grams (sizes are recomputed post-cap, so the metric stays
    self-consistent). None disables the cap.
    """
    # One explicit shuffle on gram, whose exchange is REUSED by every
    # consumer (hot-gram agg, both self-join sides): the split/explode
    # pipeline runs once, and the gram-keyed agg + self-join need no
    # further exchange because HashPartitioning(gram) already holds.
    grams = token_ngrams(docs, text_col, n, id_col).repartition(F.col("gram"))
    if max_gram_df is not None:
        # A gram's document frequency is bounded by the corpus size, so
        # when the corpus holds <= max_gram_df documents the cap provably
        # cannot trigger — skip the frequency pass (one cheap count job,
        # metadata-only for parquet-backed inputs, vs a full gram
        # aggregation + anti-join). Results are bit-identical with or
        # without the skip at ANY corpus size; at real scale doc count
        # >> cap and the guard machinery runs as designed.
        if docs.count() <= max_gram_df:
            max_gram_df = None
    if max_gram_df is not None:
        # The offending set (grams with df > cap) is small by
        # construction, so ship it as a broadcast anti-join instead of
        # shuffling the full gram-frequency table back onto the grams.
        hot = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_gram_df)
            .select("gram")
        )
        grams = grams.join(F.broadcast(hot), "gram", "left_anti")
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    a = grams.select(F.col(id_col).alias("id_a"), "gram")
    b = grams.select(F.col(id_col).alias("id_b"), "gram")
    common = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose n-gram
    overlap with a benchmark/eval corpus exceeds ``threshold``.

    Returns (id, n_grams, n_overlap, overlap_ratio, contaminated) per
    candidate document. The benchmark gram set is tiny relative to the
    corpus (eval suites, not training data), so it ships as a broadcast
    hash join against the exploded corpus grams — the corpus side never
    shuffles on gram, only on doc id for the two per-doc aggregations.
    For an unusually large benchmark, drop the broadcast hint and let
    AQE pick the join side.
    """
    doc_grams = token_ngrams(docs, text_col, n, id_col)
    bench_grams = token_ngrams(benchmark, text_col, n, id_col).select("gram").distinct()
    sizes = doc_grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    overlap = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    joined = sizes.join(overlap, id_col, "left").fillna(0, subset=["n_overlap"])
    ratio = F.col("n_overlap") / F.col("n_grams")
    return joined.select(
        id_col,
        "n_grams",
        "n_overlap",
        ratio.alias("overlap_ratio"),
        (ratio >= threshold).alias("contaminated"),
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over an undirected edge set by min-label
    propagation: every node starts labeled with its own id; each round
    every node takes the minimum label among itself and its neighbors,
    until a round changes nothing. Rounds needed = graph diameter —
    near-dup clusters are shallow (stars/chains of a few hops), so this
    converges in a handful of shuffles even at web scale. (The
    alternating large-star/small-star contraction halves round count on
    adversarially deep graphs; diameter-bounded dup graphs don't need
    it.) Labels are localCheckpointed per round so the loop's lineage
    stays flat.

    Returns (node, component) where component is the minimum node id in
    the node's component.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        msgs = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(sym["b"].alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        # labels only ever decrease, so "changed" == strictly-smaller rows
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") < F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def xxhash64_hash_fn(c, s: int):
    """Engine-default MinHash hash: seeded xxhash64, JVM-native."""
    return F.xxhash64(c, F.lit(s))


def md5_hash_fn(c, s: int):
    """Portable MinHash hash: md5 over a seed-salted gram — any SQL
    engine can replay it, so the oracle harness uses this twin."""
    return F.md5(F.concat(c, F.lit(f"#{s}")))


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """k min-hash values per document over its n-gram set.

    ``hash_fn(gram_col, seed) -> Column``; the engine default is
    xxhash64 (seeded, JVM-native — ~10x cheaper than md5-over-string).
    Pass ``md5_hash_fn`` for a hash any SQL engine can replay (the
    oracle-parity twin used by the correctness harness).
    """
    if hash_fn is None:
        hash_fn = xxhash64_hash_fn
    grams = token_ngrams(docs, text_col, n, id_col)
    aggs = [
        F.min(hash_fn(F.col("gram"), s)).alias(f"mh{s}") for s in range(num_hashes)
    ]
    return grams.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Two docs collide if any band (num_hashes/bands consecutive
    min-hashes) is identical. Returns distinct (id_a, id_b), id_a<id_b.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes, text_col, id_col, hash_fn)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("sig"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(id_col, F.explode(F.array(*band_cols)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document from xxhash64 token hashes.

    For each bit position, sum +1/−1 over tokens by whether the token
    hash has that bit set; fingerprint bit = sign of the sum. Pure
    JVM-side bit arithmetic (explode + bitwise ops + groupBy).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    )
    hashed = toks.select(id_col, F.xxhash64("tok").alias("h"))
    bit_votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = hashed.groupBy(id_col).agg(*bit_votes)
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        )
    return votes.select(id_col, fp.alias("simhash"))


def simhash_candidates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", chunks: int = 4
) -> DataFrame:
    """Near-dup candidates: pairs sharing any 16-bit simhash chunk
    (catches all pairs within Hamming distance chunks−1)."""
    fp = simhash(docs, text_col, id_col)
    width = 64 // chunks
    mask = (1 << width) - 1
    chunk_cols = [
        F.struct(
            F.lit(i).alias("ci"),
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask)).alias("cv"),
        )
        for i in range(chunks)
    ]
    parts = fp.select(id_col, F.explode(F.array(*chunk_cols)).alias("c")).select(
        id_col, "c.ci", "c.cv"
    )
    a = parts.select(F.col(id_col).alias("id_a"), "ci", "cv")
    b = parts.select(F.col(id_col).alias("id_b"), "ci", "cv")
    return (
        a.join(b, ["ci", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
