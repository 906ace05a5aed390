"""Physical data layout for the 100 TB tier: bucketing & partitioning.

The expensive step in the star join is lineitem⋈orders co-location: at
100 TB both sides shuffle by orderkey on every query. Bucketing both
tables by the join key at WRITE time moves that shuffle out of every
query and into the (one-time) layout job -- a bucketed sort-merge join
reads co-located buckets with NO exchange on either side.

Partition columns (low-cardinality, prunable: dates) go to directory
partitioning; join/group keys (high-cardinality: orderkey, hex_ident)
go to buckets. The Silver squitters layout combines both:
`parsed_date` directories x `hex_ident` buckets (SURVEY.md §1.3).

Verified by tests/test_plans.py::test_bucketed_join_is_shuffle_free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int = 64,
    partition_by: str | list[str] | None = None,
    sort_by: str | list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally partitioned) table.

    ``sort_by`` defaults to the bucket key: sorted buckets let the
    sort-merge join skip its sort step too (scan -> merge, no exchange,
    no sort). Bucket counts should match between co-joined tables.
    ``path`` makes the table external at that location (catalog
    registrations are session-scoped; an explicit path keeps the
    layout findable independent of the session's warehouse dir).
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    sort = sort_by or keys
    sort = [sort] if isinstance(sort, str) else list(sort)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys).sortBy(
        *sort
    )
    if path is not None:
        writer = writer.option("path", path)
    if partition_by:
        parts = (
            [partition_by]
            if isinstance(partition_by, str)
            else list(partition_by)
        )
        writer = writer.partitionBy(*parts)
    writer.format("parquet").saveAsTable(table)


def bucketed_star_layout(
    spark: SparkSession, sf_dir: str, n_buckets: int = 64
) -> None:
    """One-time layout job: lineitem + orders bucketed by orderkey so
    every subsequent orderkey join is exchange-free."""
    from ..tables import load_table

    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        "lineitem_bucketed",
        "l_orderkey",
        n_buckets,
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        "orders_bucketed",
        "o_orderkey",
        n_buckets,
    )


def date_partitioned_events_layout(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> None:
    """One-time layout job for the time-series table: events written to
    ``event_date=YYYY-MM-DD/`` directories. A date-ranged query then
    touches only the matching directories -- partition PRUNING happens
    at file-listing time, before any IO, which at 100 TB (3 TB/day,
    say) turns a full scan into a read of just the queried days.

    Inside each date directory rows are sorted by (user_id, ts) so
    per-user scans benefit from parquet row-group min/max skipping --
    directory pruning for the coarse filter, zone-map skipping for the
    fine one.
    """
    from pyspark.sql import functions as F

    from ..tables import load_table

    events = load_table(spark, sf_dir, "events")
    (
        events.withColumn("event_date", F.to_date("ts"))
        .repartition("event_date")
        .sortWithinPartitions("user_id", "ts")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out_dir)
    )


def lsh_bucketed_embeddings_layout(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> None:
    """One-time ANN index layout: embeddings written to
    ``bucket=N/`` directories keyed by the q_ann_lsh hyperplane bucket
    (8 sign bits -> 256 directories). A multi-probe ANN search then
    reads only the probed buckets -- partition pruning at file-listing
    time turns the 14% candidate fraction (hamming<=2: 37/256 buckets)
    into 14% of the IO, not a full scan plus filter. This is the
    at-rest half of the q_ann_lsh design (its in-query form computes
    the bucket on the fly)."""
    from pyspark.sql import functions as F

    from ..operators.similarity import _bucket_col
    from ..tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]
    (
        emb.withColumn("bucket", _bucket_col(F.col("embedding"), dim))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )


def ivf_cell_bucketed_layout(
    spark: SparkSession,
    sf_dir: str,
    table: str = "embeddings_cells",
    n_buckets: int = 8,
) -> None:
    """One-time semantic-dedup/IVF layout: embeddings stored WITH their
    nearest-seed-centroid ``cell_id``, bucketed (and bucket-sorted) on
    it. A bucketed scan reports HashPartitioning(cell_id), which
    satisfies the ClusteredDistribution the within-cell stages require
    -- so q_semantic_dedup's pair-scoring group and q_ann_ivf's
    per-cell re-rank run with ZERO exchange over this table (asserted
    in tests/test_plans.py). This is the at-rest half of the semantic
    dedup design; the registered query computes cell_id on the fly."""
    from pyspark.sql import functions as F

    from ..operators.similarity import (
        _nearest_cell_expr,
        _seed_centroid_rows,
    )
    from ..tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _seed_centroid_rows(emb)
    write_bucketed(
        emb.select(
            "vec_id",
            "label",
            "embedding",
            _nearest_cell_expr(cents).alias("cell_id"),
        ),
        table,
        "cell_id",
        n_buckets,
    )


def _ivf_centroid_rows(spark: SparkSession, emb, centroids: str) -> list:
    """Centroid rows for the IVF layout/probe pair: ``"seed"`` = the
    deterministic vec_id-1..N_CELLS convention (oracle-reconstructible),
    ``"trained"`` = the persisted k-means artifact
    (fixtures/ivf_centroids.parquet -- the q_ann_ivf_trained
    quantizer). Layout and probe MUST use the same set: assignment and
    probe ranking against different quantizers silently turns pruning
    into wrong answers, which is why the choice is one shared string
    parameter rather than two call sites."""
    from ..operators.similarity import (
        _ivf_fixture_rows,
        _seed_centroid_rows,
    )

    if centroids == "trained":
        return _ivf_fixture_rows(spark)
    return _seed_centroid_rows(emb)


def ivf_cell_partitioned_layout(
    spark: SparkSession, sf_dir: str, out_dir: str, centroids: str = "seed"
) -> None:
    """One-time IVF index layout: embeddings written to ``cell_id=N/``
    directories keyed by the nearest centroid (seed convention by
    default; ``centroids="trained"`` uses the persisted k-means
    quantizer -- the production pairing with q_ann_ivf_trained). An
    nprobe search then reads only the probed cells -- partition
    pruning at file-listing time, the at-rest half of q_ann_ivf's
    design (its in-query form computes the assignment on the fly; the
    BUCKETED variant above serves the exchange-free within-cell
    grouping instead -- directory pruning and bucket co-location are
    different levers, so they are different layouts)."""
    from ..operators.similarity import _nearest_cell_expr
    from ..tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroid_rows(spark, emb, centroids)
    (
        emb.select(
            "vec_id",
            "label",
            "embedding",
            _nearest_cell_expr(cents).alias("cell_id"),
        )
        .repartition("cell_id")
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(out_dir)
    )


def ivf_probe_pruned(
    spark: SparkSession,
    layout_dir: str,
    query_vec_id: int,
    k: int = 10,
    nprobe: int | None = None,
    centroids: str = "seed",
) -> DataFrame:
    """q_ann_ivf's probe over the partitioned layout: rank the
    centroids (same set the layout assigned with -- pass the same
    ``centroids``) against the query driver-side (same left-fold
    double arithmetic), then scan ONLY the winning ``cell_id=N/``
    directories -- the filter compiles to PartitionFilters, pruned at
    file-listing time (asserted in tests/test_plans.py together with
    result equality against the on-the-fly query)."""
    from pyspark.sql import functions as F

    from ..operators.similarity import (
        IVF_NPROBE,
        _array_literal,
        _cos_py,
        cosine_similarity,
    )

    nprobe = IVF_NPROBE if nprobe is None else nprobe
    emb = spark.read.parquet(layout_dir)
    cents = _ivf_centroid_rows(spark, emb, centroids)
    qv = [
        float(v)
        for r in emb.filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .collect()
        for v in r["embedding"]
    ]
    qcells = [
        cid
        for cid, _ in sorted(
            (
                (
                    int(r["cell_id"]),
                    round(
                        _cos_py(qv, [float(v) for v in r["embedding"]]),
                        6,
                    ),
                )
                for r in cents
            ),
            key=lambda t: (-t[1], t[0]),
        )[:nprobe]
    ]
    qv_lit = _array_literal(tuple(qv))
    return (
        emb.filter(
            F.col("cell_id").isin(qcells)
            & (F.col("vec_id") != query_vec_id)
        )
        .select(
            "vec_id",
            "label",
            "cell_id",
            F.round(
                cosine_similarity(F.col("embedding"), qv_lit), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ann_probe_pruned(
    spark: SparkSession, layout_dir: str, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Top-k cosine ANN over the bucket-partitioned layout, reading
    ONLY the buckets within hamming<=LSH_PROBE_HAMMING of the query's
    bucket (the probe set is enumerated driver-side from the query's
    bucket id -- 37 of 256 partitions -- and lands in the scan as a
    partition ``IN`` filter; tests assert the PartitionFilters line).
    Result matches q_ann_lsh exactly: same buckets, same re-rank."""
    from pyspark.sql import functions as F

    from ..functions.vector import cosine_similarity
    from ..operators.similarity import LSH_PROBE_HAMMING

    emb = spark.read.parquet(layout_dir)
    qrow = emb.filter(F.col("vec_id") == query_vec_id).select(
        "embedding", "bucket"
    ).first()
    if qrow is None:
        raise ValueError(
            f"vec_id {query_vec_id} not found in layout {layout_dir}"
        )
    qbucket = qrow["bucket"]
    probe = [
        b for b in range(256) if bin(b ^ qbucket).count("1") <= LSH_PROBE_HAMMING
    ]
    qv = F.array(*[F.lit(float(v)) for v in qrow["embedding"]])
    return (
        emb.filter(
            F.col("bucket").isin(probe) & (F.col("vec_id") != query_vec_id)
        )
        .select(
            "vec_id",
            "label",
            "bucket",
            F.round(cosine_similarity(F.col("embedding"), qv), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_bytes`` files; returns the output file count.

    Streaming sinks (one file per micro-batch per partition) and
    over-parallel writes accumulate small files, and at scale the
    scheduler/name-node cost of listing+opening them dominates scans
    long before IO does. Sizing = input bytes / target, measured from
    the filesystem (works for any Hadoop-compatible FS, not just
    local). `coalesce`, not `repartition`: compaction must not shuffle
    the data, only merge splits -- at 100 TB the difference is a full
    network pass. Run per partition directory (e.g. per event_date) so
    directory-level pruning survives compaction."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = path.getFileSystem(conf)
    # mode('overwrite') onto the directory being lazily read would
    # delete the input mid-scan (data loss on some filesystems) --
    # compare fully-qualified paths so relative/absolute spellings of
    # the same directory are caught too
    src_q = fs.makeQualified(path).toString()
    out_q = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(out_dir)).toString()
    if src_q.rstrip("/") == out_q.rstrip("/"):
        raise ValueError(
            f"compact_parquet: out_dir must differ from src_dir ({src_q}); "
            "write to a sibling directory and rename"
        )
    total = fs.getContentSummary(path).getLength()
    n_out = max(1, int((total + target_file_bytes - 1) // target_file_bytes))

    df = spark.read.parquet(src_dir)
    df.coalesce(n_out).write.mode("overwrite").parquet(out_dir)
    out_path = jvm.org.apache.hadoop.fs.Path(out_dir)
    it = fs.listFiles(out_path, False)
    n_files = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            n_files += 1
    return n_files


def range_sorted_layout(
    df: DataFrame, sort_col: str, out_dir: str, n_files: int = 8
) -> None:
    """Globally range-sorted parquet: ``repartitionByRange`` assigns
    each output file a disjoint key range, ``sortWithinPartitions``
    orders rows inside it -- together a total order across the layout.
    A range predicate then touches only the files whose parquet
    min/max statistics overlap the range (file- and row-group-level
    skipping), the same effect a clustered index gives a B-tree store,
    at rest and for free on every subsequent scan. Use for the one key
    the table is most often range-filtered by (time, usually); the
    date-directory layout above is the coarse version of the same
    idea when the key is low-cardinality."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def upsert_partitioned(
    spark: SparkSession,
    base_dir: str,
    updates: DataFrame,
    part_col: str,
    key_col: str,
) -> list:
    """Copy-on-write upsert into a directory-partitioned parquet layout:
    rows in ``updates`` replace same-``key_col`` rows (or append) inside
    ONLY the ``part_col`` partitions the updates touch; every other
    partition's files are left physically untouched. Returns the list
    of partition values rewritten.

    This is the patch-a-shard primitive (re-scored documents, late
    corrections) without a table format: at 100 TB the thing that
    matters is that the rewrite is proportional to the TOUCHED
    partitions, not the table --

    - the touched-partition list is a driver artifact (distinct of the
      update batch's partition column, a small collect by definition of
      a patch);
    - the base side reads ONLY those partitions (partition-pruned scan;
      directory pruning at file-listing time);
    - the merge is a left-anti join (updates win on key collision) +
      union, shuffling only touched-partition data;
    - the write uses Spark's dynamic partition overwrite so exactly the
      touched ``part_col=value`` directories are replaced.

    The merged frame is localCheckpoint()-ed before the overwrite: the
    write targets directories the plan reads, so lineage must be cut
    first (same self-overwrite hazard compact_parquet guards against;
    on a cluster use checkpoint() to HDFS instead). NULL partition
    values in updates are rejected -- Spark writes them to the
    __HIVE_DEFAULT_PARTITION__ directory, which is almost never what a
    patch intends."""
    from pyspark.sql import functions as F

    if updates.filter(F.col(part_col).isNull()).limit(1).count():
        raise ValueError(
            f"upsert_partitioned: updates contain NULL {part_col!r}"
        )
    parts = [
        r[0] for r in updates.select(part_col).distinct().collect()
    ]
    if not parts:
        return []
    base = spark.read.parquet(base_dir).filter(
        F.col(part_col).isin(parts)
    )
    merged = base.join(
        updates.select(key_col), key_col, "left_anti"
    ).unionByName(updates)
    merged = merged.localCheckpoint()
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .parquet(base_dir)
    )
    return parts


def zorder_layout(
    df: DataFrame,
    cols: tuple,
    out_dir: str,
    n_files: int = 16,
    bits: int = 6,
) -> None:
    """N-column Z-order (Morton) layout: files cluster on ALL the given
    columns at once, so a predicate on ANY of them (or a box over
    several) skips files via parquet min/max stats -- under a 1-D sort
    every trailing column spans every file and can never skip
    (test-pinned: a narrow trailing-dimension band touches <=8/16
    z-files vs 16/16 sorted files). The trade: leading-column-only
    scans touch more files than the 1-D sort, and per-dimension
    selectivity dilutes as dimensions are added (bits*len(cols) must
    stay <= 63) -- 2-4 columns is the useful range.

    Mechanics (all narrow except the final range exchange):
    - per column, 2^bits rank buckets from approxQuantile boundaries
      (a driver artifact: 2^bits-1 doubles per column, ALL columns in
      ONE quantile job; quantile ranks, not widths, so skew cannot
      collapse buckets);
    - bucket ids bit-interleave into the Morton code z -- an
      expression-level shift/or chain, no UDF;
    - ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` give
      files disjoint z ranges, i.e. locality in every dimension.

    Curve choice: Z-order over Hilbert -- the Morton code is a pure
    closed-form expression (JVM-codegen-able), and its worst-case seam
    overhead vs Hilbert is irrelevant at file granularity."""
    from pyspark.sql import functions as F

    (
        with_zorder(df, cols, bits=bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def with_zorder(
    df: DataFrame, cols, bits: int = 6, col_name: str = "_z"
) -> DataFrame:
    """``df`` plus the Morton code of ``cols`` as ``col_name`` -- the
    reusable half of :func:`zorder_layout` (round 13), so the
    SNAPSHOT protocol clusters multi-dimensionally too:

        snapshot_write(spark, t, with_zorder(df, ("x", "y")),
                       sort_cols=["_z"])

    gives files disjoint in z, hence local in EVERY named dimension --
    and since manifests record per-file min/max for the ORIGINAL
    columns as well, ``read_snapshot(ranges={"y": (lo, hi)})`` prunes
    at manifest level on any dimension, no parquet footers touched.
    Quantile-rank buckets (one driver approxQuantile job, all columns
    at once) + an expression-level shift/or interleave; no UDFs."""
    from pyspark.sql import functions as F

    cols = tuple(cols)
    ndim = len(cols)
    if ndim < 2:
        raise ValueError("with_zorder needs >= 2 columns")
    if bits * ndim > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * ndim} exceeds the 63-bit Morton "
            "budget; lower bits or drop columns"
        )
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    all_qs = df.approxQuantile(list(cols), probs, 0.001)

    def bucket_col(name: str, qs: list) -> "F.Column":
        bounds = F.array(*[F.lit(float(q)) for q in qs])
        # rank bucket = #boundaries <= value  (0 .. n_buckets-1)
        return F.size(
            F.filter(bounds, lambda b: F.col(name).cast("double") >= b)
        )

    buckets = [bucket_col(c, qs) for c, qs in zip(cols, all_qs)]
    # interleave: bit i of dimension d lands at position i*ndim + d',
    # where d' reverses dimension order so the FIRST column owns the
    # most significant bit of each group (leading-column affinity)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, b in enumerate(buckets):
            pos = i * ndim + (ndim - 1 - d)
            z = z + (
                F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long")
                * F.lit(1 << pos).cast("long")
            )
    return df.withColumn(col_name, z)


def pq_codes_layout(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> None:
    """One-time PQ codes table: ``vec_id`` plus one small-int code
    column per subspace, written WITHOUT the embedding column -- the
    ~64x-smaller artifact the ADC scan reads at rest (q_ann_pq's
    in-query form computes the same codes on the fly from raw
    vectors; materializing them is what actually realizes the PQ
    bytes saving on a 100 TB corpus). Codes for EVERY vector -- the
    layout doesn't know which ids a future search will use as
    queries."""
    from ..operators.similarity import (
        pq_codebook_by_m,
        pq_codes_projection,
    )
    from ..tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    by_m = pq_codebook_by_m(spark)
    pq_codes_projection(emb, by_m).write.mode("overwrite").parquet(
        out_dir
    )


def ann_pq_over_layout(
    spark: SparkSession, codes_dir: str, sf_dir: str
) -> "DataFrame":
    """q_ann_pq's search over the at-rest codes table: the ADC scan
    reads ONLY the codes parquet (no embedding column anywhere in its
    scan schema); raw vectors are touched exclusively by the bounded
    |Q| x PQ_SHORTLIST re-rank join-back. Row-exact against the
    on-the-fly q_ann_pq (same codebook, same lookup tables, same
    ranks) -- asserted with the size ratio in tests/test_pq.py."""
    from pyspark.sql import functions as F

    from ..operators.similarity import (
        ANN_JOIN_Q_HI,
        ANN_JOIN_Q_LO,
        adc_search,
        pq_codebook_by_m,
    )
    from ..tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    by_m = pq_codebook_by_m(spark)
    codes = spark.read.parquet(codes_dir).filter(
        ~F.col("vec_id").between(ANN_JOIN_Q_LO, ANN_JOIN_Q_HI)
    )
    # Same fixture, query set and (absent) transform as q_ann_pq, so
    # the cached LUT text/Columns are shared with it by key.
    return adc_search(codes, emb, by_m, plan_cache_key=f"pq:{sf_dir}")


def pq_ivf_codes_layout(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    centroids: str = "trained",
) -> None:
    """The composed production ANN index: PQ codes written to
    ``cell_id=N/`` directories keyed by the IVF quantizer -- cell
    pruning at file-listing time AND 64x-smaller bytes inside every
    cell. The embedding column appears nowhere in the artifact."""
    from pyspark.sql import functions as F

    from ..operators.similarity import (
        _nearest_cell_expr,
        pq_codebook_by_m,
        pq_codes_projection,
    )
    from ..tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroid_rows(spark, emb, centroids)
    by_m = pq_codebook_by_m(spark)
    codes = pq_codes_projection(emb, by_m).join(
        emb.select(
            "vec_id", _nearest_cell_expr(cents).alias("cell_id")
        ),
        "vec_id",
    )
    (
        codes.repartition("cell_id")
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(out_dir)
    )


def ann_pq_probe_pruned(
    spark: SparkSession,
    layout_dir: str,
    sf_dir: str,
    query_vec_id: int,
    k: int = 3,
    nprobe: int | None = None,
    centroids: str = "trained",
) -> "DataFrame":
    """The full production ANN read path over the composed index:
    (1) rank centroids against the query driver-side and keep nprobe
    cells -- compiles to PartitionFilters, pruned at file-listing
    time; (2) ADC-score ONLY the surviving cells' codes (no embedding
    bytes touched); (3) exact inner-product re-rank of the bounded
    top-PQ_SHORTLIST join-back. Pass the SAME ``centroids`` the
    layout was written with (the _ivf_centroid_rows contract)."""
    from pyspark.sql import functions as F

    from ..operators.similarity import (
        IVF_NPROBE,
        PQ_SHORTLIST,
        _adc_lut_terms,
        _array_literal,
        _probe_cells,
        pq_codebook_by_m,
    )
    from ..functions.vector import dot
    from ..tables import load_table

    nprobe = IVF_NPROBE if nprobe is None else nprobe
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroid_rows(spark, emb, centroids)
    qv = [
        float(v)
        for r in emb.filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .collect()
        for v in r["embedding"]
    ]
    qcells = _probe_cells(qv, cents, nprobe)
    by_m = pq_codebook_by_m(spark)
    terms = _adc_lut_terms(qv, by_m)
    adc = (
        f"round(aggregate(array({','.join(terms)}), 0D,"
        " (a, x) -> a + x), 6)"
    )
    shortlist = (
        spark.read.parquet(layout_dir)
        .filter(
            F.col("cell_id").isin(qcells)
            & (F.col("vec_id") != query_vec_id)
        )
        .select("vec_id", "cell_id", F.expr(adc).alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(PQ_SHORTLIST)
    )
    qv_lit = _array_literal(tuple(qv))
    return (
        emb.join(F.broadcast(shortlist), "vec_id")
        .select(
            "vec_id",
            "cell_id",
            "adc",
            F.round(dot(F.col("embedding"), qv_lit), 6).alias("ip"),
        )
        .orderBy(F.desc("ip"), F.asc("vec_id"))
        .limit(k)
    )
