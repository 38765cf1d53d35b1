"""Online feature store: keyed latest-state table.

Replaces the reference's Redis online store (hashes ``txn:{cc}:stats`` /
``txn:{cc}:data:{id}`` + ZSET timeline, ``redis_writer.py:17-44``) with an
engine-native keyed table:

- state = one row per key (latest by event time, with an optional tiebreak
  column so ordering is total — equal-timestamp redelivery would otherwise
  make the surviving row nondeterministic);
- upsert = MERGE-style union + latest-per-key;
- TTL (Redis EXPIRE 86400, ``redis_writer.py:25,38``) = retention filter on
  event time — state older than (max event time - retention) drops out on
  the next upsert; event-time-driven, so deterministic and replayable.

Two forms:

- :func:`upsert_latest_state` — the pure DataFrame merge (state in, state
  out), used directly by batch serving paths and tests;
- :class:`ParquetOnlineStore` — the durable form the streaming sink uses: a
  parquet table hash-partitioned into key buckets. Each upsert touches ONLY
  the buckets present in the micro-batch (dynamic partition overwrite — the
  same trick ``OfflineStore.backfill`` uses for date partitions), so per
  batch the engine reads |touched buckets| worth of state and rewrites the
  same, never the full table and never through the driver. On a cluster the
  identical pattern targets a Delta/Iceberg MERGE; bucket-partitioned
  parquet keeps it runnable everywhere (no Delta in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.windows import latest_n_per_key

BUCKET_COL = "__kb"


def upsert_latest_state(
    current: DataFrame | None,
    batch: DataFrame,
    key: str,
    ts: str,
    retention_seconds: int | None = 86_400,
    tiebreak: str | None = None,
) -> DataFrame:
    """Merge a micro-batch of per-key rows into the keyed state table.

    Latest row per key wins (by ``ts``, then ``tiebreak`` descending when
    given — pass the txn id so equal-timestamp redelivery is deterministic,
    matching the batch serving paths which tiebreak on ``event_id``). The
    per-key reduction is one hash shuffle on the key; the retention horizon
    is a scalar aggregate (cheap, partial-agg'd) evaluated per upsert, not a
    global window funnel.
    """
    unioned = batch if current is None else current.unionByName(batch)
    latest = latest_n_per_key(unioned, key, ts, n=1, tiebreak=tiebreak).drop("rn")
    if retention_seconds is not None:
        # horizon folded into the plan as a broadcast scalar (the repo's
        # 1-row crossJoin idiom) instead of a per-upsert driver action:
        # in a foreachBatch sink every extra action re-evaluates the
        # micro-batch's stateful aggregation, and the action was ~a
        # whole extra job per batch. NULL horizon (no non-null ts in the
        # union) keeps every row, matching the old skip-the-filter path.
        horizon = unioned.agg(F.max(F.col(ts)).alias("__horizon_ts"))
        latest = (
            latest.crossJoin(F.broadcast(horizon))
            .filter(
                F.col("__horizon_ts").isNull()
                | (
                    F.col(ts)
                    >= F.col("__horizon_ts")
                    - F.expr(f"INTERVAL {retention_seconds} SECONDS")
                )
            )
            .drop("__horizon_ts")
        )
    return latest


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe — works for any scheme Spark can read."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


class ParquetOnlineStore:
    """Durable keyed latest-state table over bucket-partitioned parquet.

    Layout: ``{path}/__kb={0..num_buckets-1}/part-*.parquet`` where
    ``__kb = pmod(xxhash64(key), num_buckets)``. An upsert:

    1. computes the batch's touched buckets (distinct bucket ids — at most
       ``num_buckets`` small ints cross the driver, never rows);
    2. reads ONLY those buckets of the existing state (partition pruning on
       the bucket column);
    3. merges latest-per-key + retention via :func:`upsert_latest_state`;
    4. rewrites ONLY the touched buckets with dynamic partition overwrite.

    State volume per upsert is |keys in touched buckets|, independent of
    total state size; nothing materializes on the driver. ``localCheckpoint``
    before the write breaks the plan's lineage to the path being
    overwritten (Spark refuses a self-overwriting scan otherwise).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "cc_num",
        ts: str = "latest_ts",
        retention_seconds: int | None = 86_400,
        num_buckets: int = 64,
        tiebreak: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.ts = ts
        self.retention_seconds = retention_seconds
        self.num_buckets = num_buckets
        self.tiebreak = tiebreak

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            BUCKET_COL,
            F.pmod(
                F.xxhash64(F.col(self.key).cast("string")), F.lit(self.num_buckets)
            ).cast("int"),
        )

    def exists(self) -> bool:
        return _path_exists(self.spark, self.path)

    def read(self) -> DataFrame:
        """Full state scan (serving S12 'all keys'); per-key lookups on top
        of this prune to one bucket via the partition column."""
        return self.spark.read.parquet(self.path).drop(BUCKET_COL)

    def upsert(self, batch: DataFrame) -> None:
        # materialize the batch ONCE: in a foreachBatch sink the incoming
        # frame is backed by the stateful aggregation, and every separate
        # action (emptiness probe, touched-bucket scan, merge) would
        # re-run that aggregation from the state store. One eager
        # localCheckpoint pins the 25k-ish rows in block storage; the
        # touched-bucket collect and the merge then read memory. An empty
        # batch falls out of the same collect (no separate isEmpty pass).
        b = self._with_bucket(batch).localCheckpoint(eager=True)
        touched = [r[0] for r in b.select(BUCKET_COL).distinct().collect()]
        if not touched:
            return
        if self.exists():
            cur = self.spark.read.parquet(self.path).filter(
                F.col(BUCKET_COL).isin(touched)
            )
            merged = upsert_latest_state(
                cur, b, self.key, self.ts, self.retention_seconds, self.tiebreak
            )
        else:
            merged = upsert_latest_state(
                None, b, self.key, self.ts, self.retention_seconds, self.tiebreak
            )
        (
            # cluster by the partition column BEFORE the partitioned write
            # (guide §6): without it every merge task holds rows of MANY
            # buckets, so each touched bucket directory collects one file
            # PER TASK per upsert (t*b tiny files written, and read back
            # by every later upsert of that bucket); keyed on __kb each
            # bucket lands in exactly one task — one file per touched
            # bucket. Same rows, same merge semantics; r12 optimization.
            merged.repartition(F.col(BUCKET_COL))
            .localCheckpoint(eager=True)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(self.path)
        )

    def delete_keys(self, values: list) -> None:
        """Targeted key deletion on the SERVING state (the online half of
        the right-to-be-forgotten op — ``OfflineStore.delete_keys`` handles
        the history; this clears what ``point_lookup``/``stream_latest_state``
        serve). Rewrites ONLY the key buckets the deleted keys hash into,
        anti-filtered NULL-safely, via dynamic partition overwrite — cost is
        |touched buckets| of state, independent of table size (Redis DEL /
        Delta DELETE analog on bucket-partitioned parquet)."""
        if not values or not self.exists():
            return
        state = self.spark.read.parquet(self.path)
        key_type = state.schema[self.key].dataType.simpleString()
        vals = self.spark.createDataFrame(
            [(v,) for v in values], f"`{self.key}` {key_type}"
        )
        touched = [
            r[0]
            for r in self._with_bucket(vals).select(BUCKET_COL).distinct().collect()
        ]
        # NULL-safe keep predicate: ~isin evaluates to NULL for NULL keys,
        # which would silently drop NULL-key rows sharing a bucket
        remaining = (
            state.filter(F.col(BUCKET_COL).isin(touched))
            .filter(F.col(self.key).isNull() | ~F.col(self.key).isin(values))
            .localCheckpoint(eager=True)
        )
        (
            remaining.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(self.path)
        )
        # dynamic overwrite only replaces buckets PRESENT in the written
        # data — a bucket whose every key was deleted would silently keep
        # its old files; drop those directories explicitly (same FS-API
        # cleanup as OfflineStore.delete_keys).
        kept = {r[0] for r in remaining.select(BUCKET_COL).distinct().collect()}
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        for b in set(touched) - kept:
            hpath = jvm.org.apache.hadoop.fs.Path(f"{self.path}/{BUCKET_COL}={b}")
            hpath.getFileSystem(conf).delete(hpath, True)
