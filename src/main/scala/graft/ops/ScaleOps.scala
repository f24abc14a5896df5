package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale tooling (SURVEY.md §7.4 / §4): skew salting and bucketed
  * co-location — the two manual levers that complement AQE on a real
  * cluster. */
object ScaleOps {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random salt in [0, salt); the small side is exploded across all salt
    * values. Same rows as a plain inner equi-join, but hot keys spread
    * over `salt` reducers instead of one. Use when AQE skew handling
    * isn't available (e.g. a forced shuffle plan) or keys are
    * pathologically hot. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int = 8): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Build a Bloom filter over `small`'s join keys, distributed: each
    * partition folds its keys into a fixed-size word array (map-side,
    * no shuffle of keys), and the arrays OR together on the driver —
    * driver state is `2^log2Bits` BITS regardless of row count (the
    * model-sized-driver-state rule). Returns the wire form consumed by
    * `graft_bloom_contains`. An empty build side yields the all-zero
    * filter, which rejects every probe — the correct semi-join result. */
  def bloomFilterB64(small: DataFrame, keyCol: String,
                     log2Bits: Int = 20, k: Int = 5): String = {
    require(log2Bits >= 6 && log2Bits <= 30, s"log2Bits out of range: $log2Bits")
    val numWords = 1 << (log2Bits - 6)
    val mask = (1 << log2Bits) - 1
    val keys = small.select(col(keyCol).cast("long").as("k")).na.drop()
    val words = keys.queryExecution.toRdd
      .treeAggregate(new Array[Long](numWords))(
        seqOp = (w, row) => {
          graft.functions.BloomCodec.add(w, mask, k, row.getLong(0)); w
        },
        combOp = (a, b) => {
          var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
        })
    graft.functions.BloomCodec.encode(k, words)
  }

  /** Two-phase runtime-filtered equi-join: build a Bloom filter from the
    * (already filtered) small side, prune the big side BEFORE its shuffle
    * with the codegen'd `graft_bloom_contains` probe, then run the exact
    * join — false positives drop out there, so the result is row-identical
    * to the plain join (which is what the q141 oracle checks). At 100 TB
    * this is the difference between shuffling the whole fact table and
    * shuffling only the ~selectivity fraction that can possibly match;
    * it complements `broadcast()` (which removes the shuffle but caps the
    * build side by executor memory — a Bloom filter caps it by BITS). */
  def bloomPruneJoin(big: DataFrame, small: DataFrame,
                     bigKey: String, smallKey: String,
                     log2Bits: Int = 20, k: Int = 5): DataFrame = {
    val b64 = bloomFilterB64(small, smallKey, log2Bits, k)
    graft.functions.GraftFunctions.register(big.sparkSession)
    big.where(call_function("graft_bloom_contains",
        col(bigKey).cast("long"), lit(b64)))
      .join(small, col(bigKey) === col(smallKey))
  }

  /** Persist a DataFrame bucketed+sorted on its join key: two tables
    * bucketed the same way equi-join with NO shuffle exchange (the
    * Spark analogue of the reference's Postgres b-tree co-location,
    * `database/migrations/001_initial_schema.sql:81-84`). */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    // Idempotent: drop catalog entry AND any orphaned location left by a
    // previous process (the in-memory catalog forgets, the files don't).
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Morton (Z-order) interleave of two dimension columns — the
    * multi-dimensional clustering key behind Delta/Iceberg `ZORDER BY`:
    * rows close in (a, b) space land close in z space, so EVERY file
    * covers a small rectangle of both dimensions and min/max file
    * skipping prunes on either predicate, not just the leading sort key.
    *
    * Inputs are clamped to 16 bits (`& 0xffff`); the caller maps raw
    * values into that domain first (mod for ids, bucketed rank for
    * continuous values). Bit spreading uses the 4-step mask sequence
    * (each value's bits spaced out to even positions, b shifted to odd)
    * — a handful of codegen'd integer builtins, no UDF. Property-pinned
    * against a driver-side bit-by-bit reference (ScaleOpsSpec). */
  def mortonInterleave(a: org.apache.spark.sql.Column,
                       b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spread(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val x0 = x.cast("long").bitwiseAND(lit(0xffffL))
      val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
      x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Write `df` as parquet laid out in Z-order over two dimension
    * columns: range-partition by the Morton key into `nFiles` files,
    * sort within each, drop the key. At 100 TB this is the LAYOUT lever
    * (vs the per-query levers above): paid once at write time, it makes
    * min/max file skipping effective for box/point predicates on EITHER
    * dimension — a lexicographic (a, b) sort gives pruning on `a` only,
    * with every file spanning the full `b` range (ScaleOpsSpec measures
    * exactly this difference from the written files' footer stats). */
  def writeZOrdered(df: DataFrame, path: String,
                    colA: String, colB: String, nFiles: Int): Unit =
    df.withColumn("__z", mortonInterleave(col(colA), col(colB)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
