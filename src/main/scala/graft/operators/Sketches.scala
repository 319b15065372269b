package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.functions.Portable

/** Bounded-memory frequency sketches: a per-partition pass whose state
  * never exceeds O(k), for the first stage of exact two-pass heavy-hitter
  * queries over corpora too large to group-by in one shot.
  */
object Sketches {

  /** Misra-Gries candidate pass. Per partition, maintains at most k-1
    * counters over the value stream; whenever a value arrives with no
    * counter and no slot is free, every counter is decremented (zeroed
    * counters drop out). Partition-local guarantee: any value with
    * partition frequency > n_p/k survives. Summing that over partitions
    * (an averaging argument: global frequency > N/k forces partition
    * frequency > n_p/k somewhere) makes the UNION of the partition
    * summaries a superset of every global N/k-heavy hitter.
    *
    * Memory is O(k) per partition no matter the input size, and at most
    * (k-1) x numPartitions candidates come back — so the expensive exact
    * count (pass 2) runs against a provably tiny candidate set instead
    * of the full value domain. This is the genuinely per-partition
    * imperative case the Dataset API can't express declaratively, hence
    * mapPartitions.
    */
  def misraGriesCandidates(values: Dataset[String], k: Int): Dataset[String] = {
    require(k >= 2, s"Misra-Gries needs k >= 2, got $k")
    import values.sparkSession.implicits._
    values.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        counters.get(v) match {
          case Some(c) => counters.update(v, c + 1)
          case None if counters.size < k - 1 => counters.update(v, 1L)
          case None =>
            // decrement-all on a snapshot — mutating a HashMap while
            // iterating it is undefined in scala.collection.mutable
            val snapshot = counters.toList
            counters.clear()
            snapshot.foreach { case (key, c) =>
              if (c > 1) counters.update(key, c - 1)
            }
        }
      }
      counters.keysIterator
    }.distinct()
  }

  /** Bloom membership bitmap over a LongType key column — the
    * MEMBERSHIP sketch beside KLL (ranks), KMV (distinct) and count-min
    * (frequencies). `mBits` bits (power of two) packed into `mBits/64`
    * longs; `k` salted portable hashes set one bit each per key. The
    * result is ONE row holding the whole bitmap as `array<bigint>` —
    * fixed size no matter how many keys went in, so it broadcasts at
    * any build-side cardinality where a hash-set semi-join would not.
    *
    * Bit-OR is the only combine, so the build is one map-side-combined
    * aggregation (at most mBits/64 word rows per partition reach the
    * shuffle) and two bitmaps over different key sets merge by
    * element-wise OR into exactly the bitmap of the union —
    * [[orBitmaps]], the property that lets shards/batches build
    * independently. Guarantees: NO false negatives ever (an inserted
    * key's bits are all set); false positives at rate
    * ~(1 - e^(-k*n/m))^k, paid only as wasted exact-verify work
    * downstream, never as wrong answers. */
  def bloomBuild(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame = {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64,
      s"mBits must be a power of two >= 64, got $mBits")
    val words = mBits / 64
    val pos = (0 until k).map(i => Portable.pmd5Salted(i, col(keyCol)) % mBits)
    keys
      .select(explode(array(pos.map(p =>
        struct(shiftrightunsigned(p, 6).cast(IntegerType).as("w"),
          call_function("shiftleft", lit(1L), p % 64).as("m"))): _*)).as("e"))
      .groupBy(col("e.w").as("w")).agg(bit_or(col("e.m")).as("mask"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("mask")))).as("bm"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("bm"), w), lit(0L))).as("bloom"))
  }

  /** Per-GROUP Bloom bitmaps: one `bloom` array per `grpCol` value —
    * the file-level form of [[bloomBuild]] (group = file path) that
    * backs manifest point-lookup pruning (Maintenance
    * .writeBloomManifest). Same layout, same probe
    * ([[bloomMightContain]]), same guarantees: no false negatives per
    * group, bit-OR merge. The shuffle carries at most
    * groups x mBits/64 word rows after map-side combine. */
  def bloomBuildGrouped(keys: DataFrame, grpCol: String, keyCol: String,
      mBits: Int, k: Int): DataFrame = {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64,
      s"mBits must be a power of two >= 64, got $mBits")
    val words = mBits / 64
    val pos = (0 until k).map(i => Portable.pmd5Salted(i, col(keyCol)) % mBits)
    keys
      .select(col(grpCol), explode(array(pos.map(p =>
        struct(shiftrightunsigned(p, 6).cast(IntegerType).as("w"),
          call_function("shiftleft", lit(1L), p % 64).as("m"))): _*)).as("e"))
      .groupBy(col(grpCol), col("e.w").as("w")).agg(bit_or(col("e.m")).as("mask"))
      .groupBy(col(grpCol))
      .agg(map_from_entries(collect_list(struct(col("w"), col("mask")))).as("bm"))
      .select(col(grpCol), transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("bm"), w), lit(0L))).as("bloom"))
  }

  /** Membership probe against a [[bloomBuild]] bitmap column: true iff
    * ALL k bits for `key` are set. Evaluates scan-stage (the bitmap
    * rides along via a broadcast 1-row cross join); a `true` is only a
    * CANDIDATE — verify exactly downstream. */
  def bloomMightContain(bloom: Column, key: Column, mBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val p = Portable.pmd5Salted(i, key) % mBits
      element_at(bloom, shiftrightunsigned(p, 6).cast(IntegerType) + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), p % 64)) =!= 0L
    }.reduce(_ && _)

  /** Element-wise OR of two bitmaps: bloom(A) | bloom(B) == bloom(A u B)
    * bit-for-bit — the shard/batch merge. */
  def orBitmaps(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.bitwiseOR(y))

  // ------------------------------------------------------------------
  // HyperLogLog — the mergeable DISTINCT sketch beside KMV (q69).
  // KMV keeps the k smallest hashes (k words of state, merge = re-min);
  // HLL keeps one 6-bit register per bucket (HLL_M words here), merge =
  // element-wise MAX — constant state per shard at ANY cardinality, and
  // the merge of shard sketches IS the sketch of the union, exactly.
  // ------------------------------------------------------------------

  /** HLL bucket count. 64 buckets (p = 6 bucket bits out of pmd5's 60,
    * leaving a 54-bit rho field) keeps the register table enumerable in
    * a mirrored SQL oracle while exercising the full register/merge/
    * estimate machinery; a production corpus would use 2^14 buckets —
    * nothing below depends on the constant beyond arithmetic bounds. */
  val HLL_M = 64

  /** Width of the rho field: pmd5 is 60 bits, minus 6 bucket bits. */
  val HLL_RHO_BITS = 54

  /** 1000 x alpha_64, DEFINED as the exact rational 709/1000 (the
    * standard bias constant 0.7213/(1+1.079/64) = 0.70936... truncated
    * to 3 digits) so the estimate is integer arithmetic end to end —
    * a float alpha would make the estimate engine-dependent. */
  val HLL_ALPHA_MILLI = 709L

  /** Exact integer numerator of the milli-estimate:
    * est_milli = floor(ALPHA_MILLI * M^2 * 2^(RHO_BITS+1) / S) where
    * S = sum over buckets of 2^(RHO_BITS+1 - register). Computed as
    * BigInt once; ~1.05e23, inside DECIMAL(38,0)/HUGEINT on both
    * engines. */
  val HLL_EST_NUMERATOR: BigInt =
    BigInt(HLL_ALPHA_MILLI) * HLL_M * HLL_M * (BigInt(1) << (HLL_RHO_BITS + 1))

  /** Linear-counting milli-estimates, indexed by V = number of empty
    * registers (1-based: entry v-1 is floor(1000 * M * ln(M / v))).
    * Precomputed DRIVER-SIDE with one libm so both engines read the
    * same literals — ln at query time would tie bit-equality to two
    * engines' libm rounding. */
  val HLL_LC_MILLI: Seq[Long] =
    (1 to HLL_M).map(v => math.floor(1000.0 * HLL_M * math.log(HLL_M.toDouble / v)).toLong)

  /** Raw-estimate ceiling (in millis) below which linear counting
    * replaces the raw estimate when any register is empty: 2.5 * M,
    * per the original HLL small-range correction. */
  val HLL_LC_CUTOFF_MILLI = 2500L * HLL_M

  /** Per-group HLL registers of a key column, DENSE: exactly HLL_M rows
    * per group value (empty buckets present with register 0), so
    * downstream aggregation and SQL mirrors never special-case missing
    * buckets. Columns: `grpCol`, `bucket` (0..HLL_M-1), `register`.
    *
    * register = max over keys in the bucket of rho(key), where
    * rho = (leading zeros of the 54-bit remainder) + 1 in [1, 55] —
    * computed portably as 55 - length(bin(w)) (w > 0), since both
    * engines' `bin` renders integers without leading zeros. The max is
    * one map-side-combined agg whose key space is |groups| x HLL_M; the
    * raw keys never shuffle. Registers over any partition of the data
    * merge by element-wise max into exactly the registers of the whole
    * — see [[hllMerge]] and HllSpec. */
  def hllRegisters(keys: DataFrame, grpCol: String, keyCol: String): DataFrame = {
    val groups = keys.select(col(grpCol)).distinct()
    val dense = groups.select(col(grpCol),
      explode(sequence(lit(0L), lit(HLL_M - 1L))).as("bucket"))
    val sparse = keys
      .select(col(grpCol), Portable.pmd5(col(keyCol)).as("h"))
      .select(col(grpCol), (col("h") % HLL_M).as("bucket"),
        expr(s"h div $HLL_M").as("w"))
      .select(col(grpCol), col("bucket"),
        when(col("w") === 0, lit(HLL_RHO_BITS + 1L))
          .otherwise(lit(HLL_RHO_BITS + 1L) - length(bin(col("w"))).cast("long"))
          .as("rho"))
      .groupBy(col(grpCol), col("bucket")).agg(max(col("rho")).as("register"))
    dense.join(sparse, Seq(grpCol, "bucket"), "left")
      .select(col(grpCol), col("bucket"),
        coalesce(col("register"), lit(0L)).as("register"))
  }

  /** Merge register tables across groups: the element-wise max per
    * bucket — sketch(merge of groups) == merge of sketches, the
    * property that lets shards/days/sources sketch independently. */
  def hllMerge(registers: DataFrame, grpCol: String, mergedName: String): DataFrame =
    registers.groupBy(col("bucket")).agg(max(col("register")).as("register"))
      .select(lit(mergedName).as(grpCol), col("bucket"), col("register"))

  /** Collapse a dense register table to one row per group with the
    * milli-cardinality estimate, in EXACT integer arithmetic:
    * `s_pow` = sum 2^(55 - register) (<= 64 * 2^55 = 2^61, BIGINT-safe),
    * `est_milli` = HLL_EST_NUMERATOR div s_pow (decimal integral
    * divide; exceeds BIGINT only past ~9.2e15 distinct — beyond any
    * vocabulary), and the small-range linear-counting correction read
    * from the precomputed [[HLL_LC_MILLI]] table. */
  def hllEstimate(registers: DataFrame, grpCol: String): DataFrame = {
    val shift = call_function("shiftleft", lit(1L),
      (lit(HLL_RHO_BITS + 1) - col("register")).cast(IntegerType))
    registers.groupBy(col(grpCol))
      .agg(sum(when(col("register") === 0, 1L).otherwise(0L)).as("v_empty"),
        sum(shift).as("s_pow"))
      .withColumn("est_raw_milli",
        expr(s"CAST('$HLL_EST_NUMERATOR' AS DECIMAL(38,0)) div s_pow"))
      .withColumn("est_milli",
        when(col("est_raw_milli") <= HLL_LC_CUTOFF_MILLI && col("v_empty") > 0,
          element_at(array(HLL_LC_MILLI.map(lit): _*),
            col("v_empty").cast(IntegerType)))
          .otherwise(col("est_raw_milli")))
  }
}
