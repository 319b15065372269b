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
}
