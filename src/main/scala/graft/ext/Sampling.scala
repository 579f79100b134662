package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines
  * (SURVEY.md §7.4 family: corpus preparation at 100 TB).
  *
  * Split membership is a pure function of (salt, id) — an md5-derived
  * bucket in [0, 100) — so it is:
  *  - stable under corpus growth/reordering (a document keeps its
  *    split when new data arrives — the property random splits lose),
  *  - reproducible across engines (the same arithmetic runs in ANSI
  *    SQL: `('0x' || substring(md5(salt || ':' || id), 1, 15))
  *    ::UBIGINT % 100`),
  *  - shuffle-free: a per-row projection that scales linearly.
  *
  * The 60-bit md5 prefix keeps the value positive in a signed long on
  * every engine (same trick as [[SimHash.portableTokenHash]]).
  */
object Sampling {

  /** Bucket in [0, 100) from the portable md5-derived hash. */
  def splitBucket(id: Column, salt: String): Column =
    pmod(
      conv(substring(md5(concat_ws(":", lit(salt), id.cast("string"))), 1, 15),
        16, 10).cast("long"),
      lit(100L))

  /** Adds `bucket` and `split` ∈ {train, val, test}: buckets
    * [0, pctTrain) → train, [pctTrain, pctTrain+pctVal) → val,
    * rest → test. */
  def assignSplit(
      docs: DataFrame,
      idCol: String = "doc_id",
      salt: String = "graft",
      pctTrain: Int = 90,
      pctVal: Int = 5): DataFrame = {
    require(pctTrain >= 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"pctTrain ($pctTrain) + pctVal ($pctVal) must fit in 100")
    val b = splitBucket(col(idCol), salt)
    docs.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < pctTrain, "train")
          .when(col("bucket") < pctTrain + pctVal, "val")
          .otherwise("test"))
  }
}
