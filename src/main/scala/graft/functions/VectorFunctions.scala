package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns
  * (SURVEY.md §7.4 similarity search).
  *
  * Everything computes in DOUBLE with strict left-to-right
  * summation (`aggregate` folds sequentially), so results are
  * bit-reproducible and match an oracle that sums in the same order.
  * Higher-order functions keep the math inside whole-stage codegen —
  * no UDF boxing, no shuffle; a 100 TB corpus scan stays
  * embarrassingly parallel.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ, sequential fold in double — the codegen'd
    * [[DotProduct]] expression (same IEEE op order as the HOF fold
    * below, ~10× faster on all-pairs kernels). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    ColumnGlue.column(DotProduct(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))
  }

  /** Built-ins-only formulation of [[dot]] (interpreted HOFs); kept
    * as the semantic reference — the spec asserts bit-equality
    * between the two. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. NULL when either vector
    * has zero norm. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (monotone with L2 — cheaper for ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** Deterministic random-hyperplane signature for LSH bucketing:
    * bit p = sign(Σᵢ vᵢ · h(seed,p,i)) where h is a hash-derived
    * pseudo-random weight in [-0.5, 0.5). Seeded by construction
    * (xxhash64), so the same signature plan runs identically on every
    * executor and every run — no RNG state to ship. Distinct `seed`
    * values give independent hyperplane sets (OR-amplification
    * tables). Backed by the codegen'd [[HyperplaneSignature]]
    * expression; the spec asserts bit-equality with
    * [[hyperplaneSignatureHof]]. */
  def hyperplaneSignature(vec: Column, planes: Int, seed: Long = 0L): Column = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    ColumnGlue.column(HyperplaneSignature(ColumnGlue.expression(vec), planes, seed))
  }

  /** Per-plane signed projections behind [[hyperplaneSignature]]
    * (`margins[p] > 0 ⇔ signature bit p`) — the probe-ranking input
    * for query-directed multi-probe LSH. See [[HyperplaneMargins]]. */
  def hyperplaneMargins(vec: Column, planes: Int, seed: Long = 0L): Column = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    ColumnGlue.column(HyperplaneMargins(ColumnGlue.expression(vec), planes, seed))
  }

  /** Built-ins-only formulation of [[hyperplaneSignature]]
    * (interpreted nested HOFs); kept as the semantic reference. */
  def hyperplaneSignatureHof(vecCol: String, planes: Int, seed: Long = 0L): Column =
    expr(
      s"""aggregate(
         |  sequence(0, ${planes - 1}),
         |  0L,
         |  (acc, p) -> acc + shiftleft(
         |    CASE WHEN aggregate(
         |      zip_with($vecCol, sequence(0, size($vecCol) - 1),
         |        (v, i) -> CAST(v AS DOUBLE) * ((pmod(xxhash64(${seed}L, p, i), 1000L) / 1000.0) - 0.5)),
         |      0.0D, (a, x) -> a + x) > 0.0D THEN 1L ELSE 0L END, p)
         |)""".stripMargin)
}
