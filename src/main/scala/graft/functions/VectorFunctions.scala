package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, built from Spark's
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDFs in the hot path (SURVEY.md §7.7; builder-prompt preference
  * order: compose built-ins before custom expressions). */
object VectorFunctions {

  /** array<float|double> → array<double>. */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Σ aᵢ·bᵢ via zip_with + aggregate (single pass, codegen). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Plain-Scala dot, mirroring [[DotProduct]]'s loop order exactly. */
  def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i) * b(i); i += 1 }
    d
  }

  /** Plain-Scala normalize, mirroring the `transform(v, _ / nrm)` plan. */
  def normalizeLocal(a: Array[Double]): Array[Double] = {
    val nrm = math.sqrt(dotLocal(a, a))
    if (nrm == 0.0) a else a.map(_ / nrm)
  }

  /** Plain-Scala cosine via normalize-then-dot — the exact op order of
    * the Similarity query plans, so test comparisons are bit-exact. */
  def cosineLocal(a: Array[Double], b: Array[Double]): Double =
    dotLocal(normalizeLocal(a), normalizeLocal(b))

  /** Deterministic random hyperplanes for sign-LSH: `n` planes × `dim`,
    * fixed seed — identical on driver and executors. */
  def hyperplanes(n: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(r.nextGaussian()))
  }

  /** Sign-LSH bucket id of a vector under the given planes. */
  def lshBucket(planes: Array[Array[Double]])(v: Seq[Float]): Int = {
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      var d = 0.0; var i = 0
      val plane = planes(p)
      while (i < plane.length && i < v.length) { d += plane(i) * v(i); i += 1 }
      if (d >= 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }
}
