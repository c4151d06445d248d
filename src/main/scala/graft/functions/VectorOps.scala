package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns as codegen-friendly
  * higher-order functions — no UDFs, no serialization boundary, distributed
  * row-at-a-time evaluation (reference treats embeddings as opaque arrays;
  * here they are first-class columns).
  *
  * All arithmetic widens to double BEFORE multiply/accumulate and folds
  * left-to-right, so results are bit-identical to the DuckDB oracle's
  * list_transform/list_sum formulation.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double, left fold — a codegen'd native expression (the HOF
    * `aggregate(zip_with(...))` equivalent is interpreted and allocates per
    * pair, which dominates O(n²) pair enumeration).
    */
  def dot(a: Column, b: Column): Column = FloatVectorDot(a, b)

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(FloatVectorDot(a, a))

  /** Cosine similarity with precomputed norms (norms are computed once per
    * row map-side; pair-wise work is then a single dot product).
    */
  def cosinePre(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
