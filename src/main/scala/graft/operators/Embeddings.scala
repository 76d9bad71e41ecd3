package graft.operators

import graft.functions.VectorFns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column maintenance ops for vector corpora: L2 normalization and
  * int8 quantization — the two standard preprocessing steps before ANN
  * indexing / storage (normalized vectors make cosine = dot; int8 cuts
  * vector bytes 4x for the index shuffle).
  *
  * Both are pure per-row projections (scan speed, no shuffle) emitted in
  * EXPLODED form — (vec_id, dim, value) — with all arithmetic in the fixed
  * point of [[VectorFns]] plus single IEEE ops (`sqrt`, one divide, `floor`)
  * that are bit-identical across engines, so the results hash-match a SQL
  * oracle exactly. The explode happens AFTER the vector-level math: the
  * per-element work downstream of it is plain codegen'd column arithmetic,
  * not an interpreted lambda.
  */
object Embeddings {

  /** L2-normalized vector in 1e-6 fixed point: for each dimension,
    * `floor(q_i * 1e6 / sqrt(sum q_j^2))` where `q` is the 1e-6-quantized
    * input. Zero vectors normalize to zero. Output: (id, dim [1-based],
    * nq [normalized component in 1e-6 units]). */
  def normalizedQ(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = embs.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", VectorFns.norm2Q(col("qv")))
    q.select(col(idCol), col("n2"), posexplode(col("qv")).as(Seq("pos", "qval")))
      .select(
        col(idCol), (col("pos") + 1).cast("long").as("dim"),
        when(col("n2") === 0, lit(0L))
          .otherwise(floor(col("qval") * lit(1000000.0) / sqrt(col("n2").cast("double")))
            .cast("long"))
          .as("nq"))
  }

  /** Mean-pool member vectors into one group vector — chunk embeddings →
    * document embedding, the standard pooling step between chunk-level
    * encoding and document-level retrieval. Element-wise TRUNCATING INTEGER
    * MEAN of the 1e-6-quantized vectors (`sum div count` per (group, dim) —
    * the same exactness trick as kmeansRefine's centroids), so the pooled
    * vectors hash-match a SQL oracle. One posexplode shuffle keyed
    * (group, dim) with map-side partial sums; output exploded
    * (group, dim [1-based], pooled). */
  def meanPool(
      embs: DataFrame, groupCol: Column, vecCol: String): DataFrame =
    embs
      .select(groupCol.as("grp"), posexplode(VectorFns.quantize(col(vecCol))).as(Seq("pos", "x")))
      .groupBy(col("grp"), (col("pos") + 1).cast("long").as("dim"))
      .agg(expr("sum(x) div count(1)").as("pooled"))

  /** Johnson-Lindenstrauss random projection to `outDims` dimensions with a
    * DETERMINISTIC ±1 projection matrix (Achlioptas-style sign matrix,
    * derived per (seed, j, i) from the same md5 scheme as
    * [[Similarity.hyperplaneWeight]] — pure config, reproducible on any
    * cluster AND re-derivable in plain SQL). Components are integer dot
    * products over the 1e-6-quantized input: y_j = Σ_i w_ji · q_i — no
    * float accumulation, so the projected vectors hash-match an oracle.
    *
    * This is the standard cheap dim-reduction in front of ANN / clustering
    * at corpus scale: distances are preserved within (1±ε) w.h.p. while the
    * shuffle payload shrinks dims/outDims ×. Scan-speed projection — the
    * matrix is outDims×dims literal ±1s, never shipped as data. Output:
    * (id, dim [1-based], y) exploded like the other embedding ops. */
  def randomProject(
      embs: DataFrame, idCol: String, vecCol: String,
      outDims: Int, seed: Long = 42L, dims: Int = 64): DataFrame = {
    val q = embs.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
    val projected = array((0 until outDims).map { j =>
      val weights = array((0 until dims).map(i =>
        lit(Similarity.hyperplaneWeight(seed, j, i))): _*)
      VectorFns.dotQ(col("qv"), weights)
    }: _*)
    q.select(col(idCol), posexplode(projected).as(Seq("pos", "y")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("dim"), col("y"))
  }

  /** Symmetric int8 quantization against the per-vector abs-max:
    * `floor(q_i * 127 / max|q_j| + 0.5)` (round-half-up; exact in both
    * engines). Output: (id, dim [1-based], q8, scale_q [the abs-max in 1e-6
    * units — the dequantization factor]). */
  def quantizeInt8(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = embs.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("mq", array_max(transform(col("qv"), x => abs(x))))
    q.select(col(idCol), col("mq"), posexplode(col("qv")).as(Seq("pos", "qval")))
      .select(
        col(idCol), (col("pos") + 1).cast("long").as("dim"),
        when(col("mq") === 0, lit(0L))
          .otherwise(floor(col("qval") * lit(127.0) / col("mq").cast("double") + lit(0.5))
            .cast("long"))
          .as("q8"),
        col("mq").as("scale_q"))
  }
}
