package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** Round-6 optimization parity: the codegen vector expressions
  * (functions/VectorExpressions) must be bit-identical to the r1-r5
  * higher-order-function forms they replaced — including every degenerate
  * shape the HOF null semantics produced (null vector, null component,
  * length mismatch). The q_sim / q_dup_embedding oracles pin the happy
  * path at sf scale; this spec pins the edges. */
class VectorSpec extends SparkTestBase {

  private val dim = 6
  private val planes = 4

  // edge shapes: normal, negative/zero, null components, wrong lengths
  // (short, long, empty), null vector
  private def fixture = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(0, Seq(0.1f, -0.2f, 0.3f, -0.4f, 0.5f, -0.6f)),
      Row(1, Seq(0.0f, 0.0015f, -0.0015f, 1.0f, -1.0f, 2.5f)),
      Row(2, Seq(0.1f, null, 0.3f, -0.4f, 0.5f, -0.6f)),
      Row(3, Seq(0.1f, -0.2f, 0.3f)),
      Row(4, Seq(0.1f, -0.2f, 0.3f, -0.4f, 0.5f, -0.6f, 0.7f)),
      Row(5, Seq.empty[Float]),
      Row(6, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => r: Row), 2), schema)
  }

  test("quantize_vec equals the transform-HOF form on all edge shapes") {
    val df = fixture
    val got = df.select(col("id"), Similarity.quantized(col("v")).as("q"))
      .orderBy("id").collect()
    val want = df.select(col("id"), Similarity.quantizedHof(col("v")).as("q"))
      .orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("qdot_long equals the aggregate/zip_with form on all edge pairs") {
    val df = fixture
    val q = df.select(col("id"), Similarity.quantized(col("v")).as("q"))
    val pairs = q.as("a").crossJoin(q.as("b"))
    val got = pairs.select(col("a.id"), col("b.id"),
        Similarity.qdot(col("a.q"), col("b.q")).as("s"))
      .orderBy("a.id", "b.id").collect()
    val want = pairs.select(col("a.id"), col("b.id"),
        Similarity.qdotHof(col("a.q"), col("b.q")).as("s"))
      .orderBy("a.id", "b.id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("lsh_bucket equals the per-plane HOF form incl. degenerate shapes") {
    val df = fixture
    val got = df.select(col("id"),
        Similarity.lshBucket(col("v"), dim, planes).as("b"))
      .orderBy("id").collect()
    val want = df.select(col("id"),
        Similarity.lshBucketHof(col("v"), dim, planes).as("b"))
      .orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
    // degenerate shapes (ids 2..6) all bucket to 0 in BOTH forms
    got.filter(r => r.getInt(0) >= 2).foreach(r => assert(r.getLong(1) == 0L))
  }

  test("expressions survive real embeddings end-to-end (dim 64, 8 planes)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = emb.select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), 64, 8).as("b"))
      .orderBy("vec_id").collect()
    val want = emb.select(col("vec_id"),
        Similarity.lshBucketHof(col("embedding"), 64, 8).as("b"))
      .orderBy("vec_id").collect()
    assert(got.toSeq == want.toSeq)
    // ordered before limit: an unordered limit may pick different rows on
    // each of the two crossJoin executions below
    val q = emb.orderBy("vec_id")
      .select(col("vec_id"), Similarity.quantized(col("embedding")).as("q"))
      .limit(20)
    val gotDot = q.as("a").crossJoin(q.as("b"))
      .select(Similarity.qdot(col("a.q"), col("b.q")).as("s"))
      .collect().map(_.getLong(0)).sorted
    val wantDot = q.as("a").crossJoin(q.as("b"))
      .select(Similarity.qdotHof(col("a.q"), col("b.q")).as("s"))
      .collect().map(_.getLong(0)).sorted
    assert(gotDot.toSeq == wantDot.toSeq)
  }
}
