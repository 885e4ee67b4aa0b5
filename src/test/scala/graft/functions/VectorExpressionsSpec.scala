package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, Similarity}

/** Bit-identity guarantees: the codegen'd kernels must produce EXACTLY
  * the doubles/longs of the declarative HOF reference implementations
  * (same fold order), not merely close values — the DuckDB oracle
  * hash-compare depends on it.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotD is bit-identical to the zip_with/aggregate fold on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val asD = transform(col("embedding"), _.cast("double"))
    val pairs = e.select(col("vec_id").as("a"), asD.as("av"))
      .crossJoin(e.select(col("vec_id").as("b"), asD.as("bv")))
      .filter(col("a") < col("b"))
    val diff = pairs.select(
      VectorExpressions.dotD(col("av"), col("bv")).as("fast"),
      aggregate(zip_with(col("av"), col("bv"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("ref"))
      .filter(col("fast") =!= col("ref")) // exact double equality
    diff.count() shouldBe 0
  }

  test("dotD eval (interpreted) matches codegen path") {
    // constant-folded/interpreted evaluation exercises nullSafeEval
    val v = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    v.select(VectorExpressions.dotD(col("a"), col("b"))).collect().head.getDouble(0) shouldBe 32.0
  }

  test("minhashSig is value-identical to the transform/array_min reference") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    // same deterministic coefficients the library uses (seed 42, 64 hashes)
    val (as, bs) = Dedup.hashCoeffs(64, 42L)
    val P = (1L << 61) - 1
    val aArr = array(as.map(lit(_)).toIndexedSeq: _*)
    val bArr = array(bs.map(lit(_)).toIndexedSeq: _*)
    val xs = transform(col("shingles"), s => pmod(xxhash64(s), lit(1L << 31)))
    val both = sets.select(
      VectorExpressions.minhashSig(xs, as, bs, P).as("fast"),
      transform(sequence(lit(0), lit(63)),
        j => array_min(transform(xs,
          x => pmod(element_at(aArr, j + 1) * x + element_at(bArr, j + 1), lit(P))))).as("ref"))
    both.filter(col("fast") =!= col("ref")).count() shouldBe 0
  }
}
