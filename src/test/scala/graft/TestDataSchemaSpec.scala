package graft

import org.apache.spark.sql.types._

/** Testdata schema-drift gate (round-6 verdict task 4).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * migrated physical types once (events.ts TIMESTAMP(NANOS) → timestamp[us],
  * which silently broke 45 registered queries with one opaque analyzer error
  * each). This spec reads every table at sf0.001 and asserts the exact
  * column/type surface the `TestTables` adapter and query registry depend
  * on — so the NEXT silent migration fails ONE test with ONE message naming
  * the drifted column, instead of 45 crashes downstream.
  *
  * The assertions are written against the *Spark-visible* types (i.e. after
  * `nanosAsLong` and NTZ mapping), because that is the contract the query
  * code actually consumes. `events.ts` is special-cased: any of the types
  * `TestTables.events` can normalize is acceptable, and the normalized
  * output must be a session-TZ TIMESTAMP.
  */
class TestDataSchemaSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def available: Boolean = new java.io.File(sfDir).isDirectory

  /** Assert `table`'s Spark-read schema carries exactly (name -> type) in
    * order, reporting every mismatch in one message. */
  private def assertSchema(table: String, expected: Seq[(String, DataType)],
                           accept: Map[String, Set[DataType]] = Map.empty): Unit = {
    val got = spark.read.parquet(s"$sfDir/$table.parquet").schema
    val gotPairs = got.fields.map(f => f.name -> f.dataType).toSeq
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    if (gotPairs.map(_._1) != expected.map(_._1))
      problems += s"column set/order drifted: expected ${expected.map(_._1).mkString(",")} " +
        s"got ${gotPairs.map(_._1).mkString(",")}"
    else expected.zip(gotPairs).foreach { case ((name, want), (_, have)) =>
      val ok = accept.get(name).map(_.contains(have)).getOrElse(have == want)
      if (!ok) problems += s"column `$name` drifted: expected $want" +
        accept.get(name).map(a => s" (or any of ${a.mkString("/")})").getOrElse("") +
        s", testdata now carries $have"
    }
    assert(problems.isEmpty,
      s"\n/root/testdata schema drift in $table.parquet — update graft.TestTables " +
        s"and the oracle SQL for the new physical types:\n  ${problems.mkString("\n  ")}")
  }

  test("all testdata tables match the adapter's expected schemas") {
    assume(available, s"$sfDir not present in this environment")
    assertSchema("region", Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema("nation", Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertSchema("customer", Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertSchema("supplier", Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertSchema("part", Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
    // Timestamp columns: the driver has shipped both NANOS(→long under
    // nanosAsLong) and unadjusted micros (→NTZ); both are adapter-supported.
    val tsKinds: Set[DataType] = Set(LongType, TimestampNTZType, TimestampType)
    assertSchema("orders", Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
      accept = Map("o_orderdate" -> tsKinds))
    assertSchema("lineitem", Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
      accept = Map("l_shipdate" -> tsKinds))
    assertSchema("events", Seq("event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType),
      accept = Map("ts" -> tsKinds))
    assertSchema("documents", Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType))
    assertSchema("embeddings", Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("TestTables.events normalizes ts to a session-TZ TIMESTAMP") {
    assume(available, s"$sfDir not present in this environment")
    val df = TestTables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"events adapter must emit TimestampType, got ${df.schema("ts").dataType}")
    assert(df.limit(1).count() == 1, "events adapter must be readable")
  }
}
