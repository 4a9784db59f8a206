package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: ORC, JSON, CSV round-trips
  * of a driver table (schema + values preserved; CSV needs explicit
  * schema-on-read, exercised with header+inferSchema off).
  */
class FormatsSpec extends SparkSpec {

  private def nationSorted = Tables.nation(spark, sf()).orderBy("n_nationkey")

  test("orc round-trip preserves schema and rows") {
    val path = Files.createTempDirectory("graft_orc").toString + "/nation"
    nationSorted.write.orc(path)
    val back = spark.read.orc(path).orderBy("n_nationkey")
    assert(back.schema == nationSorted.schema)
    assert(back.collect().toSeq == nationSorted.collect().toSeq)
  }

  test("json round-trip preserves rows (schema re-applied)") {
    val path = Files.createTempDirectory("graft_json").toString + "/nation"
    nationSorted.write.json(path)
    val back = spark.read.schema(nationSorted.schema).json(path)
      .orderBy("n_nationkey")
    assert(back.collect().toSeq == nationSorted.collect().toSeq)
  }

  test("csv round-trip with header and explicit schema") {
    val path = Files.createTempDirectory("graft_csv").toString + "/nation"
    nationSorted.write.option("header", "true").csv(path)
    val back = spark.read.option("header", "true")
      .schema(nationSorted.schema).csv(path)
      .orderBy("n_nationkey")
    assert(back.collect().toSeq == nationSorted.collect().toSeq)
  }

  test("array columns survive json (embeddings)") {
    val path = Files.createTempDirectory("graft_json2").toString + "/emb"
    val src = Tables.embeddings(spark, sf()).orderBy("vec_id").limit(50)
    src.write.json(path)
    val back = spark.read.schema(src.schema).json(path).orderBy("vec_id")
    assert(back.count() == 50)
    val a = src.select("embedding").head().getSeq[Float](0)
    val b = back.select("embedding").head().getSeq[Float](0)
    assert(a == b)
  }
}
