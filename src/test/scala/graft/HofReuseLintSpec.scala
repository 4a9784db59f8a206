package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level gate for the r14 HOF-reuse class: whole-stage
  * codegen's subexpression elimination does NOT cover higher-order
  * functions, so a local bound to a tokenization/HOF expression and
  * referenced twice inside one expression tree evaluates the corpus
  * pass per reference (langId re-tokenized 6×, q71 split 8× per row,
  * q212 ran >20 min at 100×). PlanAudit cannot see this — the plan
  * SHAPE is fine, the expression work is multiplied — and the bench
  * tripwire only catches it after it ships, so this gate reads the
  * SOURCE: any `val x = words(...)/wordNgrams(...)/split-HOF` local
  * referenced more than once in its enclosing def must instead be a
  * materialized column (`withColumn("_x", ...)` then `col("_x")` —
  * multi-referenced non-cheap aliases survive CollapseProject) or a
  * `...FromWords` variant fed one.
  */
class HofReuseLintSpec extends AnyFunSuite {

  private val builders = Seq(
    "words\\(", "wordNgrams\\(", "wordNgramsFromWords\\(words\\(",
    "split\\(col", "split\\(lower", "filter\\(split", "transform\\(split")

  private def violations(src: String, where: String): Seq[String] = {
    val defs = src.split("\n  def ").toSeq
    defs.drop(1).flatMap { d =>
      val name = d.takeWhile(_ != '(').trim
      val pat = ("val (\\w+)\\s*=\\s*(" + builders.mkString("|") + ")").r
      pat.findAllMatchIn(d).flatMap { m =>
        val v = m.group(1)
        val uses = ("\\b" + java.util.regex.Pattern.quote(v) + "\\b").r
          .findAllIn(d).length - 1
        if (uses >= 2)
          Some(s"$where#$name: val $v (HOF-built) referenced ${uses}x" +
            " — materialize it as a column or use a FromWords variant")
        else None
      }
    }
  }

  test("no multi-referenced HOF-built locals in operators or SparkEntry") {
    val root = new java.io.File("src/main/scala/graft")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val bad = walk(root).flatMap { f =>
      violations(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"),
        f.getName)
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("the rule is alive (negative fixture)") {
    val fixture =
      "object Bad {\n  def bad(text: Column): Column = {\n" +
        "    val ws = words(text)\n" +
        "    size(ws) + size(array_distinct(ws))\n  }\n}\n"
    assert(violations(fixture, "fixture").nonEmpty)
  }
}
