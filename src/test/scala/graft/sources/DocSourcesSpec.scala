package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DocSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl reads typed documents and isolates malformed lines as rows") {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("part0.jsonl"),
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}
        |{"doc_id": 2, "text": "zweites dokument", "lang": "de", "source": "web", "n_chars": 16}
        |this line is not json at all
        |{"doc_id": 3, "text": "third", "lang": "en", "source": "books", "n_chars": 5}
        |""".stripMargin)

    val ok = DocSources.jsonl(spark, dir.toString)
    assert(ok.columns.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(ok.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // column-pruned aggregate works (regression: filtering a PERMISSIVE
    // read on its corrupt column threw here)
    assert(ok.count() === 3)

    // the malformed LINE is routable, the file is not poisoned
    // (project a data column too: Spark disallows queries touching ONLY
    // the corrupt-record column)
    val bad = DocSources.jsonlRaw(spark, dir.toString)
      .select("doc_id", "_corrupt_record")
      .filter($"_corrupt_record".isNotNull)
      .as[(Option[Long], String)].collect()
    assert(bad.length === 1)
    assert(bad.head._2.contains("not json"))
  }

  test("jsonlStream ingests document drops incrementally, exactly once") {
    val dir = Files.createTempDirectory("graft_jsonl_stream")
    val cp = Files.createTempDirectory("graft_jsonl_cp")
    Files.writeString(dir.resolve("drop1.jsonl"),
      """{"doc_id": 1, "text": "first drop", "lang": "en", "source": "web", "n_chars": 10}
        |""".stripMargin)
    val q = DocSources.jsonlStream(spark, dir.toString)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp.toString)
      .format("memory").queryName("docs_stream_out").start()
    try {
      q.processAllAvailable()
      Files.writeString(dir.resolve("drop2.jsonl"),
        """{"doc_id": 2, "text": "second drop", "lang": "en", "source": "web", "n_chars": 11}
          |""".stripMargin)
      q.processAllAvailable()
      val ids = spark.table("docs_stream_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L))
    } finally q.stop()
  }

  test("csv reads quoted text fields and drops malformed rows") {
    val dir = Files.createTempDirectory("graft_csvdocs")
    Files.writeString(dir.resolve("docs.csv"),
      """doc_id,text,lang,source,n_chars
        |1,"comma, inside text",en,web,18
        |2,plain text,de,web,10
        |""".stripMargin)
    val out = DocSources.csv(spark, dir.toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out(1L) === "comma, inside text")
    assert(out(2L) === "plain text")
  }

  test("orc round-trips the documents table with partition pruning and pushdown") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    DocSources.writeOrc(d, dir, partitionBy = Seq("lang"))
    val back = DocSources.orc(spark, dir)
    // same rows (column order differs: partition cols move last)
    assert(back.count() == d.count())
    val a = d.select("doc_id", "text", "lang").orderBy("doc_id").collect()
    val b = back.select("doc_id", "text", "lang").orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // a lang filter becomes partition pruning: the pruned scan reads
    // fewer files than the full one, and the filter reaches the source
    val pruned = back.filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(pruned.contains("PartitionFilters: [isnotnull(lang"), s"no partition pruning:\n$pruned")
    // and a data-column predicate is pushed into the ORC reader
    val pushed = back.filter(col("n_chars") > 100L).queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars"), s"no pushdown:\n$pushed")
  }
}
