package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Redact.redactPii(col("t")).as("r"))
      .as[String].head()

  test("each PII class maps to its typed token") {
    assert(redactOne("mail bob.smith+x@sub.example.co now") == "mail <EMAIL> now")
    assert(redactOne("from 10.2.3.7 port 80") == "from <IP> port 80")
    assert(redactOne("ssn 123-45-6789.") == "ssn <ID>.")
    assert(redactOne("call 415-555-1234 or 415.555.9999") == "call <PHONE> or <PHONE>")
  }

  test("ordering: emails and IPs are consumed before number shapes") {
    // the digits inside the address/IP must not leak a <PHONE>/<ID>
    assert(redactOne("a 123-45-6789@x.io b") == "a <EMAIL> b")
    assert(redactOne("ip 192.168.001.007 ok") == "ip <IP> ok")
  }

  test("word boundaries stop partial matches") {
    // longer digit runs are not phone numbers
    assert(redactOne("id 1234-567-89012") == "id 1234-567-89012")
    assert(redactOne("v1.2.3.4567 stays") == "v1.2.3.4567 stays")
  }

  test("redaction chain is a single codegen'd projection — no shuffle, no udf") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = d.select(Redact.redactPii(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(plan.contains("WholeStageCodegen") || plan.contains("Project"))
  }
}
