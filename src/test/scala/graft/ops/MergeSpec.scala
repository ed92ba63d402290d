package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  test("mergeInto applies update, insert, delete, and pass-through arms") {
    val source = Seq(
      (2L, "b2", 99.0, false), // update
      (4L, "d", 40.0, false),  // insert (no target match)
      (3L, "c", 30.0, true),   // delete
      (5L, "x", 0.0, true)     // delete of a missing key: no-op
    ).toDF("k", "name", "v", "del")
    val out = Merge.mergeInto(target, source, Seq("k"), "del")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(
      (1L, "a", 10.0),   // untouched
      (2L, "b2", 99.0),  // updated
      (4L, "d", 40.0)))  // inserted
  }

  test("mergeInto fails fast on a duplicated source key") {
    val source = Seq(
      (2L, "b2", 99.0, false),
      (2L, "b3", 98.0, false)
    ).toDF("k", "name", "v", "del")
    val e = intercept[Exception] {
      Merge.mergeInto(target, source, Seq("k"), "del").collect()
    }
    assert(e.getMessage.contains("duplicate merge-source key")
      || e.getCause != null && e.getCause.getMessage.contains("duplicate merge-source key"))
  }

  test("mergeInto fails fast on a null delete flag") {
    // A null flag must not silently turn an update into a no-op (null
    // __del doubles as the "no source row" sentinel post-join).
    val source = Seq(
      (2L, "b2", 99.0, Some(false)),
      (4L, "d", 40.0, None)
    ).toDF("k", "name", "v", "del")
    val e = intercept[Exception] {
      Merge.mergeInto(target, source, Seq("k"), "del").collect()
    }
    assert(e.getMessage.contains("null del")
      || e.getCause != null && e.getCause.getMessage.contains("null del"))
  }

  test("mergeInto rejects a source whose schema drifts from the target") {
    val source = Seq((2L, "b2", false)).toDF("k", "name", "del") // missing v
    val e = intercept[IllegalArgumentException] {
      Merge.mergeInto(target, source, Seq("k"), "del")
    }
    assert(e.getMessage.contains("target schema"))
  }

  test("the snapshot side is joined once, with no extra shuffle beyond the join") {
    val source = Seq((2L, "b2", 99.0, false)).toDF("k", "name", "v", "del")
    val plan = Merge.mergeInto(target, source, Seq("k"), "del")
      .queryExecution.executedPlan.toString
    // exactly one join; the count-window guard sits on the source side
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).size == 1, s"unexpected join count:\n$plan")
  }
}
