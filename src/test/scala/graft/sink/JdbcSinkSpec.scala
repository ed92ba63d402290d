package graft.sink

import java.sql.{Connection, DriverManager, DriverPropertyInfo, SQLException}
import java.util.Properties
import java.util.logging.Logger
import graft.SparkSpec
import graft.config.JdbcConf

/** A JDBC driver that always fails to connect, counting attempts —
  * verifies the reference's retry ×3 contract (`pipeline.py:59-83`)
  * without a database in the sandbox.
  */
object FailingDriver extends java.sql.Driver {
  @volatile var attempts = 0
  private val prefix = "jdbc:graft-fail:"
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else { attempts += 1; throw new SQLException("connection refused (test)") }
  override def acceptsURL(url: String): Boolean = url.startsWith(prefix)
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}

class JdbcSinkSpec extends SparkSpec {

  test("connect failure retries 3 times with backoff, then gives up (T5 parity)") {
    DriverManager.registerDriver(FailingDriver)
    try {
      FailingDriver.attempts = 0
      val sink = new JdbcSink(JdbcConf(
        "jdbc:graft-fail://nowhere", "u", "p",
        retries = 3, retryDelaySec = 0)) // 0 s backoff: tests don't sleep
      val df = spark.range(1).toDF("x")
      // write returns false (file retained for retry) without touching
      // the frames; exactly `retries` connection attempts were made.
      assert(!sink.write("f.csv", df, df))
      assert(FailingDriver.attempts === 3)
    } finally DriverManager.deregisterDriver(FailingDriver)
  }
}
