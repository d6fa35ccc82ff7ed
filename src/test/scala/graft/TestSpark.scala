package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (mirrors the
  * engine's single-shared-session design).
  */
object TestSpark {
  lazy val spark: SparkSession =
    graft.core.GraftSession.build("local[4]", "graft-test", 4)
}
