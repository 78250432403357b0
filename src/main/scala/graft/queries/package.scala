package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A named query over the fixture tables in `sfDir` (TESTDATA.md). */
  type Query = (SparkSession, String) => DataFrame
}
