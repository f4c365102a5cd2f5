package graft

import org.apache.spark.sql.DataFrame

package object api {
  /** Postfix syntax for [[graft.Seam]] — `frame.seam()` materializes
    * the frame once per invocation under the `spark.graft.seam.mode`
    * knob (local / reliable / lazy / off; see [[graft.Seam]] for the
    * executor-loss trade of each). In scope for every file in this
    * package via the package object. */
  implicit final class SeamSyntax(private val df: DataFrame)
      extends AnyVal {
    def seam(): DataFrame = graft.Seam(df)
  }
}
