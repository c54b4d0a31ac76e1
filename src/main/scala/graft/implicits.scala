package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Session-free `$"colName"` interpolator (spark.implicits._ needs a live
  * SparkSession; operator code here is pure plan construction).
  */
object implicits {
  implicit class ColInterp(val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
