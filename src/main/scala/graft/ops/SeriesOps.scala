package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value repair over keyed ordered series — the pandas
  * `ffill`/`bfill`/`interpolate` surface as library operators (their
  * oracle-gated query forms are q95/q96). Every operator is one keyed
  * window over one sort: a single shuffle per call at any series count,
  * state bounded by the window frame, never a driver loop.
  *
  * `interpolate` shares one sort across its backward and forward frame
  * passes (same partitioning + ordering → Spark plans one Exchange +
  * one Sort feeding both Window nodes).
  */
object SeriesOps {

  private def running(partCols: Seq[String], orderCol: String) =
    Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def coming(partCols: Seq[String], orderCol: String) =
    Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

  /** Nulls in `valueCols` replaced by the last non-null value at or
    * before the row (per key, in `orderCol` order). Leading nulls stay
    * null — pandas `ffill`. */
  def ffill(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCols: Seq[String]): DataFrame =
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        last(col(c), ignoreNulls = true).over(running(partCols, orderCol)))
    }

  /** Mirror of [[ffill]]: the next non-null value at or after the row;
    * trailing nulls stay null — pandas `bfill`. */
  def bfill(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCols: Seq[String]): DataFrame =
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        first(col(c), ignoreNulls = true).over(coming(partCols, orderCol)))
    }

  /** Nulls in `valueCol` replaced by the linear interpolation between
    * the surrounding observations, with distance measured by `posCol`
    * (numeric or date — anything `datediff`-able resp. subtractable).
    * Rows outside the first/last observation stay null — pandas
    * `interpolate(method='linear', limit_area='inside')`. */
  def interpolate(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCol: String, posCol: String): DataFrame = {
    val bk = running(partCols, orderCol)
    val fw = coming(partCols, orderCol)
    val v = col(valueCol)
    val isDate = df.schema(posCol).dataType ==
      org.apache.spark.sql.types.DateType
    def dist(a: Column, b: Column): Column =
      if (isDate) datediff(a, b).cast("double")
      else (a - b).cast("double")
    val prevV = last(v, ignoreNulls = true).over(bk)
    val prevP = last(when(v.isNotNull, col(posCol)), ignoreNulls = true).over(bk)
    val nextV = first(v, ignoreNulls = true).over(fw)
    val nextP = first(when(v.isNotNull, col(posCol)), ignoreNulls = true).over(fw)
    val lerp = prevV + (nextV - prevV) *
      (dist(col(posCol), prevP) / dist(nextP, prevP))
    df.withColumn(valueCol, when(v.isNotNull, v).otherwise(lerp))
  }
}
