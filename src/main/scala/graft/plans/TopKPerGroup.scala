package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graftbridge.Bridge

/** Column-API surface for the [[TopKPerKey]] operator. */
object TopKPerGroup {

  /** Top `k` rows per distinct value of `keyCols`, ranked by
    * `orderCols` (use `.desc`/`.asc` Columns; bare Columns sort
    * ascending). Include a unique tie-break column for deterministic
    * results. Registers [[TopKPerKeyStrategy]] on the session
    * idempotently. */
  def topK(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    Bridge.addStrategy(df.sparkSession, TopKPerKeyStrategy)
    val keys = keyCols.map(Bridge.sessionExpression(df.sparkSession, _))
    val order = orderCols.map(Bridge.sessionExpression(df.sparkSession, _)).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }
    Bridge.ofRows(df.sparkSession,
      TopKPerKey(keys, order, k, df.queryExecution.logical))
  }
}
