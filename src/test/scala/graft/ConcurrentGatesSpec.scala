package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.spark.sql.DataFrame

/** The r14 board hazard, reproduced and pinned: two runners sharing ONE
  * SparkSession run conf-sensitive physical-invariant gates
  * concurrently. Before r15 these gates toggled SHARED session confs
  * (SPJ keys, broadcast threshold, partitionOverwriteMode, AQE) behind
  * save/restore `finally` blocks and used fixed catalog table names in
  * the one shared warehouse — an interleaved runner could flip another
  * gate's physical boolean mid-probe or corrupt its before/after file
  * listings (the exact signature of the r14 driver board: rows match,
  * invariant booleans red). The probe-session discipline (pinned confs
  * on a throwaway `newSession`, per-invocation `_uN` table names) must
  * keep every emitted boolean TRUE under ANY interleaving, including
  * the same gate racing itself. */
class ConcurrentGatesSpec extends SparkSpec {

  /** Every boolean column of the gate's result, with whether it held
    * on every row. */
  private def boolCols(df: DataFrame): Seq[(String, Boolean)] = {
    val rows = df.collect()
    assert(rows.nonEmpty, "gate returned no rows")
    df.schema.fields.toSeq.collect {
      case f if f.dataType == org.apache.spark.sql.types.BooleanType =>
        f.name -> rows.forall(_.getAs[Boolean](f.name))
    }
  }

  test("conf-sensitive gates keep their physical booleans under concurrent runners") {
    // the two r14-red gates race themselves AND the other conf-mutating
    // gates — same shared session, interleaving unconstrained; the
    // shared-warehouse catalog gates (uniqName-swept) ride along so a
    // regression to fixed table names would corrupt a listing here
    val gates = Seq(
      "meta_partitioned_dpp", "sink_partition_overwrite",
      "join_spj_catalog", "join_bucketed_colocated",
      "meta_partitioned_dpp", "sink_partition_overwrite",
      "meta_partitions_table", "agg_pushdown_meta",
      "meta_zorder_declared", "meta_partition_evolution")
    val pool = Executors.newFixedThreadPool(gates.size)
    try {
      val futs = gates.zipWithIndex.map { case (g, i) =>
        pool.submit(new Callable[(String, Seq[(String, Boolean)])] {
          def call(): (String, Seq[(String, Boolean)]) =
            g -> boolCols(SparkEntry.queries(g)(spark, sf))
        })
      }
      val failed = futs.flatMap { f =>
        val (gate, bools) = f.get(600, TimeUnit.SECONDS)
        bools.collect { case (c, ok) if !ok => s"$gate.$c" }
      }
      assert(failed.isEmpty,
        s"physical booleans flipped under concurrent runners: ${failed.mkString(", ")}")
    } finally pool.shutdownNow()
  }
}
