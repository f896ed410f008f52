package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** CHECK constraints: the ingest-time data-quality contract
  * (SnapshotTable.addConstraint). The contract under test:
  *
  *  1. ENFORCEMENT — a violating append/merge/mergeOnRead fails loudly
  *     and commits NOTHING (no version, no visible rows); appends pay
  *     zero extra jobs (the check rides the write), merges one
  *     validation job naming every violated constraint.
  *  2. SQL CHECK semantics — NULL (unknown) passes; rejecting nulls
  *     takes an explicit IS NOT NULL. A batch missing a constrained
  *     column aligns to null and passes the same way.
  *  3. The constraint is a FACT, not an aspiration: addConstraint
  *     refuses when existing live rows violate the rule.
  *  4. PERSISTENCE — the set is version state carried through delta
  *     commits, compaction, and retention's shadow checkpoints;
  *     dropConstraint lifts the rule from the next version on.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-check").toString

  test("a violating append fails loudly and commits nothing") {
    val root = tmp()
    SnapshotTable.create(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "n"), statsKey = Some("id"))
    SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0")
    SnapshotTable.append(spark, root, Seq((3L, 30L)).toDF("id", "n"))
    assert(SnapshotTable.read(spark, root).count() == 3)
    val before = SnapshotTable.versions(spark, root)
    val e = intercept[Exception] {
      SnapshotTable.append(spark, root, Seq((4L, -5L)).toDF("id", "n"))
    }
    assert(e.getMessage != null || e.getCause != null) // job failed loudly
    assert(SnapshotTable.versions(spark, root) == before,
      "a rejected batch must not commit a version")
    assert(SnapshotTable.read(spark, root).count() == 3)
    assert(SnapshotTable.read(spark, root).filter(col("n") < 0).count() == 0)
  }

  test("NULL passes (SQL CHECK); IS NOT NULL rejects it; absent columns align to null") {
    val root = tmp()
    SnapshotTable.create(spark, root,
      Seq((1L, Some(10L))).toDF("id", "n"), statsKey = Some("id"))
    SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0")
    // null n: n >= 0 is UNKNOWN → passes
    SnapshotTable.append(spark, root, Seq((2L, None: Option[Long])).toDF("id", "n"))
    assert(SnapshotTable.read(spark, root).count() == 2)
    // explicit null rejection is a second constraint
    SnapshotTable.dropConstraint(spark, root, "n_nonneg")
    SnapshotTable.deleteWhere(spark, root, col("n").isNull)
    SnapshotTable.addConstraint(spark, root, "n_present", "n IS NOT NULL")
    intercept[Exception] {
      SnapshotTable.append(spark, root, Seq((3L, None: Option[Long])).toDF("id", "n"))
    }
    assert(SnapshotTable.read(spark, root).count() == 1)
    // schema evolution: a batch without the evolved column null-fills
    // it — and null passes a plain bound just like an explicit null
    SnapshotTable.dropConstraint(spark, root, "n_present")
    SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0")
    SnapshotTable.append(spark, root, Seq(Tuple1(9L)).toDF("id"), allowWiden = true)
    assert(SnapshotTable.read(spark, root).count() == 2)
  }

  test("addConstraint refuses when existing rows violate; duplicates refused") {
    val root = tmp()
    SnapshotTable.create(spark, root,
      Seq((1L, -1L), (2L, 20L)).toDF("id", "n"), statsKey = Some("id"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0")
    }
    assert(e.getMessage.contains("n_nonneg") && e.getMessage.contains("1 row"))
    assert(SnapshotTable.constraints(spark, root).isEmpty)
    SnapshotTable.deleteWhere(spark, root, col("n") < 0)
    SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0")
    val dup = intercept[IllegalArgumentException] {
      SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 10")
    }
    assert(dup.getMessage.contains("already exists"))
  }

  test("merge and mergeOnRead enforce; the violation report names constraint and count") {
    val root = tmp()
    SnapshotTable.create(spark, root,
      (0L until 100L).map(i => (i, i * 10L)).toDF("id", "n")
        .repartitionByRange(4, col("id")), statsKey = Some("id"))
    SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0")
    SnapshotTable.addConstraint(spark, root, "id_bound", "id < 1000")
    SnapshotTable.merge(spark, root, Seq((5L, 555L)).toDF("id", "n"), key = "id")
    assert(SnapshotTable.read(spark, root).filter(col("id") === 5L)
      .head().getLong(1) == 555L)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.merge(spark, root,
        Seq((6L, -1L), (7L, -2L), (2000L, 1L)).toDF("id", "n"), key = "id")
    }
    assert(e.getMessage.contains("'n_nonneg'") && e.getMessage.contains("2 row"))
    assert(e.getMessage.contains("'id_bound'") && e.getMessage.contains("1 row"))
    assert(SnapshotTable.read(spark, root).count() == 100)
    intercept[IllegalArgumentException] {
      SnapshotTable.mergeOnRead(spark, root, Seq((8L, -3L)).toDF("id", "n"), key = "id")
    }
    assert(SnapshotTable.read(spark, root).filter(col("n") < 0).count() == 0)
  }

  test("violations(df): pre-flight dry run counts per rule, commits nothing") {
    val root = tmp()
    SnapshotTable.create(spark, root, Seq((1L, 5L)).toDF("id", "n"))
    SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0")
    SnapshotTable.addConstraint(spark, root, "id_present", "id IS NOT NULL")
    val candidate = Seq((2L, 3L), (3L, -1L), (4L, -2L)).toDF("id", "n")
    val report = SnapshotTable.violations(spark, root, candidate)
    assert(report == Seq("n_nonneg" -> 2L, "id_present" -> 0L))
    // the dry run committed nothing and enforced nothing
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2, 3))
    assert(SnapshotTable.read(spark, root).count() == 1)
    // a clean batch reports all-zero; an unconstrained table, empty
    val clean = SnapshotTable.violations(spark, root, Seq((9L, 9L)).toDF("id", "n"))
    assert(clean.forall(_._2 == 0L))
    val root2 = tmp()
    SnapshotTable.create(spark, root2, Seq((1L, 1L)).toDF("id", "n"))
    assert(SnapshotTable.violations(spark, root2, candidate).isEmpty)
  }

  test("restore rolls the constraint set back WITH the data (Delta RESTORE semantics)") {
    val root = tmp()
    // v1 holds a row a LATER rule would forbid; v2 cleans it up; v3
    // declares the rule (valid against v2's state). A restore to v1
    // brings the violating row back — under the HEAD's rule set that
    // would silently break addConstraint's 'a constraint is a fact
    // about the whole table from its commit on' invariant, so restore
    // carries the TARGET's (empty) set instead: rows and rules stay
    // internally consistent at every version.
    SnapshotTable.create(spark, root,
      Seq((1L, 5L), (2L, -3L)).toDF("id", "n"))                    // v1
    SnapshotTable.deleteWhere(spark, root, col("n") < 0)           // v2
    SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0") // v3
    SnapshotTable.restore(spark, root, 1)                          // v4
    assert(SnapshotTable.constraints(spark, root).isEmpty,
      "restore must carry the target version's constraint set, not the head's")
    assert(SnapshotTable.read(spark, root).filter(col("n") < 0).count() == 1,
      "the restored state is v1's rows, violating row included")
    // re-declaring the rule now VALIDATES against the restored rows
    // and refuses — the invariant holds by construction
    assert(scala.util.Try(
      SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0")).isFailure)
    // clean up again and the rule takes
    SnapshotTable.deleteWhere(spark, root, col("n") < 0)           // v5
    SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0") // v6
    assert(SnapshotTable.constraints(spark, root) == Seq("n_nonneg" -> "n >= 0"))
  }

  test("constraints persist through deltas, compaction, and retention checkpoints") {
    val root = tmp()
    SnapshotTable.create(spark, root,
      Seq((1L, 10L)).toDF("id", "n"), statsKey = Some("id"))
    SnapshotTable.addConstraint(spark, root, "n_nonneg", "n >= 0")
    (2 to 5).foreach(i => SnapshotTable.append(spark, root,
      Seq((i.toLong, i * 10L)).toDF("id", "n").coalesce(1)))  // delta commits
    SnapshotTable.compact(spark, root, targetFiles = 1)        // full checkpoint
    assert(SnapshotTable.constraints(spark, root) == Seq("n_nonneg" -> "n >= 0"))
    // expiry that cuts a chain: the shadow checkpoint carries C-lines
    SnapshotTable.append(spark, root, Seq((6L, 60L)).toDF("id", "n"))
    SnapshotTable.append(spark, root, Seq((7L, 70L)).toDF("id", "n"))
    SnapshotTable.expireVersions(spark, root, keepLast = 2)
    assert(SnapshotTable.constraints(spark, root) == Seq("n_nonneg" -> "n >= 0"))
    assert(SnapshotTable.describeDetail(spark, root).nConstraints == 1,
      "the maintenance surface reports the live rule count")
    intercept[Exception] {
      SnapshotTable.append(spark, root, Seq((8L, -80L)).toDF("id", "n"))
    }
    assert(SnapshotTable.read(spark, root).filter(col("n") < 0).count() == 0)
    // and the dropped rule really lifts
    SnapshotTable.dropConstraint(spark, root, "n_nonneg")
    SnapshotTable.append(spark, root, Seq((9L, -90L)).toDF("id", "n"))
    assert(SnapshotTable.read(spark, root).filter(col("n") < 0).count() == 1)
  }
}
