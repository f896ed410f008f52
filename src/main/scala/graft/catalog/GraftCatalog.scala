package graft.catalog

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotTable

/** A DSv2 [[TableCatalog]] over snapshot tables: tables are addressed
  * BY NAME in plain SQL on a stock session — no extensions, one conf:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/warehouse")
  * spark.sql("CREATE TABLE graft.corpus.docs (doc_id BIGINT, body STRING)" +
  *   " TBLPROPERTIES ('statsKey'='doc_id')")
  * spark.sql("INSERT INTO graft.corpus.docs SELECT ...")
  * spark.sql("SELECT * FROM graft.corpus.docs VERSION AS OF 3")
  * spark.sql("DELETE FROM graft.corpus.docs WHERE doc_id = 7")   // dv, metadata-only
  * spark.sql("MERGE INTO graft.corpus.docs t USING u ON t.doc_id = u.doc_id" +
  *   " WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
  * spark.sql("ALTER TABLE graft.corpus.docs RENAME COLUMN body TO text")  // zero-copy
  * }}}
  *
  * Layout: `<warehouse>/<namespace…>/<table>` — a table IS its root
  * directory (the `_snapshots` manifest dir marks it), so the catalog
  * holds no state of its own: listing is a directory walk, existence
  * is a manifest check, and every capability the path-addressed API
  * has (time travel, CDC, maintenance) applies to the same roots.
  * Reference analog: the name-addressed collection lifecycle of
  * /root/reference/src/managers/index_manager.py:288-323 (load/create
  * by name), generalized to a warehouse of ACID tables.
  *
  * `ALTER TABLE ADD/RENAME/DROP COLUMN` map onto the zero-copy
  * column-mapping DDL ([[SnapshotTable.renameColumn]] et al.) —
  * top-level fields only, nested paths refuse loudly (same contract as
  * the DDL itself). Identifier parts must be `[A-Za-z0-9_]+`: names
  * become directory names, and a catalog that lets `..` or `/` into a
  * path is an escape hatch, not a catalog. */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array("main")

  private val SafePart = "[A-Za-z0-9_]+".r.pattern
  private def checkParts(parts: Seq[String]): Unit =
    parts.foreach(p => require(SafePart.matcher(p).matches(),
      s"identifier part '$p' is not allowed (letters, digits, underscore only " +
        "— parts become warehouse directory names)"))

  private def nsPath(namespace: Array[String]): Path = {
    checkParts(namespace.toIndexedSeq)
    namespace.foldLeft(new Path(warehouse))((p, n) => new Path(p, n))
  }

  private def tablePath(ident: Identifier): Path = {
    checkParts(ident.namespace.toIndexedSeq :+ ident.name)
    new Path(nsPath(ident.namespace), ident.name)
  }

  private def isTable(p: Path): Boolean = fs.exists(new Path(p, "_snapshots"))

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(catalogName +: namespace)
    fs.listStatus(dir).filter(s => s.isDirectory && isTable(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName)).sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    try isTable(tablePath(ident)) catch { case _: IllegalArgumentException => false }

  /** Resolve `ns.tbl.files` / `ns.tbl.history` — an identifier whose
    * LAST part names a metadata relation of the table the REST of the
    * identifier names (Iceberg's metadata-table addressing). A real
    * table always wins over the suffix interpretation. */
  private def metadataTable(ident: Identifier,
      version: Option[Int]): Option[Table] =
    if (!GraftMetadataTable.Kinds(ident.name.toLowerCase(java.util.Locale.ROOT))
      || ident.namespace.isEmpty) None
    else {
      val parent = Identifier.of(ident.namespace.init, ident.namespace.last)
      val pp = tablePath(parent)
      if (!isTable(pp)) None
      else Some(new GraftMetadataTable(spark, pp.toString, fullName(ident),
        ident.name.toLowerCase(java.util.Locale.ROOT), version))
    }

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (isTable(p)) new GraftTable(spark, p.toString, fullName(ident), None)
    else metadataTable(ident, None).getOrElse(throw new NoSuchTableException(ident))
  }

  /** `VERSION AS OF <v>` — the table pinned to a committed version
    * (composes with the `files` metadata relation: an old version's
    * manifest is that version's file list). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF takes a numeric snapshot version; got '$version'")
    }
    val p = tablePath(ident)
    if (isTable(p)) new GraftTable(spark, p.toString, fullName(ident), Some(v))
    else metadataTable(ident, Some(v)).getOrElse(throw new NoSuchTableException(ident))
  }

  /** `TIMESTAMP AS OF <t>` (micros since epoch from the engine) — the
    * newest version committed at or before that instant, resolved by
    * the same clock retention uses. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val tsMs = timestampMicros / 1000L
    val v = SnapshotTable.versionAsOf(spark, p.toString, tsMs).getOrElse(
      throw new IllegalArgumentException(
        s"no version of ${fullName(ident)} was committed at or before $tsMs ms"))
    new GraftTable(spark, p.toString, fullName(ident), Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // `PARTITIONED BY (c, ...)` — identity transforms become the
    // table's declared Hive-style partition columns (directory-valued
    // layout + per-file pruning); functional transforms (bucket(...),
    // days(...)) refuse: bucketing is declared via TBLPROPERTIES
    // ('buckets'), and hidden-partitioning transforms are not
    // supported.
    //
    // DOCUMENTED DIVERGENCE from Hive/Iceberg: NULL partition values
    // are REFUSED at write time (every path: append, MERGE
    // replacement, streaming epoch) rather than landed in a default
    // `__HIVE_DEFAULT_PARTITION__`-style directory. The directory IS
    // the value here — pruning, SHOW/DROP PARTITION, and SPJ identity
    // reporting all parse it back — so an untyped null token would
    // poison every one of those surfaces. Writers must COALESCE nulls
    // to a sentinel value before insert; the write error says so.
    val partitionCols: Seq[String] = partitions.toSeq.map { t =>
      if (t.name == "identity" && t.references.length == 1) {
        val ref = t.references.head
        require(ref.fieldNames.length == 1,
          s"PARTITIONED BY nested field '${ref.describe}' is not supported " +
            "(top-level columns only)")
        ref.fieldNames.head
      } else throw new UnsupportedOperationException(
        s"PARTITIONED BY transform '${t.describe}' is not supported: " +
          "identity columns only (declare bucketing via TBLPROPERTIES ('buckets'='N'))")
    }
    val p = tablePath(ident)
    if (isTable(p)) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(p.getParent)
    val statsKey = Option(properties.get("statsKey"))
    val statsKey2 = Option(properties.get("statsKey2"))
    (statsKey.toSeq ++ statsKey2).foreach(k => require(
      schema.fields.exists(_.name.equalsIgnoreCase(k)),
      s"statsKey '$k' names no column of the table schema"))
    // TBLPROPERTIES('buckets'='N') declares the storage-partitioned
    // layout at birth: every INSERT writes bucket-per-file on the
    // stats key, so co-declared tables join (and GROUP BY the key)
    // with zero shuffles purely through SQL
    val buckets = Option(properties.get("buckets")).map { b =>
      try b.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"TBLPROPERTIES buckets must be an integer, got '$b'")
      }
    }
    // TBLPROPERTIES('zorder'='true') declares z-order CLUSTERING on
    // the (statsKey, statsKey2) pair: maintenance rewrites restore the
    // interleaved layout; appends stay plain (the OPTIMIZE ZORDER
    // model — a per-write interleave would re-read the table)
    val zorder = Option(properties.get("zorder")).exists { z =>
      require(z == "true" || z == "false",
        s"TBLPROPERTIES zorder must be true or false, got '$z'")
      z == "true"
    }
    SnapshotTable.create(spark, p.toString,
      spark.createDataFrame(new util.ArrayList[org.apache.spark.sql.Row](), schema),
      statsKey, statsKey2, buckets = buckets, partitionCols = partitionCols,
      zorder = zorder)
    new GraftTable(spark, p.toString, fullName(ident), None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val root = p.toString
    // validate ALL change kinds BEFORE applying any: each change is its
    // own table commit (the manifest has no multi-statement
    // transaction), so an unsupported kind later in the list must not
    // leave earlier changes already published with no rollback. A
    // SUPPORTED change can still fail mid-list on table state (name
    // conflict, lossy cast) — that refusal names the partial-commit
    // semantics loudly.
    changes.foreach {
      case _: TableChange.RenameColumn | _: TableChange.DeleteColumn |
           _: TableChange.AddColumn | _: TableChange.UpdateColumnType => ()
      // LAYOUT EVOLUTION through the stock parser: Spark SQL has no
      // ADD/DROP PARTITION FIELD statement, so the catalog fronts
      // Iceberg-style spec evolution as SET TBLPROPERTIES —
      //   'partitionCols'='a,b' (''=un-partition; per-era pruning:
      //   SnapshotTable.setPartitionSpec), 'buckets'='N' (''=un-declare),
      //   'zorder'='true'|'false' — all metadata-only commits;
      //   maintain(relayout=true) converges the files when wanted
      case c: TableChange.SetProperty
          if c.property == "partitionCols" || c.property == "buckets" ||
             c.property == "zorder" => ()
      case c: TableChange.SetProperty =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE SET TBLPROPERTIES ('${c.property}') is not supported; " +
            "statsKey is fixed at CREATE (re-key via SnapshotTable.compact)")
      case other =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE change ${other.getClass.getSimpleName} is not supported " +
            "on graft tables")
    }
    def applyOne(c: TableChange): Unit = c match {
      case c: TableChange.RenameColumn =>
        SnapshotTable.renameColumn(spark, root, pathOf(c.fieldNames), c.newName)
        ()
      case c: TableChange.DeleteColumn =>
        SnapshotTable.dropColumn(spark, root, pathOf(c.fieldNames))
        ()
      case c: TableChange.AddColumn =>
        SnapshotTable.addColumn(spark, root, pathOf(c.fieldNames), c.dataType)
        ()
      case c: TableChange.UpdateColumnType =>
        // `ALTER TABLE t ALTER COLUMN c TYPE <wider>` — the zero-copy
        // widen DDL (lossless int->bigint / float->double only; the
        // DDL itself refuses lossy casts loudly)
        SnapshotTable.widenColumn(spark, root, pathOf(c.fieldNames), c.newDataType)
        ()
      case c: TableChange.SetProperty if c.property == "partitionCols" =>
        SnapshotTable.setPartitionSpec(spark, root,
          c.value.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        ()
      case c: TableChange.SetProperty if c.property == "buckets" =>
        val n = c.value.trim
        SnapshotTable.setBuckets(spark, root,
          if (n.isEmpty) None
          else Some(try n.toInt catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"TBLPROPERTIES buckets must be an integer or '', got '$n'")
          }))
        ()
      case c: TableChange.SetProperty if c.property == "zorder" =>
        require(c.value == "true" || c.value == "false",
          s"TBLPROPERTIES zorder must be true or false, got '${c.value}'")
        SnapshotTable.setZorder(spark, root, c.value == "true")
        ()
      case _ => () // unreachable: validated above
    }
    changes.zipWithIndex.foreach { case (c, i) =>
      try applyOne(c)
      catch {
        case e: Exception if i > 0 =>
          throw new IllegalStateException(
            s"ALTER TABLE ${fullName(ident)}: change ${i + 1} of " +
              s"${changes.length} failed AFTER the first $i change(s) " +
              "committed (each change is its own table commit; there is " +
              s"no rollback). Cause: ${e.getMessage}", e)
      }
    }
    new GraftTable(spark, root, fullName(ident), None)
  }

  /** A DSv2 field reference as the DDL API's dotted path — nested
    * struct paths are first-class (format 10); the API resolves a
    * LITERAL dotted top-level column first, matching SQL's own
    * resolution order. */
  private def pathOf(fieldNames: Array[String]): String = fieldNames.mkString(".")

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!isTable(p)) false
    else {
      SnapshotTable.forgetTable(p.toString)
      fs.delete(p, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    val to = tablePath(newIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(to.getParent)
    SnapshotTable.forgetTable(from.toString)
    require(fs.rename(from, to), s"rename $from -> $to failed")
  }

  // ---- functions ----
  // System functions, visible in every namespace: `bucket(n, key)` —
  // what the storage-partitioned-join machinery resolves when a scan
  // reports KeyGroupedPartitioning over the bucketed layout
  // ([[GraftBucketFunction]]) — and the retrieval scalars
  // `cosine_sim`/`l2_dist` ([[GraftVectorUnbound]]), so plain SQL can
  // rank a vector-store table by name.

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    Array("bucket", "cosine_sim", "l2_dist").map(Identifier.of(namespace, _))
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name.equalsIgnoreCase("bucket")) GraftBucketFunction
    else if (ident.name.equalsIgnoreCase("cosine_sim"))
      new GraftVectorUnbound("cosine_sim")
    else if (ident.name.equalsIgnoreCase("l2_dist"))
      new GraftVectorUnbound("l2_dist")
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(s => s.isDirectory && !isTable(s.getPath))
      .map(s => Array(s.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val dir = nsPath(namespace)
      if (!fs.exists(dir)) throw new NoSuchNamespaceException(catalogName +: namespace)
      fs.listStatus(dir).filter(s => s.isDirectory && !isTable(s.getPath))
        .map(s => namespace :+ s.getPath.getName)
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || (fs.exists(nsPath(namespace)) && !isTable(nsPath(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    new util.HashMap[String, String]()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(nsPath(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) false
    else {
      require(cascade || fs.listStatus(dir).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
      fs.delete(dir, true)
    }
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace :+ ident.name).mkString(".")
}
