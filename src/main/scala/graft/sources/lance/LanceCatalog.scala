package graft.sources.lance

import java.util

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Lance catalog, two faces:
  *
  *  - **Path catalog** (always on): `SELECT * FROM lance.`/path/ds.lance``
  *    — the Spark-native face of the reference's replacement scan (R5).
  *    The identifier's last part is the dataset path (namespace parts, if
  *    any, are joined back with '/').
  *  - **Warehouse database** (opt-in): with
  *    `spark.sql.catalog.lance.warehouse=/data/ldb`, a bare table name
  *    resolves to `<warehouse>/<name>.lance` — the lancedb
  *    `connect(uri)` database face (`create_table` = CTAS,
  *    `table_names` = SHOW TABLES, `open_table` = SELECT,
  *    `drop_table`/`rename_table` = DROP/ALTER RENAME). Identifiers
  *    containing '/' or ending '.lance' stay path-resolved, so both faces
  *    coexist on one catalog.
  *
  * Register with `spark.sql.catalog.lance=graft.sources.lance.LanceCatalog`.
  */
class LanceCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with FunctionCatalog {
  private var catalogName = "lance"
  private var warehouse: Option[String] = None

  // --- FunctionCatalog: the `bucket` transform for storage-partitioned
  // joins over bucketBy-written datasets (see LanceBucket) ---------------
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      (Seq("bucket") ++ LanceDays.Units)
        .map(n => Identifier.of(Array.empty, n)).toArray
    else Array.empty
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") new LanceBucketFunction
    else if (LanceDays.Units.contains(ident.name()))
      new LanceDaysFunction(ident.name())
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
      catalogName, ident.name())

  // --- ProcedureCatalog: CALL lance.compact/vacuum/restore/tags/versions --
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    LanceProcedures.procedures(warehouse).getOrElse(ident.name(),
      throw new RuntimeException(
        s"lance: no procedure '${ident.name()}' " +
        s"(have: ${LanceProcedures.procedures(warehouse).keys.toSeq.sorted.mkString(", ")})"))
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    LanceProcedures.procedures(warehouse).keys.toArray.sorted
      .map(n => Identifier.of(namespace, n))

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
  }
  override def name(): String = catalogName

  /** Is this identifier a warehouse-named table (vs a filesystem path)? */
  private def named(ident: Identifier): Boolean =
    warehouse.isDefined && ident.namespace().isEmpty &&
      !ident.name().contains("/") && !ident.name().endsWith(".lance")

  private def pathOf(ident: Identifier): String =
    if (named(ident)) s"${warehouse.get}/${ident.name()}.lance"
    else (ident.namespace() :+ ident.name()).mkString("/")

  private def hadoop(path: String) = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    LanceFormat.fileSystem(path, conf)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    warehouse match {
      case Some(w) if namespace.isEmpty =>
        val (fs, p) = hadoop(w)
        if (!fs.exists(p)) Array.empty
        else fs.listStatus(p)
          .filter(st => st.isDirectory && st.getPath.getName.endsWith(".lance"))
          .map(st => Identifier.of(Array.empty,
            st.getPath.getName.stripSuffix(".lance")))
      case _ => Array.empty
    }

  /** Declared layout recovered from the manifest → write defaults, so SQL
    * INSERT INTO through the catalog keeps a partitioned/bucketed table's
    * layout (the table-contract behavior; the plain path stays low-level
    * and degrades, as its suites pin). */
  private def layoutOf(path: String): (Seq[String], Seq[String]) = {
    val (fs, p) = hadoop(path)
    if (!fs.exists(new org.apache.hadoop.fs.Path(p, "_versions"))) (Nil, Nil)
    else {
      val m = LanceFormat.readManifest(fs,
        LanceFormat.latestManifestPath(fs, p, None))
      val sort =
        if (m.partitionCols.exists(c => LanceBucket.parseSpec(c).isDefined))
          m.sortCols
        else m.sortCols.drop(m.partitionCols.length)
      (m.partitionCols, sort)
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    val opts = new CaseInsensitiveStringMap(Map("path" -> path).asJava)
    val provider = new LanceDataSource
    val schema = provider.inferSchema(opts)
    val (layout, sort) = layoutOf(path)
    new LanceTable(path, schema, None, layout, sort)
  }

  /** SQL time travel — `SELECT ... FROM lance.`/p` VERSION AS OF 3`:
    * pins the scan to that manifest version (the crate's
    * `checkout_version`; same mechanism as `option("versionAsOf", n)`). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"lance: VERSION AS OF expects a numeric manifest version, got '$version'")
    }
    val opts = new CaseInsensitiveStringMap(
      Map("path" -> path, "versionAsOf" -> v.toString).asJava)
    val schema = new LanceDataSource().inferSchema(opts)
    new LanceTable(path, schema, Some(v))
  }

  /** `TIMESTAMP AS OF t` (micros since epoch): resolves to the NEWEST
    * version whose manifest commit time is <= t. Commit time = the
    * manifest file's modification time — this writer commits each version
    * as one atomic manifest create, so mtime IS the commit instant. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    val (fs, p) = hadoop(path)
    val versionsDir = new org.apache.hadoop.fs.Path(p, "_versions")
    val cutoffMs = timestamp / 1000L
    val candidates = fs.listStatus(versionsDir)
      .filter(_.getPath.getName.endsWith(".manifest"))
      .filter(_.getModificationTime <= cutoffMs)
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripSuffix(".manifest").toLong).toOption)
    require(candidates.nonEmpty,
      s"lance: no version of $path committed at or before timestamp " +
      s"$timestamp (µs since epoch)")
    loadTable(ident, candidates.max.toString)
  }

  /** CREATE TABLE ... PARTITIONED BY (col | days(ts) | months(ts) |
    * years(ts) | bucket(n, col)): transforms become the table's declared
    * write layout — the first write (CTAS body, df.writeTo.create, or a
    * later INSERT) lands in it. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val specs = partitions.toSeq.map { t =>
      def oneRef: String = {
        require(t.references().length == 1,
          s"lance: transform ${t.name()} takes exactly one column")
        t.references().head.fieldNames().mkString(".")
      }
      t.name() match {
        case "identity" => oneRef
        case "bucket" =>
          val n = t.arguments().collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value().asInstanceOf[Number].intValue()
          }.getOrElse(throw new IllegalArgumentException(
            "lance: bucket transform needs a numeric bucket count"))
          LanceBucket.specOf(n, oneRef)
        case u if LanceDays.Units.contains(u) => s"$u($oneRef)"
        case other => throw new UnsupportedOperationException(
          s"lance CREATE TABLE: unsupported partition transform '$other' " +
            "(supported: identity columns, days/months/years, bucket)")
      }
    }
    val bucketSpecs = specs.filter(s => LanceBucket.parseSpec(s).isDefined)
    require(bucketSpecs.isEmpty || specs.length == 1,
      "lance: bucket layout cannot combine with other partition transforms")
    new LanceTable(pathOf(ident), schema, None, specs)
  }

  /** Schema evolution via SQL: `ALTER TABLE lance.`/p/ds.lance` ADD COLUMN
    * x BIGINT` / `RENAME COLUMN a TO b` / `DROP COLUMN a` — mapped onto
    * the manifest-only maintenance ops (no data rewritten). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    val spark = org.apache.spark.sql.SparkSession.active
    // multi-part field names map onto dotted paths (one-level-or-deeper
    // struct sub-fields; the maintenance ops validate each path step)
    changes.foreach {
      case add: TableChange.AddColumn =>
        LanceMaintenance.addColumn(spark, path,
          add.fieldNames().mkString("."), add.dataType())
      case ren: TableChange.RenameColumn =>
        LanceMaintenance.renameColumn(spark, path,
          ren.fieldNames().mkString("."), ren.newName())
      case del: TableChange.DeleteColumn =>
        LanceMaintenance.dropColumn(spark, path, del.fieldNames().mkString("."))
      case other => throw new UnsupportedOperationException(
        s"lance ALTER TABLE: ${other.getClass.getSimpleName}")
    }
    loadTable(ident)
  }

  /** Warehouse-named tables drop their dataset directory (lancedb
    * `drop_table`); path identifiers refuse — deleting an arbitrary
    * filesystem path through DROP TABLE is a footgun, use the fs. */
  override def dropTable(ident: Identifier): Boolean =
    if (!named(ident)) false
    else {
      val (fs, p) = hadoop(pathOf(ident))
      fs.exists(p) && fs.delete(p, true)
    }

  /** Warehouse-named tables rename atomically (lancedb `rename_table`);
    * refuses to overwrite an existing target. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!named(oldIdent) || !named(newIdent))
      throw new UnsupportedOperationException(
        "lance catalog: RENAME TABLE needs warehouse-named tables " +
        "(set spark.sql.catalog.<name>.warehouse)")
    val (fs, from) = hadoop(pathOf(oldIdent))
    val (_, to) = hadoop(pathOf(newIdent))
    require(fs.exists(from), s"lance: no such table ${oldIdent.name()}")
    require(!fs.exists(to), s"lance: table ${newIdent.name()} already exists")
    require(fs.rename(from, to), s"lance: rename ${oldIdent.name()} failed")
  }

  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true } catch { case _: Exception => false }

  // --- SupportsNamespaces (flat: the warehouse is one default namespace) --
  override def listNamespaces(): Array[Array[String]] = Array.empty
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespace.isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        name() +: namespace)
    util.Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("lance catalog: CREATE NAMESPACE")
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("lance catalog: ALTER NAMESPACE")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("lance catalog: DROP NAMESPACE")
}
