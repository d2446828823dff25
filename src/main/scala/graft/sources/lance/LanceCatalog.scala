package graft.sources.lance

import java.util

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Path catalog: `SELECT * FROM lance.`/path/ds.lance`` — the Spark-native
  * face of the reference's replacement scan (R5). Register with
  * `spark.sql.catalog.lance=graft.sources.lance.LanceCatalog`; the
  * identifier's last part is the dataset path (namespace parts, if any,
  * are joined back with '/').
  */
class LanceCatalog extends TableCatalog {
  private var catalogName = "lance"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = Array.empty

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    val opts = new CaseInsensitiveStringMap(Map("path" -> path).asJava)
    val provider = new LanceDataSource
    val schema = provider.inferSchema(opts)
    new LanceTable(path, schema, None)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    new LanceTable(pathOf(ident), schema, None)

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

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("lance catalog: RENAME TABLE")

  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true } catch { case _: Exception => false }
}
