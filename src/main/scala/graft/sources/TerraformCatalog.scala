package graft.sources

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DSv2 `TableCatalog`: the "installed plugin" ergonomic analog of the
  * reference's plugin registration
  * (`/root/reference/terraform/plugin.go:19-38`) — configure the catalog
  * once in the session conf and every published table resolves by name,
  * with no per-session `Terraform.register` / `.load()` call:
  *
  * {{{
  *   spark.sql.catalog.terraform = graft.sources.TerraformCatalog
  *   spark.sql.catalog.terraform.configurationFilePaths = &lt;glob or git:: or s3:: source&gt;
  *
  *   SELECT name, type FROM terraform.terraform_resource
  * }}}
  *
  * Catalog options are the reader's connection-config grammar
  * (`configurationFilePaths` / `planFilePaths` / `stateFilePaths` /
  * legacy `paths`), inherited by every table; planning-time path pruning,
  * column pruning and small-file packing come from the shared
  * [[TerraformDsv2Table]]. Read-only: DDL fails fast.
  */
final class TerraformCatalog extends TableCatalog {

  private var catalogName: String = "terraform"
  private var config: Map[String, String] = Map.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    config = options.asScala.toMap
  }

  override def name(): String = catalogName

  private def requireNamespace(namespace: Array[String]): Unit =
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace.toSeq)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireNamespace(namespace)
    TerraformTableProvider.tables.keys.toSeq.sorted
      .map(Identifier.of(Array.empty[String], _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && TerraformTableProvider.tables.contains(ident.name)

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new TerraformDsv2Table(new CaseInsensitiveStringMap(
      (config + ("table" -> ident.name)).asJava))
  }

  override def createTable(ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")
}
