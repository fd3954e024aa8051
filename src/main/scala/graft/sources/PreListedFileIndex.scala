package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.binaryfile.BinaryFileFormat
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over file statuses that discovery already fetched.
  *
  * `spark.read.format("binaryFile").load(globs)` pays the driver-side
  * listing TWICE — once globbing in `DataSource.checkAndGlobPathIfNecessary`
  * and again building `InMemoryFileIndex` over the matched paths. On a
  * 10⁷-object store corpus each pass is millions of sequential round
  * trips, so discovery (SURVEY A1) feeds its single glob pass straight
  * into the scan instead. Everything downstream (path/data filter
  * pushdown via FileSourceStrategy, file splitting, locality) behaves
  * exactly as with the built-in index — this only changes WHERE the
  * statuses come from.
  */
final class PreListedFileIndex(statuses: Array[FileStatus], roots: Seq[Path])
    extends FileIndex {
  override def rootPaths: Seq[Path] = roots
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  override def inputFiles: Array[String] = statuses.map(_.getPath.toString)
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_.getLen).sum
  override def partitionSchema: StructType = StructType(Nil)
}

object PreListedFileIndex {

  /** A binaryFile-format scan (schema `path, modificationTime, length,
    * content`) over pre-listed statuses — the single-listing replacement
    * for `spark.read.format("binaryFile").load(...)`. */
  def binaryFileScan(spark: SparkSession, statuses: Array[FileStatus],
      roots: Seq[Path]): DataFrame = {
    val fmt = new BinaryFileFormat
    val rel = HadoopFsRelation(
      location = new PreListedFileIndex(statuses, roots),
      partitionSchema = StructType(Nil),
      dataSchema = BinaryFileFormat.schema,
      bucketSpec = None,
      fileFormat = fmt,
      options = Map.empty)(spark)
    spark.baseRelationToDataFrame(rel)
  }
}
