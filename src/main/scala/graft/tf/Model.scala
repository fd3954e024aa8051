package graft.tf

/** Superset row emitted by the single-pass parser — one Dataset[TfRow] feeds
  * all seven published tables (each table is a filter + projection, so one
  * distributed parse serves every view; the reference re-parses each file
  * once per table).
  *
  * Column semantics per /root/reference/terraform/table_terraform_*.go; the
  * default Steampipe transform `FromCamel().NullIfZero()` (plugin.go:22) is
  * applied at construction: Go zero values (empty string, 0, false) are
  * already None/null here.
  */
final case class TfRow(
    table: String, // resource | data_source | local | module | output | provider | variable
    path: String,
    name: Option[String],
    tfType: Option[String],     // `type` column (resource/data_source/variable)
    mode: Option[String],
    address: Option[String],
    arguments: Option[String],      // canonical JSON
    attributes: Option[String],     // state files only
    attributesStd: Option[String],
    count: Option[Long],
    countSrc: Option[String],
    forEach: Option[String],
    dependsOn: Option[String],
    lifecycle: Option[String],
    provider: Option[String],
    moduleSource: Option[String],
    version: Option[String],
    alias: Option[String],
    value: Option[String],
    defaultValue: Option[String],
    description: Option[String],
    sensitive: Option[Boolean],
    validation: Option[String],
    startLine: Option[Long],
    endLine: Option[Long],
    source: Option[String])

object TfRow {
  val empty: TfRow = TfRow(
    table = "", path = "", name = None, tfType = None, mode = None,
    address = None, arguments = None, attributes = None, attributesStd = None,
    count = None, countSrc = None, forEach = None, dependsOn = None,
    lifecycle = None, provider = None, moduleSource = None, version = None,
    alias = None, value = None, defaultValue = None, description = None,
    sensitive = None, validation = None, startLine = None, endLine = None,
    source = None)
}

/** File kinds, mirroring the reference's `filePath` struct
  * (/root/reference/terraform/utils.go:29-33). */
object FileKind {
  val Config = "config"
  val Plan = "plan"
  val State = "state"
}
