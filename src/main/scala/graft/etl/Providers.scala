package graft.etl

import org.apache.spark.sql.DataFrame

/** Pluggable export-format provider registry (SURVEY §2.2 K3 —
  * `IExportProvider`/`ExportProviderBase`, IExportProvider.cs:5; concrete
  * providers like GmcXmlExportProvider register by system name). Formats
  * map to `DataFrameWriter` sinks; third parties register new ones. */
object Providers {

  type Provider = (DataFrame, String, Option[Int]) => Unit

  @volatile private var registry: Map[String, Provider] = Map(
    "csv" -> ((df, path, rpf) => ExportPipeline.writeCsv(df, path, recordsPerFile = rpf)),
    "json" -> ((df, path, rpf) => ExportPipeline.writeJson(df, path, rpf)),
    "xml" -> ((df, path, rpf) => ExportPipeline.writeXml(df, path, recordsPerFile = rpf)),
    "parquet" -> ((df, path, rpf) => ExportPipeline.writeParquet(df, path, recordsPerFile = rpf)),
    "orc" -> ((df, path, rpf) => ExportPipeline.writeOrc(df, path, rpf)))

  def register(systemName: String, p: Provider): Unit =
    synchronized { registry += systemName.toLowerCase -> p }

  def apply(systemName: String): Provider =
    registry.getOrElse(systemName.toLowerCase,
      throw new IllegalArgumentException(
        s"no export provider '$systemName' (have: ${registry.keys.toSeq.sorted.mkString(", ")})"))

  def names: Seq[String] = registry.keys.toSeq.sorted

  /** Full export: extract per profile → provider sink → optional deploy. */
  def export(df: DataFrame, profile: ExportPipeline.Profile, format: String,
      path: String, publisher: Option[Deploy.Publisher] = None): Unit = {
    apply(format)(ExportPipeline.extract(df, profile), path, profile.recordsPerFile)
    publisher.foreach(_.publish(Deploy.outputFiles(path)))
  }
}
