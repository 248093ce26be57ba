package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** The reference's config-driven table registry (`carregar_source`,
  * datatrack_spark_utils.py:723-754): one JSON file per source system
  * describing `informacoes.{banco, sistema, schemas.<schema>.<tabela>}`,
  * flattened into a map keyed `"<sistema>_<schema>.<tabela>"` (lowercase)
  * with the origin metadata folded into each table's config. Driver-side
  * and tiny, like the YAML configs; parsed with the Jackson that ships on
  * Spark's classpath. */
object TableConfig {

  /** Per-table ingestion config: write contract + incremental column —
    * the fields the trusted-load lifecycle consumes. */
  final case class Entry(
      chave: String, banco: String, sistema: String, schema: String,
      nome: String, primaryKey: Seq[String], colunaParticao: Option[String],
      tipoParticionamento: Option[String], colunaIncremental: Option[String])

  private val mapper = new ObjectMapper()

  /** `carregar_source`: a single .json file or a directory of them →
    * flattened registry. Invalid paths fail loudly (the reference raises
    * ValueError). */
  def load(pathStr: String): Map[String, Entry] = {
    val path = Paths.get(pathStr)
    val files: Seq[Path] =
      if (Files.isRegularFile(path) && pathStr.endsWith(".json")) Seq(path)
      else if (Files.isDirectory(path)) {
        val s = Files.list(path)
        try s.iterator().asScala.filter(_.toString.endsWith(".json")).toSeq
        finally s.close()
      } else throw new IllegalArgumentException(
        s"TableConfig.load: '$pathStr' is neither a .json file nor a directory")

    files.flatMap { f =>
      val root = mapper.readTree(Files.readString(f))
      val info = root.path("informacoes")
      val banco = info.path("banco").asText(null)
      val sistema = info.path("sistema").asText(null)
      val schemas = info.path("schemas")
      schemas.properties().asScala.flatMap { schemaEntry =>
        val schemaName = schemaEntry.getKey
        schemaEntry.getValue.properties().asScala.map { tableEntry =>
          val tabela = tableEntry.getKey
          val cfg = tableEntry.getValue
          val chave = s"${sistema.toLowerCase}_${schemaName.toLowerCase}.${tabela.toLowerCase}"
          chave -> Entry(
            chave = chave, banco = banco, sistema = sistema,
            schema = schemaName, nome = tabela,
            primaryKey = strings(cfg.path("primary_key")),
            colunaParticao = opt(cfg.path("coluna_particao")),
            tipoParticionamento = opt(cfg.path("tipo_particionamento")),
            colunaIncremental = opt(cfg.path("coluna_incremental")))
        }
      }
    }.toMap
  }

  private def strings(n: JsonNode): Seq[String] =
    if (n.isArray) n.elements().asScala.map(_.asText()).toSeq else Seq.empty

  private def opt(n: JsonNode): Option[String] =
    if (n.isMissingNode || n.isNull) None else Some(n.asText())
}
