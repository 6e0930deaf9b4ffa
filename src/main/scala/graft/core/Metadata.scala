package graft.core

import scala.xml.{Elem, Node, XML}

/** GEMINI 2.3 dataset metadata — the reference's `Metadata` dataclass
  * (`metadata.py:270-315`): the 12 live fields parsed from ISO
  * 19139/GEMINI XML via element-path traversal (XPath constants
  * `constants.py:111-212`).
  */
case class Metadata(
    title: Option[String],
    dataset_language: Seq[String],
    abstract_ : Option[String],
    topic_category: Seq[String],
    keyword: Seq[String],
    lineage: Option[String],
    metadata_date: Option[String],
    metadata_language: Option[String],
    resource_type: Seq[String],
    file_identifier: Option[String],
    quality_scope: Seq[String],
    spatial_representation_type: Seq[String])

object Metadata {

  def fromXmlFile(path: String): Metadata = fromXml(XML.loadFile(path))

  def fromXmlString(s: String): Metadata = fromXml(XML.loadString(s))

  /** Forgiving local-name path traversal (namespace-agnostic, matching
    * the reference's remove-namespaces + XPath approach,
    * `metadata.py:237-267`).
    */
  private def path(root: Node, names: Seq[String]): Seq[Node] =
    names.foldLeft(Seq[Node](root)) { (nodes, name) =>
      nodes.flatMap(_.child).filter(_.label == name)
    }

  private def text(root: Node, names: Seq[String]): Seq[String] =
    path(root, names).map(_.text.trim).filter(_.nonEmpty)

  private def attr(root: Node, names: Seq[String], a: String): Seq[String] =
    path(root, names).flatMap(_.attribute(a)).map(_.text.trim).filter(_.nonEmpty)

  def fromXml(root: Elem): Metadata = {
    val ident = Seq("identificationInfo", "MD_DataIdentification")
    Metadata(
      title = text(root,
        ident ++ Seq("citation", "CI_Citation", "title", "CharacterString")).headOption,
      dataset_language = text(root, ident ++ Seq("language", "LanguageCode")) ++
        attr(root, ident ++ Seq("language", "LanguageCode"), "codeListValue"),
      abstract_ = text(root, ident ++ Seq("abstract", "CharacterString")).headOption,
      topic_category = text(root, ident ++ Seq("topicCategory", "MD_TopicCategoryCode")),
      keyword = text(root,
        ident ++ Seq("descriptiveKeywords", "MD_Keywords", "keyword", "CharacterString")),
      lineage = text(root, Seq("dataQualityInfo", "DQ_DataQuality", "lineage",
        "LI_Lineage", "statement", "CharacterString")).headOption,
      metadata_date = (text(root, Seq("dateStamp", "Date")) ++
        text(root, Seq("dateStamp", "DateTime"))).headOption,
      metadata_language = (text(root, Seq("language", "LanguageCode")) ++
        attr(root, Seq("language", "LanguageCode"), "codeListValue")).headOption,
      resource_type = attr(root, Seq("hierarchyLevel", "MD_ScopeCode"), "codeListValue"),
      file_identifier = text(root, Seq("fileIdentifier", "CharacterString")).headOption,
      quality_scope = attr(root, Seq("dataQualityInfo", "DQ_DataQuality", "scope",
        "DQ_Scope", "level", "MD_ScopeCode"), "codeListValue"),
      spatial_representation_type = attr(root,
        ident ++ Seq("spatialRepresentationType", "MD_SpatialRepresentationTypeCode"),
        "codeListValue"))
  }

  /** Sidecar JSON fallback (reference `_dataframe.py:174-183`): a plain
    * {"title": ..., "abstract": ...} next to the data file.
    */
  def fromJsonFile(path: String): Metadata = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val m = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8))
    def s(k: String): Option[String] = (m \ k).extractOpt[String]
    def seq(k: String): Seq[String] =
      (m \ k).extractOpt[Seq[String]].getOrElse(s(k).toSeq)
    Metadata(s("title"), seq("dataset_language"), s("abstract"),
      seq("topic_category"), seq("keyword"), s("lineage"), s("metadata_date"),
      s("metadata_language"), seq("resource_type"), s("file_identifier"),
      seq("quality_scope"), seq("spatial_representation_type"))
  }
}
