package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.DabDataset
import graft.operators.Xval

/** Config-driven dataset construction — the engine's "DDL path"
  * (reference `load_yaml_config` → `dataset_from_config` →
  * `dataset_factory`, dabstract/utils.py:13-146, dataset/helpers.py:14-93).
  *
  * The reference resolves dataset classes by name and folds them with
  * `concat(intersect=True)`, then applies optional split/select/xval.
  * Here the config is JSON (json4s ships with Spark; no YAML lib in the
  * offline build), sources resolve from a name→loader registry, and the
  * pipeline steps map to the DabDataset/Xval operators:
  *
  * {{{
  * {"datasets": [
  *    {"table": "documents", "name": "en_docs", "select": "lang = 'en'"},
  *    {"table": "documents", "name": "de_docs", "select": "lang = 'de'"}],
  *  "select": "n_chars > 50",
  *  "split": {"keys": ["embedding"], "win": 16},
  *  "xval": {"strategy": "hash", "folds": 4, "key": "doc_id"}}
  * }}}
  */
object ConfigSource {

  type Loader = (SparkSession, String) => DataFrame

  /** Default registry: the driver test tables (reference resolves from
    * `dabstract.dataset.dbs` + a custom dir, helpers.py:148-160; callers
    * extend by passing their own map).
    */
  def defaultRegistry: Map[String, Loader] =
    graft.Tables.names.map(n => n -> ((s: SparkSession, d: String) =>
      graft.Tables.load(s, d, n))).toMap

  def fromJson(spark: SparkSession, dataDir: String, json: String,
      registry: Map[String, Loader] = defaultRegistry): DabDataset = {
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(json)

    val dsConfigs = (root \ "datasets") match {
      case JArray(xs) => xs
      case _ => throw new IllegalArgumentException("config needs a datasets array")
    }
    require(dsConfigs.nonEmpty, "config needs at least one dataset")

    val parts = dsConfigs.map { c =>
      val table = (c \ "table").extract[String]
      val name = (c \ "name").extractOpt[String].getOrElse(table)
      val loader = registry.getOrElse(table,
        throw new IllegalArgumentException(s"unknown dataset '$table' in registry"))
      val base = (c \ "select").extractOpt[String] match {
        case Some(pred) => loader(spark, dataDir).filter(expr(pred))
        case None => loader(spark, dataDir)
      }
      DabDataset.dataset(base, name)
    }
    // fold with key intersection, like dataset_from_config (helpers.py:78-83)
    var ds = parts.reduce((a, b) => a.concat(b, intersect = true))

    (root \ "select").extractOpt[String].foreach { pred =>
      ds = ds.select(expr(pred))
    }
    (root \ "split") match {
      case JObject(_) =>
        val keys = (root \ "split" \ "keys").extract[List[String]]
        val win = (root \ "split" \ "win").extract[Int]
        val power2 = (root \ "split" \ "power2").extractOpt[Boolean].getOrElse(false)
        ds = ds.split(keys, win, power2)
      case _ => ()
    }
    (root \ "xval") match {
      case JObject(_) =>
        val strategy = (root \ "xval" \ "strategy").extract[String]
        val folds = (root \ "xval" \ "folds").extract[Int]
        val key = (root \ "xval" \ "key").extractOpt[String]
        val seed = (root \ "xval" \ "seed").extractOpt[Long].getOrElse(0L)
        val folded = strategy match {
          case "hash"       => Xval.hashKfold(ds.df, folds, key.get, seed)
          case "md5"        => Xval.md5Kfold(ds.df, folds, key.get)
          case "sequential" => Xval.sequentialKfold(ds.df, folds, key.get)
          case "stratified" => Xval.stratifiedKfold(ds.df, folds, key.get, seed)
          case "random"     => Xval.randomKfold(ds.df, folds, seed)
          case "item"       => Xval.fromItem(ds.df, key.get)
          case s => throw new IllegalArgumentException(s"unknown xval strategy '$s'")
        }
        ds = DabDataset.fromExisting(Xval.foldMasks(folded, folds,
          Some("test_only").filter(folded.columns.contains)))
      case _ => ()
    }
    ds
  }
}
