package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.DabDataset
import graft.operators.Xval

/** Config-driven dataset construction — the engine's "DDL path"
  * (reference `load_yaml_config` → `dataset_from_config` →
  * `dataset_factory`, dabstract/utils.py:13-146, dataset/helpers.py:14-93).
  *
  * Two frontends over one pipeline: YAML (the reference's primary entry
  * point, parsed by [[Yaml]] incl. the `!join !usjoin !pathjoin !kwarg
  * !class` constructors) and JSON (json4s ships with Spark). Sources
  * resolve from a name→loader registry; the reference resolves dataset
  * *classes* by module import (helpers.py:148-160) — on the JVM the
  * registry map plays that role.
  *
  * Per-dataset entries accept both shapes:
  *  - engine JSON: `{"table": "documents", "select": "lang = 'en'"}`
  *  - reference YAML (EXAMPLE_anomaly_subsample.yaml):
  *    `- name: documents` + `parameters: {paths: {...}, select:
  *    {name: subsample_by_str, parameters: {key, keep}}, test_only: 1}`
  * Datasets fold with `concat(intersect=True)` like dataset_from_config
  * (helpers.py:78-83); optional top-level select / split / xval map to
  * the DabDataset / Xval operators.
  */
object ConfigSource {

  type Loader = (SparkSession, String) => DataFrame

  /** Default registry: the driver test tables (callers extend by passing
    * their own map).
    */
  def defaultRegistry: Map[String, Loader] =
    graft.Tables.names.map(n => n -> ((s: SparkSession, d: String) =>
      graft.Tables.load(s, d, n))).toMap

  def fromJson(spark: SparkSession, dataDir: String, json: String,
      registry: Map[String, Loader] = defaultRegistry): DabDataset =
    fromConfig(spark, dataDir, JsonMethods.parse(json), registry)

  /** YAML frontend (reference `load_yaml_config`, utils.py:13-146):
    * `kwargs` feeds the `!kwarg` constructor, like the reference's
    * `load_yaml_config(..., **kwargs)` injection.
    */
  def fromYaml(spark: SparkSession, dataDir: String, yaml: String,
      registry: Map[String, Loader] = defaultRegistry,
      kwargs: Map[String, Any] = Map.empty): DabDataset =
    fromConfig(spark, dataDir, Yaml.parse(yaml, kwargs), registry)

  def fromConfig(spark: SparkSession, dataDir: String, root: JValue,
      registry: Map[String, Loader] = defaultRegistry): DabDataset = {
    implicit val fmt: Formats = DefaultFormats

    val dsConfigs = (root \ "datasets") match {
      case JArray(xs) => xs
      case _ => throw new IllegalArgumentException("config needs a datasets array")
    }
    require(dsConfigs.nonEmpty, "config needs at least one dataset")

    val parts = dsConfigs.map { c =>
      val params = c \ "parameters"
      val table = (c \ "table").extractOpt[String]
        .orElse((c \ "name").extractOpt[String])
        .getOrElse(throw new IllegalArgumentException(
          "dataset entry needs 'table' (engine shape) or 'name' (reference shape)"))
      val name = (c \ "name").extractOpt[String].getOrElse(table)
      val loader = registry.getOrElse(table,
        throw new IllegalArgumentException(s"unknown dataset '$table' in registry"))
      // reference shape carries paths.data; absent → the driver data dir
      val dir = (params \ "paths" \ "data").extractOpt[String].getOrElse(dataDir)
      val preSelect = Seq(c \ "select", params \ "select")
        .find(_ != JNothing).getOrElse(JNothing)
      val base = applySelectDf(loader(spark, dir), preSelect)
      val testOnly = (params \ "test_only").extractOpt[Double]
        .orElse((c \ "test_only").extractOpt[Double]).getOrElse(0.0)
      DabDataset.dataset(base, name, testOnly)
    }
    // fold with key intersection, like dataset_from_config (helpers.py:78-83)
    var ds = parts.reduce((a, b) => a.concat(b, intersect = true))

    // split first, then select(s) — the reference's application order
    // (helpers.py:85-91: add_split before add_select)
    (root \ "split") match {
      case JObject(_) =>
        val keys = (root \ "split" \ "keys").extract[List[String]]
        val power2 = (root \ "split" \ "power2").extractOpt[Boolean].getOrElse(false)
        ds = (root \ "split" \ "seconds").extractOpt[Double] match {
          case Some(sec) => // reference add_split type='seconds' mode
            val infoKey = (root \ "split" \ "info_key").extractOpt[String].getOrElse("info")
            ds.splitSeconds(keys, sec, infoKey, power2)
          case None => ds.split(keys, (root \ "split" \ "win").extract[Int], power2)
        }
      case _ => ()
    }
    (root \ "select") match {
      case JNothing => ()
      case JArray(xs) => // reference allows a list of selects (helpers.py:87-90)
        xs.foreach(sel => ds = applySelectDs(ds, sel))
      case sel => ds = applySelectDs(ds, sel)
    }
    (root \ "xval") match {
      case JObject(_) =>
        val strategy = (root \ "xval" \ "strategy").extract[String]
        val folds = (root \ "xval" \ "folds").extract[Int]
        val key = (root \ "xval" \ "key").extractOpt[String]
        val seed = (root \ "xval" \ "seed").extractOpt[Long].getOrElse(0L)
        val folded = strategy match {
          case "hash"         => Xval.hashKfold(ds.df, folds, key.get, seed)
          case "md5"          => Xval.md5Kfold(ds.df, folds, key.get)
          case "sequential"   => Xval.sequentialKfold(ds.df, folds, key.get)
          case "stratified"   => Xval.stratifiedKfold(ds.df, folds, key.get, seed)
          case "random"       => Xval.randomKfold(ds.df, folds, seed)
          case "group_random" => Xval.groupRandomKfold(ds.df, folds, key.get, seed)
          case "item"         => Xval.fromItem(ds.df, key.get)
          case s => throw new IllegalArgumentException(s"unknown xval strategy '$s'")
        }
        ds = DabDataset.fromExisting(Xval.foldMasks(folded, folds,
          Some("test_only").filter(folded.columns.contains)))
      case _ => ()
    }
    ds
  }

  /** Per-dataset select, applied before `_idx` assignment: either a SQL
    * predicate string (engine shape) or a reference named select
    * `{name, parameters}` (helpers.py select dispatch; select.py:7-40).
    */
  private def applySelectDf(df: DataFrame, sel: JValue): DataFrame = {
    implicit val fmt: Formats = DefaultFormats
    sel match {
      case JNothing | JNull => df
      case JString(pred) => df.filter(expr(pred))
      case o: JObject =>
        val (name, params) = namedSelect(o)
        name match {
          case "subsample_by_str" =>
            df.filter(col((params \ "key").extract[String])
              .isin(keepValues(params \ "keep"): _*))
          case "random_subsample" =>
            val seed = (params \ "seed").extractOpt[Long].getOrElse(0L)
            df.sample(withReplacement = false, (params \ "ratio").extract[Double], seed)
          case n => throw new IllegalArgumentException(s"unknown select '$n'")
        }
      case other => throw new IllegalArgumentException(s"bad select config: $other")
    }
  }

  /** Dataset-wide select (after concat): same shapes, routed through the
    * order-preserving DabDataset ops so `_idx` is renumbered.
    */
  private def applySelectDs(ds: DabDataset, sel: JValue): DabDataset = {
    implicit val fmt: Formats = DefaultFormats
    sel match {
      case JNothing | JNull => ds
      case JString(pred) => ds.select(expr(pred))
      case o: JObject =>
        val (name, params) = namedSelect(o)
        name match {
          case "subsample_by_str" =>
            ds.subsampleByStr((params \ "key").extract[String],
              keepValues(params \ "keep").map(_.toString))
          case "random_subsample" =>
            val seed = (params \ "seed").extractOpt[Long].getOrElse(0L)
            ds.randomSubsample((params \ "ratio").extract[Double], seed)
          case n => throw new IllegalArgumentException(s"unknown select '$n'")
        }
      case other => throw new IllegalArgumentException(s"bad select config: $other")
    }
  }

  private def namedSelect(o: JObject): (String, JValue) = {
    implicit val fmt: Formats = DefaultFormats
    ((o \ "name").extract[String], o \ "parameters")
  }

  /** `keep` may be a scalar or a list (reference keep=0 vs keep=[0,1]). */
  private def keepValues(v: JValue): Seq[Any] = {
    def one(x: JValue): Any = x match {
      case JString(s) => s
      case JInt(n) => n.toLong
      case JLong(n) => n
      case JDouble(d) => d
      case JBool(b) => b
      case other => other.toString
    }
    v match {
      case JArray(xs) => xs.map(one)
      case JNothing | JNull => Seq.empty
      case x => Seq(one(x))
    }
  }

  /** Processor chain from the reference's dp-config shape
    * (`chain: [- name: Framing, parameters: {...}]` — e.g.
    * examples/DCASE2020Task1/configs/dp/DCASE2020Task1.yaml), via the
    * [[graft.functions.Chain.registry]]. Parameter scalars/lists are
    * stringified to the registry's string-param convention
    * (lists join with ',': `methods: [mean,std]` → "mean,std").
    */
  def chainFromYaml(yaml: String,
      kwargs: Map[String, Any] = Map.empty): graft.functions.Chain =
    chainFromConfig(Yaml.parse(yaml, kwargs))

  def chainFromConfig(root: JValue): graft.functions.Chain = {
    implicit val fmt: Formats = DefaultFormats
    val steps = (root \ "chain") match {
      case JArray(xs) => xs.map { step =>
        val name = (step \ "name").extract[String]
        val params: Map[String, String] = (step \ "parameters") match {
          case JObject(fs) => fs.map { case (k, v) => k -> paramStr(v) }.toMap
          case _ => Map.empty
        }
        graft.functions.Chain.makeProcessor(name, params)
      }
      case _ => throw new IllegalArgumentException("chain config needs a 'chain' array")
    }
    graft.functions.Chain(steps)
  }

  private def paramStr(v: JValue): String = v match {
    case JString(s) => s
    case JInt(n) => n.toString
    case JLong(n) => n.toString
    case JDouble(d) => if (d == d.floor && d.abs < 1e15) d.toLong.toString else d.toString
    case JBool(b) => b.toString
    case JArray(xs) => xs.map(paramStr).mkString(",")
    case other => other.toString
  }
}
