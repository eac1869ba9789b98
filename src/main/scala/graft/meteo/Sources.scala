package graft.meteo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** The source registry — the reference's Template-pattern source layer
  * (etl/sources.py:28-100: `BaseSource` subclasses declaring URL,
  * payload model and static request params, a `SOURCE_REGISTRY`, and
  * `get_source_by_url` used by the streaming consumer to pick the right
  * transform for an event).
  *
  * In the Spark engine a "source" is the declarative bundle (payload
  * schema + normalizer plan + request-param template); registration is a
  * Map. New sources add an entry — no new execution code, the same
  * extension contract the reference's decorator gives.
  */
object Sources {

  /** One external data source (etl/sources.py:30-41). */
  final case class SourceDef(
      name: String,
      url: String,
      staticParams: Map[String, String],
      requiredParams: Seq[String],
      payloadSchema: StructType,
      /** bronze payload rows (payloadCol string + passthrough) →
        * normalized observation rows */
      normalize: DataFrame => DataFrame) {

    /** Full request params: static ++ caller (caller wins) — the
      * reference's `params` property merge order. */
    def params(required: Map[String, String],
        extra: Map[String, String] = Map.empty): Map[String, String] = {
      val missing = requiredParams.filterNot(required.contains)
      require(missing.isEmpty, s"missing required params: $missing")
      staticParams ++ required ++ extra
    }
  }

  /** etl/config.py:12 (`APP_NAME`) — overridable the same way. */
  def appName: String =
    sys.env.getOrElse("APP_NAME", "Weather API ETL dev")

  /** The HTTP `User-Agent` a fetch for this source sends —
    * etl/sources.py:52-57 (`f"{APP_NAME}_{self.NAME}"`), fed to
    * [[RetryLadder.execute]]. */
  def userAgent(src: SourceDef): String = s"${appName}_${src.name}"

  /** etl/sources.py:80-91 (`MeteoSource`). */
  val meteo: SourceDef = SourceDef(
    name = "etl_meteo",
    url = "https://api.open-meteo.com/v1/forecast",
    staticParams = Map("hourly" -> PayloadNormalizer.metricMap.map(_._1)
      .mkString(",")),
    requiredParams = Seq("latitude", "longitude"),
    payloadSchema = MeteoSchemas.payloadSchema,
    normalize = df => PayloadNormalizer.normalize(df))

  // etl/sources.py:70-78: `SOURCE_REGISTRY` + `register_source` — open
  // for extension at runtime, so a second source is a REGISTRATION
  // (the reference's subclass-with-decorator), never an edit here.
  private val reg =
    scala.collection.concurrent.TrieMap[String, SourceDef](meteo.name -> meteo)

  /** `register_source` (etl/sources.py:72-77): make `src` routable by
    * name and by url for every consumer (CLI fetch, streaming
    * normalize). Last registration wins, like redefining a class. */
  def register(src: SourceDef): SourceDef = { reg.put(src.name, src); src }

  /** Remove a registration (tests; the reference has no unregister —
    * its registry dies with the process). */
  def unregister(name: String): Unit = { reg.remove(name); () }

  def registry: Map[String, SourceDef] = reg.readOnlySnapshot().toMap

  /** `SOURCE_REGISTRY[name]` (etl/sources.py:94). */
  def byName(name: String): Option[SourceDef] = reg.get(name)

  /** streaming/load.py:49-52: resolve the transform for a fetch event's
    * source url; None → the consumer's StreamLoadError path. */
  def bySourceUrl(url: String): Option[SourceDef] =
    registry.values.find(_.url == url)
}
