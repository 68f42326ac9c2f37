package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** The service-facing half of extraction (SURVEY §2.1 S1/S3, §2.10
  * C3): session auth, env-injected credentials, and the
  * source-selector that chooses between a windowed scan and a
  * query-driven key list. All network-touching behavior hides behind
  * traits — this environment is zero-egress, so implementations here
  * are local; the contracts mirror qa_api_handler.py.
  */
object Extraction {

  /** C3: credentials come from the environment, never literals
    * (qa_api_handler.py:66: os.environ['CALABRIO_KEY'] holds a JSON
    * blob with user/password/base URL). Parsing is injected-map based
    * so tests never touch the real environment.
    */
  final case class Credentials(baseUrl: String, user: String, secret: String)

  def credentialsFrom(env: Map[String, String], key: String = "CALABRIO_KEY"): Credentials = {
    val raw = env.getOrElse(key,
      throw new IllegalStateException(s"missing credential env var $key"))
    // minimal JSON object parse (flat string fields) — avoids pulling a
    // JSON library onto the driver for three fields
    def field(n: String): String = {
      val m = java.util.regex.Pattern
        .compile("\"" + n + "\"\\s*:\\s*\"([^\"]*)\"").matcher(raw)
      if (m.find()) m.group(1)
      else throw new IllegalArgumentException(s"credential field $n missing")
    }
    Credentials(field("base_url"), field("user"), field("secret"))
  }

  /** P13: URL query-string construction from a param map
    * (qa_api_handler.py:101-108: beginDate/endDate/limit/evalState →
    * `?k=v&k=v`). Deterministic ordering (insertion order of the
    * ListMap / sorted for plain Map) so built URLs are reproducible.
    */
  def queryString(base: String, params: Seq[(String, String)]): String =
    if (params.isEmpty) base
    else params
      .map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(v, "UTF-8")
      }
      .mkString(base + "?", "&", "")

  /** S1: authenticate once per pipeline run, hold the session token.
    * The HTTP implementation lives outside this repo's test surface;
    * the trait is what the fetchers receive.
    */
  trait SessionAuth extends Serializable {
    def token(): String
  }

  /** A pre-authenticated session for tests / offline runs. */
  final case class StaticAuth(value: String) extends SessionAuth {
    def token(): String = value
  }

  /** S6: HATEOAS link-follow — rows carrying a `comments` URL field
    * (F7: link-present filter) fan out to one GET per link
    * (qa_api_handler.py:202-228: guard `'comments' in jr`, then GET
    * base+url).
    */
  trait LinkFetcher extends Serializable {
    def fetch(url: String): Iterator[String]
  }

  def followLinks(
      rows: DataFrame,
      linkCol: String,
      fetcher: LinkFetcher,
      tasks: Int = 8): Dataset[String] = {
    import rows.sparkSession.implicits._
    rows
      .filter(col(linkCol).isNotNull) // F7
      .select(col(linkCol).cast("string")).as[String]
      .repartition(tasks)
      .mapPartitions(_.flatMap(fetcher.fetch))
  }

  /** S3: the reference's get_all_contacts can source its keys either
    * from date windows (API scan) or from a SQL file's result
    * (qa_api_handler.py:120-123). Model the choice as data.
    */
  sealed trait ContactSource
  final case class WindowScan(windows: Seq[Ingest.DateWindow]) extends ContactSource
  final case class KeysFromQuery(keys: DataFrame, keyCol: String) extends ContactSource

  /** Resolve a source selector to the raw document Dataset. */
  def extract(
      spark: SparkSession,
      source: ContactSource,
      windowFetcher: Ingest.WindowFetcher,
      keyFetcher: Ingest.KeyFetcher,
      tasks: Int = 8): Dataset[String] = {
    import spark.implicits._
    source match {
      case WindowScan(ws) => Ingest.fetchWindows(spark, ws, windowFetcher)
      case KeysFromQuery(df, c) =>
        Ingest.fetchPerKey(
          df.select(col(c).cast("long")).as[java.lang.Long], keyFetcher, tasks)
    }
  }
}
