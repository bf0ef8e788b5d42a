package graft

import graft.api.{FoodFinder, SearchServer}
import graft.embed.EmbedJob
import graft.etl.Flatten
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP serving layer over real sockets: the reference Flask app's
  * routes, validation messages, filters and result shape, exercised with a
  * plain JDK HTTP client against a live [[SearchServer]]. */
class SearchServerSpec extends AnyFunSuite with SparkTest {
  import ReferenceParitySpec._
  import spark.implicits._

  private lazy val detail = {
    val catalogs = Seq(
      Catalog("c1", "Desayuno Box", "PE", "LIMA-01", Seq(
        Product("p1", "1", "Nuggets Box", "nuggets de pollo para el desayuno",
          Price(7.5, "S/7,50"), available = true, combo = false))),
      Catalog("c2", "Almuerzo Combo", "PE", "LIMA-02", Seq(
        Product("p2", "2", "Big Combo", "hamburguesa doble con papas fritas",
          Price(18.0, "S/18,00"), available = true, combo = true))),
      Catalog("c3", "Cena Familiar", "PE", "AREQUIPA-01", Seq(
        Product("p3", "3", "Pollo Entero", "pollo a la brasa con ensalada",
          Price(45.0, "S/45,00"), available = false, combo = false))),
    ).toDF()
    val flat = Flatten.productDetail(catalogs)
      .withColumn("description", col("product.description"))
    EmbedJob.embedBatched(flat, "description")
      .withColumnRenamed("emb", "emb_description").cache()
  }
  private lazy val server = new SearchServer(
    FoodFinder.SearchTable(detail, "_id", "emb_description", "title")).start(0)
  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"
  private val http = java.net.http.HttpClient.newHttpClient()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def post(path: String, body: String): (Int, String) = {
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(base + path))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
    val r = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def get(path: String): (Int, String) = {
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(base + path)).GET().build()
    val r = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("GET /api/restaurants returns the sorted distinct names") {
    val (code, body) = get("/api/restaurants")
    assert(code === 200)
    val names = mapper.readTree(body)
    assert((0 until names.size()).map(names.get(_).asText()) ===
      Seq("AREQUIPA-01", "LIMA-01", "LIMA-02"))
  }

  test("POST /api/search vector mode ranks by similarity and honors the limit clamp") {
    val (code, body) = post("/api/search",
      """{"mode":"vector","description":"nuggets de pollo desayuno","limit":2}""")
    assert(code === 200)
    val arr = mapper.readTree(body)
    assert(arr.isArray && arr.size() === 2)
    assert(arr.get(0).get("id").asText() === "p1", s"top hit in: $body")
    // a degenerate limit clamps to 1, never errors (backend/api.py:116-119)
    val (c2, b2) = post("/api/search",
      """{"mode":"vector","description":"nuggets","limit":-3}""")
    assert(c2 === 200 && mapper.readTree(b2).size() === 1)
  }

  test("POST /api/search filters ride the pipeline (available / maxPrice / restaurant)") {
    val (_, all) = post("/api/search",
      """{"mode":"vector","description":"comida","limit":10}""")
    assert(mapper.readTree(all).size() === 3)
    val (_, affordable) = post("/api/search",
      """{"mode":"vector","description":"comida","limit":10,"maxPrice":20}""")
    val ids = { val a = mapper.readTree(affordable)
      (0 until a.size()).map(a.get(_).get("id").asText()).toSet }
    assert(ids === Set("p1", "p2"))
    val (_, open) = post("/api/search",
      """{"mode":"vector","description":"comida","limit":10,"available":true}""")
    val a2 = mapper.readTree(open)
    assert((0 until a2.size()).map(a2.get(_).get("id").asText()).toSet === Set("p1", "p2"))
    val (_, oneShop) = post("/api/search",
      """{"mode":"fulltext","title":"Combo Box","limit":10,"restaurant":"LIMA-02"}""")
    val a3 = mapper.readTree(oneShop)
    assert((0 until a3.size()).map(a3.get(_).get("id").asText()).toSet === Set("p2"))
  }

  test("validation mirrors the reference's 400 contract, message for message") {
    val (c1, b1) = post("/api/search", """{"mode":"teleport","description":"x"}""")
    assert(c1 === 400 &&
      mapper.readTree(b1).get("message").asText() === "Modo de búsqueda no válido.")
    val (c2, b2) = post("/api/search", """{"mode":"vector"}""")
    assert(c2 === 400 && mapper.readTree(b2).get("message").asText() ===
      "La descripción es obligatoria para la búsqueda seleccionada.")
    val (c3, b3) = post("/api/search", """{"mode":"fulltext"}""")
    assert(c3 === 400 && mapper.readTree(b3).get("message").asText() ===
      "El título es obligatorio para la búsqueda seleccionada.")
    val (c4, b4) = post("/api/search",
      """{"mode":"vector","description":"x","maxPrice":"not-a-price"}""")
    assert(c4 === 400 && mapper.readTree(b4).get("message").asText() ===
      "El formato del precio máximo no es válido.")
    // malformed JSON = empty payload (the reference's get_json(silent=
    // True) or {}, backend/api.py:100) → the required-description 400,
    // never a 500 parse error
    val (c5, b5) = post("/api/search", "not json {{{")
    assert(c5 === 400 && mapper.readTree(b5).get("message").asText() ===
      "La descripción es obligatoria para la búsqueda seleccionada.")
  }

  test("method and path gating: 405 on wrong method, 404 beyond the exact route") {
    // Flask 405s a wrong method before the view runs and 404s any path
    // that isn't an exact route; JDK HttpServer prefix-matches contexts
    // and takes every method, so the server must gate both itself
    val (c1, _) = get("/api/search")
    assert(c1 === 405)
    val (c2, _) = post("/api/restaurants", "{}")
    assert(c2 === 405)
    val (c3, _) = post("/api/searchanything",
      """{"mode":"vector","description":"x"}""")
    assert(c3 === 404)
    val (c4, _) = get("/api/restaurants/extra")
    assert(c4 === 404)
  }

  test("server 400 rules and FoodFinder.validate are one rule set") {
    // the server carries the reference's Spanish messages, the library the
    // English ones — but they must gate the SAME shapes: for every mode ×
    // field combination the server 400s exactly when validate throws
    val cases = Seq(
      ("vector", None, None), ("vector", Some("nuggets"), None),
      ("vector", Some("nuggets"), Some("Box")),
      ("fulltext", None, None), ("fulltext", None, Some("Box")),
      ("fulltext", Some("nuggets"), None),
      ("hybrid", Some("nuggets"), None), ("hybrid", None, Some("Box")),
      ("hybrid", Some("nuggets"), Some("Box")))
    cases.foreach { case (mode, d, t) =>
      val payload = mapper.createObjectNode().put("mode", mode)
      d.foreach(payload.put("description", _))
      t.foreach(payload.put("title", _))
      val (code, body) = post("/api/search", payload.toString)
      val lib = scala.util.Try(FoodFinder.validate(mode, d, t, 5))
      assert((code == 400) === lib.isFailure,
        s"mode=$mode d=$d t=$t → http $code vs validate $lib ($body)")
    }
  }

  test("frontend: index.html renders, assets serve, traversal is confined") {
    // the reference's own frontend tree shape: templates/index.html with
    // Flask url_for links + static/{css,js}; a secret outside static/
    // must be unreachable through the asset route
    val root = java.nio.file.Files.createTempDirectory("frontend")
    java.nio.file.Files.createDirectories(root.resolve("templates"))
    java.nio.file.Files.createDirectories(root.resolve("static/css"))
    java.nio.file.Files.createDirectories(root.resolve("static/js"))
    java.nio.file.Files.writeString(root.resolve("templates/index.html"),
      """<html><head>
        |<link rel="stylesheet" href="{{ url_for('static', filename='css/styles.css') }}" />
        |</head><body><h1>Food Finder</h1>
        |<script src="{{ url_for('static', filename='js/main.js') }}"></script>
        |</body></html>""".stripMargin)
    java.nio.file.Files.writeString(root.resolve("static/css/styles.css"),
      "body { margin: 0; }")
    java.nio.file.Files.writeString(root.resolve("static/js/main.js"),
      "fetch('/api/restaurants');")
    java.nio.file.Files.writeString(root.resolve("secret.txt"), "do not serve")
    val srv = new SearchServer(
      FoodFinder.SearchTable(detail, "_id", "emb_description", "title"),
      frontendDir = Some(root)).start(0)
    try {
      val b = s"http://127.0.0.1:${srv.getAddress.getPort}"
      def fget(path: String): (Int, String) = {
        val r = http.send(java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(b + path)).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      val (ci, index) = fget("/")
      assert(ci === 200 && index.contains("Food Finder"))
      assert(index.contains("/static/css/styles.css") &&
        index.contains("/static/js/main.js"),
        s"url_for must render to /static/ links: $index")
      assert(!index.contains("{{"), "no unrendered template expressions")
      val (cjs, js) = fget("/static/js/main.js")
      assert(cjs === 200 && js.contains("/api/restaurants"))
      assert(fget("/static/css/styles.css")._1 === 200)
      // API routes still win longest-prefix dispatch over "/"
      val r = http.send(java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(b + "/api/restaurants")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() === 200 && r.body().startsWith("["))
      // traversal attempts: plain ../, encoded %2e%2e, missing file,
      // non-root path on "/" — all 404, never the secret
      for (p <- Seq("/static/../secret.txt", "/static/%2e%2e/secret.txt",
          "/static/nope.js", "/elsewhere")) {
        val (code, body) = fget(p)
        assert(code === 404, s"$p must 404, got $code")
        assert(!body.contains("do not serve"), s"$p leaked the secret")
      }
    } finally srv.stop(0)
  }

  test("frontend: the reference's own asset tree serves as-is") {
    val ref = java.nio.file.Paths.get("/root/reference/frontend")
    assume(java.nio.file.Files.isDirectory(ref), "reference frontend absent")
    val srv = new SearchServer(
      FoodFinder.SearchTable(detail, "_id", "emb_description", "title"),
      frontendDir = Some(ref)).start(0)
    try {
      val b = s"http://127.0.0.1:${srv.getAddress.getPort}"
      def fget(path: String): (Int, String) = {
        val r = http.send(java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(b + path)).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      val (ci, index) = fget("/")
      assert(ci === 200 && index.contains("Food Finder"))
      // BOTH url_for links must resolve to the exact static routes this
      // server serves — not merely "no Jinja braces left"
      assert(!index.contains("{{"),
        "the reference template's url_for links must render")
      assert(index.contains("href=\"/static/css/styles.css\""),
        "stylesheet url_for must resolve to the served static route")
      assert(index.contains("src=\"/static/js/main.js\""),
        "script url_for must resolve to the served static route")
      // the rendered page IS the template with only the two url_for
      // substitutions applied — byte-identical outside them
      val tmpl = new String(java.nio.file.Files.readAllBytes(
        ref.resolve("templates/index.html")), "UTF-8")
      val expected = """\{\{\s*url_for\(\s*'static'\s*,\s*filename\s*=\s*'([^']+)'\s*\)\s*\}\}""".r
        .replaceAllIn(tmpl, m =>
          scala.util.matching.Regex.quoteReplacement("/static/" + m.group(1)))
      assert(index === expected,
        "rendered index.html must be the reference template with url_for resolved")
      // asset BYTES round-trip untouched
      def bget(path: String): Array[Byte] = {
        val r = http.send(java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(b + path)).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        assert(r.statusCode() === 200, s"$path must serve, got ${r.statusCode()}")
        r.body()
      }
      assert(java.util.Arrays.equals(bget("/static/js/main.js"),
          java.nio.file.Files.readAllBytes(ref.resolve("static/js/main.js"))),
        "main.js bytes must round-trip")
      assert(java.util.Arrays.equals(bget("/static/css/styles.css"),
          java.nio.file.Files.readAllBytes(ref.resolve("static/css/styles.css"))),
        "styles.css bytes must round-trip")
      assert(new String(bget("/static/js/main.js"), "UTF-8").contains("/api/search"),
        "the reference JS calls the API this server implements")
    } finally srv.stop(0)
  }

  test("hybrid mode over HTTP returns fused scores with detail columns") {
    val (code, body) = post("/api/search",
      """{"mode":"hybrid","description":"nuggets de pollo","title":"Desayuno Box","limit":3}""")
    assert(code === 200, body)
    val arr = mapper.readTree(body)
    assert(arr.size() >= 1)
    val top = arr.get(0)
    assert(top.get("id").asText() === "p1")
    // flattened scoreDetails columns (R13) survive the wire
    assert(top.has("score") && top.has("vec_norm") && top.has("txt_norm"))
  }
}
