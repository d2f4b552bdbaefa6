package graft.lake

import org.scalatest.funsuite.AnyFunSuite

class TomlSpec extends AnyFunSuite {

  /** Verbatim copy of the reference's metadata fixture
    * (`/root/reference/test.toml:1-24`) — the interop contract: a real
    * pydala lake's `_dataset.toml` must parse as-is. */
  val referenceFixture: String =
    """[dataset]
      |name = "symbols"
      |desciption = ""
      |path = "/path/to/dataset"
      |bucket = ""
      |
      |[timefly.current]
      |created = 2022-10-20T10:12:01+02:00
      |partition_names = ["type", "exchange"]
      |format = "parquet"
      |sort_by = "time"
      |ascending = true
      |compression = "zstd"
      |distinct = true
      |columns = ["A", "BC"]
      |batches = 1e6
      |
      |[timefly.20221001_130513]
      |created = 2022-10-01T13:05:13+02:00
      |partition_names = ["type", "exchange"]
      |format = "parquet"
      |sort_by = "time"
      |ascending = true
      |compression = "zstd"
      |distinct = true
      |columns = ["A", "BC"]
      |batches = "3M"
      |
      |
      |[timefly.history]
      |available = ["current", "20221001_130513"]
      |deleted = ["20220930_010535", "20220920_164523"]
      |""".stripMargin

  test("parses the reference fixture verbatim with faithful types") {
    val n = Toml.parse(referenceFixture)
    assert(n.at("/dataset/name").asText == "symbols")
    assert(n.at("/dataset/desciption").asText == "") // sic, reference typo
    val cur = n.at("/timefly/current")
    assert(cur.get("created").asText == "2022-10-20T10:12:01+02:00")
    assert(cur.get("ascending").asBoolean)
    assert(cur.get("batches").isDouble && cur.get("batches").asDouble == 1e6)
    val pn = cur.get("partition_names")
    assert(pn.isArray && pn.size == 2 && pn.get(1).asText == "exchange")
    val snap = n.at("/timefly/20221001_130513")
    assert(snap.get("batches").asText == "3M") // string, not number
    val hist = n.at("/timefly/history")
    assert(hist.get("available").size == 2)
    assert(hist.get("deleted").get(0).asText == "20220930_010535")
  }

  test("render → parse round-trips the reference fixture losslessly") {
    val once = Toml.parse(referenceFixture)
    val again = Toml.parse(Toml.render(once))
    assert(again == once)
    // datetimes must re-render BARE (a quoted string would change the
    // type a TOML reader sees)
    val rendered = Toml.render(once)
    assert(rendered.contains("created = 2022-10-20T10:12:01+02:00"))
    assert(!rendered.contains("\"2022-10-20T10:12:01+02:00\""))
  }

  test("rtoml None-replacer convention: \"None\" ↔ null") {
    val n = Toml.parse("a = \"None\"\nb = \"real\"")
    assert(n.get("a").isNull)
    assert(n.get("b").asText == "real")
    val out = Toml.render(n)
    assert(out.contains("a = \"None\""))
  }

  test("value-type corners: ints, floats, negatives, multi-line arrays, " +
      "inline tables, comments, quoted keys") {
    val n = Toml.parse(
      """# full-line comment
        |i = 42
        |neg = -7
        |f = 2.5e-3
        |s = "with # hash and \"quote\""
        |multi = [
        |  1,
        |  2,
        |  3
        |] # trailing comment
        |inline = { x = 1, y = "z" }
        |"quoted key" = true
        |
        |[outer.inner]
        |d = 2024-01-02
        |""".stripMargin)
    assert(n.get("i").asLong == 42L)
    assert(n.get("neg").asLong == -7L)
    assert(n.get("f").asDouble == 2.5e-3)
    assert(n.get("s").asText == "with # hash and \"quote\"")
    assert((0 until 3).map(n.get("multi").get(_).asLong) == Seq(1L, 2L, 3L))
    assert(n.at("/inline/x").asLong == 1L)
    assert(n.at("/inline/y").asText == "z")
    assert(n.get("quoted key").asBoolean)
    assert(n.at("/outer/inner/d").asText == "2024-01-02")
    // and all of it survives a round-trip
    assert(Toml.parse(Toml.render(n)) == n)
  }

  test("array-of-tables: parse, dotted-path-into-last-element, nested " +
      "[[..]], and a lossless round-trip") {
    val doc =
      """title = "aot"
        |
        |[[server]]
        |host = "a"
        |port = 1
        |
        |[server.limits]
        |max = 10
        |
        |[[server]]
        |host = "b"
        |port = 2
        |
        |[[server.mounts]]
        |path = "/data"
        |
        |[[server.mounts]]
        |path = "/logs"
        |""".stripMargin
    val n = Toml.parse(doc)
    assert(n.get("server").isArray && n.get("server").size == 2)
    assert(n.at("/server/0/host").asText == "a")
    // [server.limits] attached to the FIRST element (last at the time)
    assert(n.at("/server/0/limits/max").asLong == 10L)
    assert(n.at("/server/1/host").asText == "b")
    // nested [[server.mounts]] attached to the second element
    assert(n.at("/server/1/mounts").size == 2)
    assert(n.at("/server/1/mounts/1/path").asText == "/logs")
    // render emits [[..]] sections and the round-trip is identity
    val rendered = Toml.render(n)
    assert(rendered.contains("[[server]]"))
    assert(Toml.parse(rendered) == n)
    // arrays of scalars are untouched; empty arrays stay inline
    val m = Toml.parse("a = [1, 2]\nb = []\n")
    assert(Toml.parse(Toml.render(m)) == m)
  }

  test("empty tables render and re-parse (the manager's empty dataset " +
      "section)") {
    val n = Toml.parse("[pydala]\nname = \"lake\"\n\n[dataset]\n")
    assert(n.has("dataset") && n.get("dataset").isObject
      && n.get("dataset").isEmpty)
    assert(Toml.parse(Toml.render(n)) == n)
  }
}
