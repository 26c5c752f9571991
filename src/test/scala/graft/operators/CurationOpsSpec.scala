package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantic invariants of the round-11 curation/retrieval additions —
  * txt16 chunking, txt17 TF-IDF keywords, sim11 range search, mm09
  * canonical selection — checked against independent recomputation on
  * sf0.001 (the DuckDB gate pins the sf0.01 hashes; these pin the
  * PROPERTIES that must survive any refactor).
  */
class CurationOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val d = "/root/testdata/sf0.001"

  test("txt16: chunks reassemble to the document (overlap stripped) and window widths hold") {
    import spark.implicits._
    val chunks = TextAnalysis.txt16Chunking(spark, d)
      .select($"doc_id", $"chunk_id", $"chunk_text").as[(Long, Int, String)]
      .collect().groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._2).map(_._3).toVector
      }
    val texts = graft.core.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(chunks.keySet === texts.keySet, "every doc must chunk")
    val step = TextAnalysis.txt16ChunkSize - TextAnalysis.txt16Overlap
    chunks.foreach { case (id, cs) =>
      // chunk i starts at i*step: dropping the 50-char overlap from every
      // chunk but the first must reconstruct the document exactly
      val rebuilt = cs.head + cs.tail.map(_.drop(TextAnalysis.txt16Overlap)).mkString
      assert(rebuilt === texts(id), s"doc $id reassembly")
      cs.init.foreach(c => assert(c.length === TextAnalysis.txt16ChunkSize,
        s"doc $id: every non-final chunk is a full window"))
      assert(cs.last.length <= TextAnalysis.txt16ChunkSize)
      // one chunk per step-aligned start — no gap, no extra trailing chunk
      val expected = 1 + math.max(texts(id).length - TextAnalysis.txt16Overlap - 1, 0) / step
      assert(cs.size === expected, s"doc $id chunk count")
    }
  }

  test("txt17: per-doc top-3 by tf*rsj-idf matches a scala recomputation") {
    import spark.implicits._
    val out = TextAnalysis.txt17TfidfKeywords(spark, d)
      .select($"doc_id", $"rnk", $"term", $"tf", $"tfidf")
      .as[(Long, Int, String, Long, Double)].collect()
    val texts = graft.core.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val tf = texts.map { case (id, t) =>
      id -> t.split(" ", -1).filter(_.nonEmpty).groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    }
    val n = texts.size.toDouble
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, o) => w -> o.size.toDouble }
    val expect = tf.flatMap { case (id, m) =>
      m.toSeq.map { case (w, c) => (id, w, c, c.toDouble * ((n - df(w) + 0.5) / (df(w) + 0.5))) }
        .sortBy { case (_, w, _, sc) => (-sc, w) }.take(3).zipWithIndex
        .map { case ((_, w, c, sc), i) => (id, i + 1, w, c, sc) }
    }.toSet
    assert(out.toSet === expect)
    // ranks within a doc are contiguous from 1 with non-increasing scores
    out.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to rows.length), s"doc $id ranks")
      assert(sorted.map(_._5).toSeq.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"doc $id scores descend")
    }
  }

  test("sim11: exactly the vectors inside the radius, descending, scored like sim01") {
    import spark.implicits._
    val out = Similarity.sim11RangeSearch(spark, d)
      .select($"vec_id", $"cos").as[(Long, Double)].collect()
    // independent recomputation: double-precision cosine over the raw rows
    val vecs = graft.core.Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    val q = vecs(0L)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.collect {
      case (id, v) if id != 0L && cos(v, q) >= Similarity.sim11Tau => id
    }.toSet
    assert(out.map(_._1).toSet === expected, "radius membership is exact")
    assert(out.forall(_._2 >= Similarity.sim11Tau))
    assert(out.map(_._2).toSeq.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "descending by cos")
    // range search at tau and brute-force top-k agree on their overlap
    val top = Similarity.sim01BruteTopK(spark, d)
      .select($"vec_id", $"cos").as[(Long, Double)].collect()
    top.filter(_._2 >= Similarity.sim11Tau).foreach { case (id, c) =>
      assert(out.exists(r => r._1 == id && r._2 == c), s"sim01 row $id inside radius")
    }
  }

  test("q30: running-window funnel equals the brute-force exists-chain definition") {
    import spark.implicits._
    val out = Relational.q30Funnel(spark, d)
      .select($"user_id", $"stage").as[(Long, Int)].collect().toMap
    val ev = graft.core.Tables.events(spark, d)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as t")
      .as[(Long, String, Long)].collect().groupBy(_._1)
    // definition: stage 1 iff a view exists; 2 iff some view < click;
    // 3 iff some view < click < purchase (strict timestamps)
    val expect = ev.map { case (u, rows) =>
      val vs = rows.filter(_._2 == "view").map(_._3)
      val cs = rows.filter(_._2 == "click").map(_._3)
      val ps = rows.filter(_._2 == "purchase").map(_._3)
      val s1 = vs.nonEmpty
      val s2 = s1 && cs.exists(c => vs.exists(_ < c))
      val s3 = s2 && ps.exists(p => cs.exists(c => c < p && vs.exists(_ < c)))
      u -> (Seq(s1, s2, s3).count(identity))
    }
    assert(out === expect)
  }

  test("sim12: rerank scores are the exact cosine; survivors come from the prefix cut") {
    import spark.implicits._
    val out = Similarity.sim12TruncatedPrefilter(spark, d)
      .select($"vec_id", $"pre_cos", $"cos").as[(Long, Double, Double)].collect()
    assert(out.length == 10)
    val vecs = graft.core.Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    val q = vecs(0L)
    def cos(a: Array[Float], b: Array[Float], dims: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dims) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // the reported cos is the full-width exact cosine, not the prefix one
    out.foreach { case (id, _, c) =>
      assert(math.abs(c - cos(vecs(id), q, q.length)) < 1e-12, s"vec $id exact cos")
    }
    // every survivor sits inside the prefix top-30 recomputed independently
    val pre30 = vecs.collect { case (id, v) if id != 0L =>
      (id, cos(v, q, Similarity.sim12PrefixDims))
    }.toSeq.sortBy { case (id, p) => (-p, id) }.take(30).map(_._1).toSet
    out.foreach { case (id, p, _) =>
      assert(pre30.contains(id), s"vec $id outside the prefix cut")
      assert(math.abs(p - cos(vecs(id), q, Similarity.sim12PrefixDims)) < 1e-12)
    }
  }

  test("mm09: canonical is the largest-payload member, clusters partition the pair graph") {
    import spark.implicits._
    val out = Multimodal.mm09MediaCanonical(spark, d)
      .select($"cluster_id", $"media_type", $"n_members", $"canonical_id", $"canonical_bytes")
      .as[(Long, String, Long, Long, Long)].collect()
    val pairs = Multimodal.phashPairs(spark, d)
      .select($"item", $"peer").as[(Long, Long)].collect()
    val bytes = graft.core.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.getBytes("UTF-8").length.toLong }.toMap
    // independent union-find over the confirmed pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = parent.keys.toSeq.groupBy(find).map { case (_, ms) =>
      ms.min -> ms.toSet
    }
    assert(out.map(_._1).toSet === comps.keySet, "one row per component, labeled by min id")
    out.foreach { case (cid, mt, nm, canId, canBytes) =>
      val members = comps(cid)
      assert(nm === members.size.toLong, s"cluster $cid size")
      assert(members.contains(canId), s"cluster $cid canonical is a member")
      assert(canBytes === members.map(bytes).max, s"cluster $cid keeps the largest copy")
      assert(canId === members.filter(m => bytes(m) == canBytes).min,
        s"cluster $cid doc_id tiebreak")
      assert(members.forall(m => m % 3 == cid % 3), s"cluster $cid single modality")
      val types = Seq("image", "audio", "video")
      assert(mt === types((cid % 3 + 1).toInt - 1), s"cluster $cid media_type")
    }
  }
}
