package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram language identification — the Cavnar-Trenkle
  * rank-order method ("N-Gram-Based Text Categorization", SDAIR 1994),
  * the public-standard replacement for marker-word heuristics
  * ([[TextAnalysis.langIdOf]] stays as the cheap/SQL-twin form).
  *
  * A language PROFILE is the top-K most frequent character n-grams
  * (n = 1..nMax) of a training corpus, ranked by frequency. A document
  * is classified by building its own ranked profile the same way and
  * summing the rank displacement ("out-of-place" distance) of each of
  * its grams against every language profile — a gram absent from the
  * language profile costs the maximum displacement K. Smallest total
  * distance wins. Rank-order matching is what makes the method robust
  * on SHORT and accented text, where marker-word hit counts are mostly
  * zero: every character of the document contributes evidence.
  *
  * Determinism: ranking breaks frequency ties lexicographically, so
  * profiles and distances are pure functions of the text. Characters
  * are UTF-16 code units — identical to code points for all BMP text,
  * and the same convention as every other kernel here.
  *
  * Scale shape: classification is a map-side codegen'd per-row loop
  * ([[CtLangDistExpr]] — the LangScoresExpr convention) with the
  * profiles broadcast as literal state in the expression; no shuffle,
  * no UDF. Training at corpus scale ([[trainProfiles]]) is one
  * explode → (lang, gram) partial+final count → per-lang top-K window;
  * only K·nLangs tiny rows ever reach the driver. */
object LangId {

  /** C-T classic settings, sized down from the paper's 300 for the
    * 1..3-gram alphabet (the paper uses 1..5-grams). */
  val NMax = 3
  val TopK = 200

  // ── profile construction (pure — shared by the embedded profiles,
  //    the executor-side classifier loop, and the DuckDB twin
  //    generator in Queries) ─────────────────────────────────────────

  /** Per-word padded n-gram counts of one text: each whitespace token
    * is lowercased and padded to `" tok "`, then every n-gram for
    * n = 1..nMax is counted (word-boundary grams like `" th"` carry
    * the strongest signal — the reason C-T pads). */
  private[ext] def gramCounts(text: String, nMax: Int): java.util.HashMap[String, Long] = {
    val counts = new java.util.HashMap[String, Long]()
    // Locale.ROOT: locale-independent like Spark's lower() and the
    // DuckDB twin — a Turkish-default JVM would otherwise map 'I'→'ı'
    // and diverge from trained profiles
    val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val padded = " " + toks(t) + " "
      var n = 1
      while (n <= nMax) {
        var i = 0
        val last = padded.length - n
        while (i <= last) {
          val g = padded.substring(i, i + n)
          val prev = counts.get(g)
          counts.put(g, prev + 1L) // HashMap[ ,Long] unboxes absent to 0
          i += 1
        }
        n += 1
      }
      t += 1
    }
    counts
  }

  /** Ranked top-K profile of a training corpus: grams ordered by
    * (count desc, gram asc) — the lexicographic tie-break pins the
    * order — truncated to `topK`. */
  def profileOf(texts: Seq[String], nMax: Int = NMax, topK: Int = TopK): Seq[String] = {
    val total = new java.util.HashMap[String, Long]()
    texts.foreach { t =>
      gramCounts(t, nMax).forEach { (g, c) =>
        total.put(g, total.get(g) + c)
      }
    }
    import scala.jdk.CollectionConverters._
    total.asScala.toSeq.sortBy { case (g, c) => (-c, g) }.take(topK).map(_._1)
  }

  /** Embedded seed corpora for the four stock profiles — a few
    * sentences of ordinary prose per language (original text, written
    * for this library; accents included so the gram alphabet carries
    * them). Production systems train on their own corpus via
    * [[trainProfiles]]; these seeds make the stock classifier usable
    * out of the box on short/accented text the stopword heuristic
    * misses. */
  private[graft] val seeds: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "the quick brown fox jumps over the lazy dog while the children watch from the garden",
      "she said that the weather would be better in the morning and that they should wait",
      "this is the house that we built together last summer near the river and the old bridge",
      "people often think that reading books is the best way to learn about the world around them",
      "there was nothing left to do but wait for the train and hope that it would not be late",
      "it is on the roof and the cat is in the kitchen with the dog and the children",
      "good morning everyone said the teacher as the students opened their books for the first lesson",
      "every evening the family gathers around the table to share a meal and talk about the day"),
    "de" -> Seq(
      "der schnelle braune fuchs springt über den faulen hund während die kinder aus dem garten zuschauen",
      "sie sagte dass das wetter morgen besser werden würde und dass sie warten sollten",
      "das ist das haus das wir letzten sommer zusammen in der nähe des flusses gebaut haben",
      "viele menschen glauben dass bücher lesen der beste weg ist um die welt zu verstehen",
      "es gab nichts mehr zu tun außer auf den zug zu warten und zu hoffen dass er nicht zu spät kommt",
      "die katze ist auf dem dach und der hund ist in der küche bei den kindern",
      "guten morgen alle zusammen sagte der lehrer während die schüler ihre bücher für die erste stunde öffnen",
      "jeden abend versammelt sich die familie um den tisch um gemeinsam zu essen und über den tag zu sprechen",
      "die freunde kamen zu spät weil auf der hauptstraße viel verkehr war"),
    "fr" -> Seq(
      "le rapide renard brun saute par dessus le chien paresseux pendant que les enfants regardent depuis le jardin",
      "elle a dit que le temps serait meilleur demain matin et qu'ils devraient attendre",
      "c'est la maison que nous avons construite ensemble l'été dernier près de la rivière et du vieux pont",
      "beaucoup de gens pensent que lire des livres est la meilleure façon de comprendre le monde",
      "il ne restait plus rien à faire sauf attendre le train et espérer qu'il ne soit pas en retard",
      "le chat est sur le toit et le chien est dans la cuisine avec les enfants",
      "bonjour à tous dit le professeur pendant que les élèves ouvrent leurs livres pour la première leçon",
      "chaque soir la famille se réunit autour de la table pour partager un repas et parler de la journée",
      "les amis sont arrivés en retard parce qu'il y avait beaucoup de circulation sur la route principale"),
    "es" -> Seq(
      "el rápido zorro marrón salta sobre el perro perezoso mientras los niños miran desde el jardín",
      "ella dijo que el tiempo sería mejor por la mañana y que deberían esperar",
      "esta es la casa que construimos juntos el verano pasado cerca del río y del puente viejo",
      "mucha gente piensa que leer libros es la mejor manera de aprender sobre el mundo",
      "no quedaba nada más que hacer salvo esperar el tren y confiar en que no llegara tarde",
      "el gato está en el tejado y el perro está en la cocina con los niños",
      "buenos días a todos dijo el profesor mientras los alumnos abren sus libros para la primera lección",
      "cada noche la familia se reúne alrededor de la mesa para compartir la cena y hablar del día",
      "los amigos llegaron tarde porque había mucho tráfico en la carretera principal"),
    "it" -> Seq(
      "la rapida volpe marrone salta sopra il cane pigro mentre i bambini guardano dal giardino",
      "lei ha detto che il tempo sarebbe stato migliore domattina e che avrebbero dovuto aspettare",
      "questa è la casa che abbiamo costruito insieme l'estate scorsa vicino al fiume e al vecchio ponte",
      "molte persone pensano che leggere libri sia il modo migliore per conoscere il mondo",
      "non restava altro da fare che aspettare il treno e sperare che non fosse in ritardo",
      "il gatto è sul tetto e il cane è in cucina con i bambini",
      "questo racconto parla della storia della nostra città e della gente che ci abita da sempre",
      "ogni sera la famiglia si riunisce intorno alla tavola per mangiare insieme e parlare della giornata",
      "gli amici sono arrivati in ritardo perché c'era molto traffico sulla strada principale",
      "il professore spiega la lezione mentre gli studenti aprono i loro libri"),
    "nl" -> Seq(
      "de snelle bruine vos springt over de luie hond terwijl de kinderen vanuit de tuin toekijken",
      "ze zei dat het weer morgenochtend beter zou worden en dat ze moesten wachten",
      "dit is het huis dat we vorige zomer samen hebben gebouwd bij de rivier en de oude brug",
      "veel mensen denken dat boeken lezen de beste manier is om de wereld te leren kennen",
      "er was niets meer te doen dan op de trein te wachten en te hopen dat hij niet te laat zou zijn",
      "de kat zit op het dak en de hond is in de keuken bij de kinderen",
      "elke avond komt de familie samen rond de tafel om te eten en over de dag te praten",
      "de vrienden kwamen te laat omdat er veel verkeer was op de grote weg",
      "de leraar legt de les uit terwijl de studenten hun boeken openen"),
    "pt" -> Seq(
      "a rápida raposa marrom salta sobre o cão preguiçoso enquanto as crianças observam do jardim",
      "ela disse que o tempo estaria melhor pela manhã e que eles deveriam esperar",
      "esta é a casa que construímos juntos no verão passado perto do rio e da ponte velha",
      "muitas pessoas acham que ler livros é a melhor maneira de aprender sobre o mundo",
      "não restava mais nada a fazer senão esperar o trem e torcer para que não chegasse atrasado",
      "o gato está no telhado e o cão está na cozinha com as crianças",
      "todas as noites a família se reúne em volta da mesa para comer e conversar sobre o dia",
      "os amigos chegaram atrasados porque havia muito trânsito na estrada principal",
      "o professor explica a lição enquanto os alunos abrem os seus livros"),
    "ru" -> Seq(
      "быстрая коричневая лиса прыгает через ленивую собаку пока дети смотрят из сада",
      "она сказала что утром погода будет лучше и что им стоит подождать",
      "это дом который мы построили вместе прошлым летом возле реки и старого моста",
      "многие люди думают что чтение книг это лучший способ узнать мир вокруг нас",
      "больше ничего не оставалось делать кроме как ждать поезд и надеяться что он не опоздает",
      "кошка сидит на крыше а собака на кухне рядом с детьми",
      "каждый вечер семья собирается за столом чтобы поужинать и поговорить о прошедшем дне",
      "друзья опоздали потому что на главной дороге было много машин",
      "учитель объясняет урок пока ученики открывают свои книги"),
    "el" -> Seq(
      "η γρήγορη καφέ αλεπού πηδά πάνω από το τεμπέλικο σκυλί ενώ τα παιδιά κοιτούν από τον κήπο",
      "είπε ότι ο καιρός θα ήταν καλύτερος το πρωί και ότι έπρεπε να περιμένουν",
      "αυτό είναι το σπίτι που χτίσαμε μαζί το περασμένο καλοκαίρι κοντά στο ποτάμι και στη γέφυρα",
      "πολλοί άνθρωποι πιστεύουν ότι το διάβασμα βιβλίων είναι ο καλύτερος τρόπος να γνωρίσεις τον κόσμο",
      "δεν έμενε τίποτα άλλο παρά να περιμένουν το τρένο και να ελπίζουν ότι δεν θα αργήσει",
      "η γάτα είναι στη στέγη και ο σκύλος στην κουζίνα με τα παιδιά",
      "κάθε βράδυ η οικογένεια μαζεύεται γύρω από το τραπέζι για να φάει και να μιλήσει για τη μέρα",
      "οι φίλοι άργησαν γιατί είχε πολλή κίνηση στον κεντρικό δρόμο",
      "ο δάσκαλος εξηγεί το μάθημα ενώ οι μαθητές ανοίγουν τα βιβλία τους"),
    // CJK: zh/ja carry no spaces, so each sentence is one padded
    // "token" — the char-n-gram alphabet (Han for zh, Han+kana for ja,
    // Hangul for ko) does all the work, which is exactly why C-T holds
    // up where word heuristics cannot. scriptProfile routes first; these
    // profiles settle the han/kana/hangul buckets.
    "zh" -> Seq(
      "敏捷的棕色狐狸跳过懒惰的狗孩子们在花园里看着",
      "她说明天早上天气会更好他们应该再等一等",
      "这是我们去年夏天在河边和老桥附近一起建造的房子",
      "很多人认为读书是了解世界的最好方法",
      "除了等火车并希望它不要晚点以外没有别的事可做",
      "猫在屋顶上狗和孩子们在厨房里",
      "每天晚上全家人围着桌子吃饭谈论一天的事情",
      "朋友们迟到了因为大路上车很多",
      "老师讲课的时候学生们打开他们的书"),
    "ja" -> Seq(
      "すばやい茶色のきつねはなまけものの犬をとびこえて子どもたちは庭から見ている",
      "彼女は明日の朝は天気がよくなるから待つべきだと言った",
      "これは去年の夏に川と古い橋の近くでみんなで建てた家です",
      "多くの人は本を読むことが世界を知る一番よい方法だと思っている",
      "電車を待って遅れないことを願うほかに何もすることがなかった",
      "猫は屋根の上にいて犬は子どもたちと台所にいる",
      "毎晩家族は食卓を囲んで食事をしながらその日のことを話す",
      "大通りは車が多かったので友だちは遅れて来た",
      "先生が授業を説明している間に生徒たちは本を開く"),
    "ko" -> Seq(
      "빠른 갈색 여우가 게으른 개를 뛰어넘고 아이들은 정원에서 지켜본다",
      "그녀는 내일 아침에 날씨가 더 좋아질 테니 기다려야 한다고 말했다",
      "이것은 우리가 지난 여름에 강과 오래된 다리 근처에 함께 지은 집이다",
      "많은 사람들은 책을 읽는 것이 세상을 배우는 가장 좋은 방법이라고 생각한다",
      "기차를 기다리며 늦지 않기를 바라는 것 말고는 할 일이 없었다",
      "고양이는 지붕 위에 있고 개는 아이들과 함께 부엌에 있다",
      "매일 저녁 가족은 식탁에 둘러앉아 저녁을 먹으며 하루 이야기를 나눈다",
      "큰길에 차가 많아서 친구들이 늦게 도착했다",
      "선생님이 수업을 설명하는 동안 학생들은 책을 편다"))

  /** The stock profiles, (lang, ranked grams), sorted by language key —
    * the array order every distance/argmin consumer indexes by. */
  lazy val profiles: Seq[(String, Seq[String])] =
    seeds.toSeq.sortBy(_._1).map { case (l, ts) => (l, profileOf(ts)) }

  /** Distributed profile training: one labeled corpus in, ranked
    * top-K gram profile per language out. The corpus is touched once;
    * the only driver materialization is K grams per language. */
  def trainProfiles(df: DataFrame, langCol: String, textCol: String,
                    nMax: Int = NMax, topK: Int = TopK): Seq[(String, Seq[String])] = {
    val grams = df.select(col(langCol).as("_lang"),
        explode(CtLangExprs.grams(lower(col(textCol)), nMax)).as("_g"))
      .groupBy(col("_lang"), col("_g")).agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_lang")).orderBy(col("_c").desc, col("_g"))
    grams.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= topK)
      .orderBy(col("_lang"), col("_r"))
      .collect()
      .groupBy(_.getString(0)).toSeq.sortBy(_._1)
      .map { case (l, rows) => (l, rows.sortBy(_.getInt(3)).map(_.getString(1)).toSeq) }
  }

  /** Persist trained profiles as parquet — train once on the big
    * corpus ([[trainProfiles]]), classify in every later job. Columns
    * (lang, rank, gram); rank is the C-T profile order the distance
    * depends on. */
  def saveProfiles(spark: org.apache.spark.sql.SparkSession,
                   profs: Seq[(String, Seq[String])], path: String): Unit = {
    import spark.implicits._
    profs.flatMap { case (l, grams) =>
      grams.zipWithIndex.map { case (g, r) => (l, r, g) }
    }.toDF("lang", "rank", "gram")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load profiles written by [[saveProfiles]] — language order and
    * within-profile rank restored (both are semantics: language order
    * fixes the distance array slots, rank order the displacement). */
  def loadProfiles(spark: org.apache.spark.sql.SparkSession,
                   path: String): Seq[(String, Seq[String])] =
    spark.read.parquet(path)
      .select("lang", "rank", "gram")
      .collect()
      .groupBy(_.getString(0)).toSeq.sortBy(_._1)
      .map { case (l, rows) =>
        (l, rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq)
      }

  // ── classification ───────────────────────────────────────────────

  /** Out-of-place distances of `text` (pre-lowercased by the caller if
    * needed — the stock wrappers lowercase) to each profile, profile
    * order = the given sequence's. Codegen'd one-pass-per-row. */
  def distances(text: Column, profs: Seq[(String, Seq[String])] = profiles,
                nMax: Int = NMax, topK: Int = TopK): Column =
    bridge.column(CtLangDistExpr(bridge.expression(text), profs.toIndexedSeq, nMax, topK))

  /** Cavnar-Trenkle language ID: argmin of [[distances]], ties to the
    * lexicographically-first language, 'und' for null text. */
  def langIdCt(text: Column, profs: Seq[(String, Seq[String])] = profiles,
               nMax: Int = NMax, topK: Int = TopK): Column = {
    val d = distances(lower(text), profs, nMax, topK)
    val scored = profs.zipWithIndex.map { case ((l, _), i) =>
      (l, element_at(d, i + 1))
    }
    val best = scored.map(_._2).reduce(least(_, _))
    coalesce(
      scored.foldRight(lit("und"): Column) { case ((l, s), els) =>
        when(s === best, lit(l)).otherwise(els)
      },
      lit("und"))
  }
}

object CtLangLoops {

  /** The document's ranked profile as (gram → rank) entries is never
    * materialized; the distance loop ranks the doc's grams and streams
    * the displacement sum per profile in one pass. */
  def distances(text: UTF8String,
                profMaps: Array[java.util.HashMap[String, Integer]],
                nMax: Int, topK: Int): GenericArrayData = {
    val counts = LangId.gramCounts(text.toString, nMax)
    import scala.jdk.CollectionConverters._
    val ranked = counts.asScala.toSeq.sortBy { case (g, c) => (-c, g) }
      .take(topK)
    val out = new Array[Long](profMaps.length)
    var i = 0
    while (i < ranked.length) {
      val g = ranked(i)._1
      var l = 0
      while (l < profMaps.length) {
        val r = profMaps(l).get(g)
        out(l) += (if (r == null) topK.toLong else math.abs(i - r.intValue()).toLong)
        l += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Whole classification in one call: argmin over [[distances]] with
    * first-index (= lexicographically-first language, profiles being
    * lang-sorted) tie-break — the [[CtLangIdExpr]] kernel. */
  def langId(text: UTF8String,
             profMaps: Array[java.util.HashMap[String, Integer]],
             langs: Array[UTF8String], nMax: Int, topK: Int): UTF8String = {
    val d = distances(text, profMaps, nMax, topK)
    var best = 0
    var i = 1
    while (i < d.numElements()) {
      if (d.getLong(i) < d.getLong(best)) best = i
      i += 1
    }
    langs(best)
  }

  /** All padded n-grams of `text` WITH multiplicity — the training-side
    * explode feed ([[LangId.trainProfiles]]). */
  def grams(text: UTF8String, nMax: Int): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var t = 0
    while (t < toks.length) {
      val padded = " " + toks(t) + " "
      var n = 1
      while (n <= nMax) {
        var i = 0
        val last = padded.length - n
        while (i <= last) {
          out += UTF8String.fromString(padded.substring(i, i + n))
          i += 1
        }
        n += 1
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Out-of-place distance of a document to each language profile, all
  * profiles in ONE pass over the doc's ranked grams (profile order =
  * constructor order). */
case class CtLangDistExpr(child: Expression, profiles: IndexedSeq[(String, Seq[String])],
                          nMax: Int, topK: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ct_lang_dist"

  @transient private lazy val profMaps: Array[java.util.HashMap[String, Integer]] =
    profiles.map { case (_, grams) =>
      val m = new java.util.HashMap[String, Integer]()
      grams.zipWithIndex.foreach { case (g, r) => m.put(g, r) }
      m
    }.toArray

  protected override def nullSafeEval(v: Any): Any =
    CtLangLoops.distances(v.asInstanceOf[UTF8String], profMaps, nMax, topK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapsRef = ctx.addReferenceObj("ctProfiles", profMaps,
      "java.util.HashMap[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.ext.CtLangLoops.distances($c, $mapsRef, $nMax, $topK)")
  }

  override protected def withNewChildInternal(newChild: Expression): CtLangDistExpr =
    copy(child = newChild)
}

/** Whole Cavnar-Trenkle classification as ONE expression (distances +
  * argmin, lexicographically-first tie-break): the SQL-name kernel
  * behind `ct_lang_id`. Null input propagates null — the SQL builder
  * wraps it in COALESCE(…, 'und') to match [[LangId.langIdCt]]. */
case class CtLangIdExpr(child: Expression, profiles: IndexedSeq[(String, Seq[String])],
                        nMax: Int, topK: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "ct_lang_id"

  @transient private lazy val profMaps: Array[java.util.HashMap[String, Integer]] =
    profiles.map { case (_, grams) =>
      val m = new java.util.HashMap[String, Integer]()
      grams.zipWithIndex.foreach { case (g, r) => m.put(g, r) }
      m
    }.toArray
  @transient private lazy val langsArr: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray

  protected override def nullSafeEval(v: Any): Any =
    CtLangLoops.langId(v.asInstanceOf[UTF8String], profMaps, langsArr, nMax, topK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapsRef = ctx.addReferenceObj("ctProfiles", profMaps, "java.util.HashMap[]")
    val langsRef = ctx.addReferenceObj("ctLangs", langsArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.ext.CtLangLoops.langId($c, $mapsRef, $langsRef, $nMax, $topK)")
  }

  override protected def withNewChildInternal(newChild: Expression): CtLangIdExpr =
    copy(child = newChild)
}

/** Training-side gram explode feed. */
case class CtGramsExpr(child: Expression, nMax: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ct_grams"

  protected override def nullSafeEval(v: Any): Any =
    CtLangLoops.grams(v.asInstanceOf[UTF8String], nMax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.CtLangLoops.grams($c, $nMax)")

  override protected def withNewChildInternal(newChild: Expression): CtGramsExpr =
    copy(child = newChild)
}

private[ext] object CtLangExprs {
  def grams(text: Column, nMax: Int): Column =
    bridge.column(CtGramsExpr(bridge.expression(text), nMax))
}
