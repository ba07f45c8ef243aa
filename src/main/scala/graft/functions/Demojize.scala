package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F4 — demojize: rewrite each emoji to `#*name#*` (SURVEY.md §2.8).
  *
  * Reference: `04_Airflow_Dag/thehoxtontrend_full_pipeline_final.py:180-182,
  * 305-307` — `emoji.demojize(x, delimiters=("#*", "#*"))`, commented out
  * in the final revision but with its output baked into the committed
  * golden data (`02_YouTube_API_Tables[Test_Run]/Video_Comments_Table.csv`:
  * 383 distinct `#*name#*` tokens, 5 861 occurrences).
  *
  * The mapping is a constant table applied by [[DemojizeExpr]], one
  * native codegen Expression sweeping the table in replacement order —
  * pure string ops, no UDF, no regex. (The DuckDB oracle mirrors it as
  * a nested-`replace` fold over the SAME ordered entries.) It covers
  * EVERY distinct token in the golden corpus (383/383, spot-verified in
  * GoldenParitySpec) plus the full skin-tone expansion of every
  * toned base the corpus uses. Names are the Unicode CLDR short names
  * (underscored) the Python `emoji` library emits. At full-catalog scale
  * (~3.6k emoji) the same semantics would be an explode-on-codepoint +
  * broadcast-join against the mapping table; for a bounded mapping the
  * replace chain is the faster plan (one pass per entry over in-register
  * strings, zero joins). Multi-codepoint sequences (skin tones, ZWJ
  * gender sequences, variation selectors, flag tags) are applied
  * longest-first so `OK_hand_light_skin_tone` wins over bare `OK_hand`
  * and `man_shrugging` over `person_shrugging`.
  */
object Demojize {

  /** Fitzpatrick skin-tone modifiers, U+1F3FB..U+1F3FF, in CLDR
    * suffix-name order. */
  private val tones: Seq[(String, String)] = Seq(
    "light_skin_tone" -> "🏻",
    "medium-light_skin_tone" -> "🏼",
    "medium_skin_tone" -> "🏽",
    "medium-dark_skin_tone" -> "🏾",
    "dark_skin_tone" -> "🏿")

  /** Bases whose toned form is base-char + tone-char (hands, gestures,
    * body parts). The bare base is itself fully qualified. */
  private val tonedBases: Seq[(String, String)] = Seq(
    "👍" -> "thumbs_up",
    "👎" -> "thumbs_down",
    "👌" -> "OK_hand",
    "🙏" -> "folded_hands",
    "👏" -> "clapping_hands",
    "🙌" -> "raising_hands",
    "👊" -> "oncoming_fist",
    "🤜" -> "right-facing_fist",
    "🤙" -> "call_me_hand",
    "👆" -> "backhand_index_pointing_up",
    "👇" -> "backhand_index_pointing_down",
    "👉" -> "backhand_index_pointing_right",
    "✊" -> "raised_fist",
    "💪" -> "flexed_biceps",
    "🤞" -> "crossed_fingers",
    "🤟" -> "love-you_gesture",
    "🤘" -> "sign_of_the_horns",
    "👋" -> "waving_hand",
    "🤲" -> "palms_up_together",
    "✋" -> "raised_hand",
    "👃" -> "nose",
    "🤦" -> "person_facepalming",
    "🤷" -> "person_shrugging")

  /** BMP bases whose fully-qualified bare form carries U+FE0F; the
    * variation selector is DROPPED when a tone modifier follows
    * (UTS #51 — a skin tone implies emoji presentation). */
  private val vsTonedBases: Seq[(String, String)] = Seq(
    "✌" -> "victory_hand", // ✌️
    "☝" -> "index_pointing_up", // ☝️
    "🖐" -> "hand_with_fingers_splayed") // 🖐️

  private val Vs16 = "️" // VARIATION SELECTOR-16 (emoji presentation)
  private val MaleTail = "‍♂️" // ZWJ + MALE SIGN + VS16
  private val FemaleTail = "‍♀️" // ZWJ + FEMALE SIGN + VS16
  private val HealthTail = "‍⚕️" // ZWJ + STAFF OF AESCULAPIUS + VS16

  /** ZWJ gender/profession sequences: tone inserted after the person
    * base, before the ZWJ tail. */
  private val zwjBases: Seq[(String, String, String)] = Seq(
    ("🤷", MaleTail, "man_shrugging"),
    ("🤷", FemaleTail, "woman_shrugging"),
    ("🤦", MaleTail, "man_facepalming"),
    ("🤦", FemaleTail, "woman_facepalming"),
    ("💁", MaleTail, "man_tipping_hand"),
    ("🙇", MaleTail, "man_bowing"),
    ("👮", MaleTail, "man_police_officer"),
    ("🧙", MaleTail, "man_mage"),
    ("🚣", FemaleTail, "woman_rowing_boat"),
    ("👩", HealthTail, "woman_health_worker")) // 👩‍⚕️

  /** England / Scotland: U+1F3F4 black flag + TAG letters + CANCEL TAG. */
  private def tagFlag(code: String): String =
    "🏴" + (code + "").map { ch =>
      val cp = 0xE0000 + ch.toInt
      new String(Character.toChars(cp))
    }.mkString

  /** Every golden-corpus name that is not a toned/ZWJ variant (those
    * are generated below). (emoji, python-emoji name). */
  private val plain: Seq[(String, String)] = Seq(
    // faces — joy/smiles
    "😂" -> "face_with_tears_of_joy",
    "🤣" -> "rolling_on_the_floor_laughing",
    "😀" -> "grinning_face",
    "😃" -> "grinning_face_with_big_eyes",
    "😄" -> "grinning_face_with_smiling_eyes",
    "😁" -> "beaming_face_with_smiling_eyes",
    "😆" -> "grinning_squinting_face",
    "😅" -> "grinning_face_with_sweat",
    "😊" -> "smiling_face_with_smiling_eyes",
    "☺️" -> "smiling_face",
    "🙂" -> "slightly_smiling_face",
    "🙃" -> "upside-down_face",
    "😇" -> "smiling_face_with_halo",
    "😉" -> "winking_face",
    "😍" -> "smiling_face_with_heart-eyes",
    "🥰" -> "smiling_face_with_hearts",
    "😘" -> "face_blowing_a_kiss",
    "😎" -> "smiling_face_with_sunglasses",
    "🤩" -> "star-struck",
    "🥳" -> "partying_face",
    "😹" -> "cat_with_tears_of_joy",
    "😻" -> "smiling_cat_with_heart-eyes",
    // faces — neutral/skeptical
    "🤔" -> "thinking_face",
    "🤨" -> "face_with_raised_eyebrow",
    "😐" -> "neutral_face",
    "😑" -> "expressionless_face",
    "😏" -> "smirking_face",
    "😒" -> "unamused_face",
    "🙄" -> "face_with_rolling_eyes",
    "😬" -> "grimacing_face",
    "🤐" -> "zipper-mouth_face",
    "🧐" -> "face_with_monocle",
    "🤓" -> "nerd_face",
    "🤫" -> "shushing_face",
    "🤭" -> "face_with_hand_over_mouth",
    "🤗" -> "hugging_face",
    "🤝" -> "handshake",
    // faces — tongue/zany
    "😛" -> "face_with_tongue",
    "😜" -> "winking_face_with_tongue",
    "😝" -> "squinting_face_with_tongue",
    "🤪" -> "zany_face",
    "🤑" -> "money-mouth_face",
    "🤤" -> "drooling_face",
    // faces — negative
    "😔" -> "pensive_face",
    "😪" -> "sleepy_face",
    "😴" -> "sleeping_face",
    "😷" -> "face_with_medical_mask",
    "🤧" -> "sneezing_face",
    "🤢" -> "nauseated_face",
    "🤮" -> "face_vomiting",
    "🥵" -> "hot_face",
    "🥶" -> "cold_face",
    "🥴" -> "woozy_face",
    "😵" -> "knocked-out_face",
    "🤯" -> "exploding_head",
    "😕" -> "confused_face",
    "😟" -> "worried_face",
    "☹️" -> "frowning_face",
    "🙁" -> "slightly_frowning_face",
    "😮" -> "face_with_open_mouth",
    "😲" -> "astonished_face",
    "😳" -> "flushed_face",
    "🥺" -> "pleading_face",
    "😧" -> "anguished_face",
    "😨" -> "fearful_face",
    "😰" -> "anxious_face_with_sweat",
    "😥" -> "sad_but_relieved_face",
    "😢" -> "crying_face",
    "😭" -> "loudly_crying_face",
    "😱" -> "face_screaming_in_fear",
    "😖" -> "confounded_face",
    "😣" -> "persevering_face",
    "😓" -> "downcast_face_with_sweat",
    "😩" -> "weary_face",
    "😫" -> "tired_face",
    "😤" -> "face_with_steam_from_nose",
    "😡" -> "pouting_face",
    "😠" -> "angry_face",
    "🤬" -> "face_with_symbols_on_mouth",
    "🥲" -> "smiling_face_with_tear",
    "🤥" -> "lying_face",
    // monkeys / creatures / animals
    "🙈" -> "see-no-evil_monkey",
    "🐐" -> "goat",
    "🦈" -> "shark",
    "🐱" -> "cat_face",
    "👾" -> "alien_monster",
    "💀" -> "skull",
    "💩" -> "pile_of_poo",
    // hearts
    "❤️" -> "red_heart",
    "🧡" -> "orange_heart",
    "💚" -> "green_heart",
    "💙" -> "blue_heart",
    "🖤" -> "black_heart",
    "💋" -> "kiss_mark",
    "💘" -> "heart_with_arrow",
    "💝" -> "heart_with_ribbon",
    "💖" -> "sparkling_heart",
    "💞" -> "revolving_hearts",
    "💕" -> "two_hearts",
    "♥️" -> "heart_suit",
    // body parts (untoned)
    "👀" -> "eyes",
    "👅" -> "tongue",
    "🗣️" -> "speaking_head",
    "👨" -> "man",
    "🤴" -> "prince",
    "🕵️" -> "detective",
    "🎅" -> "Santa_Claus",
    "🤶" -> "Mrs._Claus",
    // symbols / marks
    "💯" -> "hundred_points",
    "💥" -> "collision",
    "💫" -> "dizzy",
    "💦" -> "sweat_droplets",
    "💧" -> "droplet",
    "✨" -> "sparkles",
    "⭐" -> "star",
    "🌟" -> "glowing_star",
    "❗" -> "red_exclamation_mark",
    "‼️" -> "double_exclamation_mark",
    "⁉️" -> "exclamation_question_mark",
    "❄️" -> "snowflake",
    "☔" -> "umbrella_with_rain_drops",
    "🌪️" -> "tornado",
    "☀️" -> "sun",
    "⚡" -> "high_voltage",
    "🔥" -> "fire",
    "✅" -> "check_mark_button",
    "✔️" -> "check_mark",
    "➖" -> "minus",
    "🚫" -> "prohibited",
    "🔝" -> "TOP_arrow",
    "⬆️" -> "up_arrow",
    "™️" -> "trade_mark",
    "🔸" -> "small_orange_diamond",
    "✈️" -> "airplane",
    "🔓" -> "unlocked",
    "💭" -> "thought_balloon",
    // objects / activities
    "🎉" -> "party_popper",
    "🎈" -> "balloon",
    "🎁" -> "wrapped_gift",
    "🎄" -> "Christmas_tree",
    "🏆" -> "trophy",
    "🥇" -> "1st_place_medal",
    "🚀" -> "rocket",
    "💣" -> "bomb",
    "🚨" -> "police_car_light",
    "💰" -> "money_bag",
    "💸" -> "money_with_wings",
    "💷" -> "pound_banknote",
    "📈" -> "chart_increasing",
    "🔌" -> "electric_plug",
    "👟" -> "running_shoe",
    "🕶️" -> "sunglasses",
    "🧢" -> "billed_cap",
    "🧥" -> "coat",
    "🍻" -> "clinking_beer_mugs",
    "🥂" -> "clinking_glasses",
    "🍼" -> "baby_bottle",
    "🌹" -> "rose",
    "💐" -> "bouquet",
    "🍀" -> "four_leaf_clover",
    "🍃" -> "leaf_fluttering_in_wind",
    // tail of the golden corpus (count-1 tokens with unambiguous
    // CLDR/emoji-lib code points)
    "😈" -> "smiling_face_with_horns",
    "😋" -> "face_savoring_food",
    "😚" -> "kissing_face_with_closed_eyes",
    "😙" -> "kissing_face_with_smiling_eyes",
    "😞" -> "disappointed_face",
    "😯" -> "hushed_face",
    "😶" -> "face_without_mouth",
    "🤕" -> "face_with_head-bandage",
    "🤒" -> "face_with_thermometer",
    "🥱" -> "yawning_face",
    "👻" -> "ghost",
    "👹" -> "ogre",
    "👺" -> "goblin",
    "👑" -> "crown",
    "🎩" -> "top_hat",
    "👕" -> "t-shirt",
    "👖" -> "jeans",
    "👚" -> "womans_clothes",
    "🧤" -> "gloves",
    "🥽" -> "goggles",
    "🧵" -> "thread",
    "💎" -> "gem_stone",
    "💡" -> "light_bulb",
    "💢" -> "anger_symbol",
    "🔒" -> "locked",
    "🔪" -> "kitchen_knife",
    "🔫" -> "water_pistol",
    "📱" -> "mobile_phone",
    "📌" -> "pushpin",
    "📹" -> "video_camera",
    "🎥" -> "movie_camera",
    "🎤" -> "microphone",
    "🎵" -> "musical_note",
    "🎶" -> "musical_notes",
    "🎭" -> "performing_arts",
    "🎀" -> "ribbon",
    "🎊" -> "confetti_ball",
    "🎆" -> "fireworks",
    "🎇" -> "sparkler",
    "🎣" -> "fishing_pole",
    "🎿" -> "skis",
    "🏁" -> "chequered_flag",
    "🏊" -> "person_swimming",
    "⏰" -> "alarm_clock",
    "☕" -> "hot_beverage",
    "⛽" -> "fuel_pump",
    "🛑" -> "stop_sign",
    "⛄" -> "snowman_without_snow",
    "🌊" -> "water_wave",
    "🌎" -> "globe_showing_Americas",
    "🌐" -> "globe_with_meridians",
    "🌧️" -> "cloud_with_rain",
    "⛈️" -> "cloud_with_lightning_and_rain",
    "☄️" -> "comet",
    "🌲" -> "evergreen_tree",
    "🍁" -> "maple_leaf",
    "🐓" -> "rooster",
    "🐔" -> "chicken",
    "🐑" -> "ewe",
    "🐸" -> "frog",
    "🐈" -> "cat",
    "🐕" -> "dog",
    "🦊" -> "fox",
    "🙉" -> "hear-no-evil_monkey",
    "🍩" -> "doughnut",
    "🍕" -> "pizza",
    "🥜" -> "peanuts",
    "🧂" -> "salt",
    "📿" -> "prayer_beads",
    "🗑️" -> "wastebasket",
    "🛍️" -> "shopping_bags",
    "🏬" -> "department_store",
    "🏫" -> "school",
    "🏝️" -> "desert_island",
    "⚒️" -> "hammer_and_pick",
    "⚜️" -> "fleur-de-lis",
    "✝️" -> "latin_cross",
    "❣️" -> "heart_exclamation",
    "💗" -> "growing_heart",
    "💓" -> "beating_heart",
    "💛" -> "yellow_heart",
    "💜" -> "purple_heart",
    "❕" -> "white_exclamation_mark",
    "ℹ️" -> "information",
    "®️" -> "registered",
    "➡️" -> "right_arrow",
    "🔺" -> "red_triangle_pointed_up",
    "🔻" -> "red_triangle_pointed_down",
    "🔎" -> "magnifying_glass_tilted_right",
    // flags
    "🇷🇺" -> "Russia",
    "🇮🇹" -> "Italy",
    "🇬🇧" -> "United_Kingdom",
    "🇮🇩" -> "Indonesia",
    "🇨🇦" -> "Canada",
    "🇵🇹" -> "Portugal",
    "🇳🇴" -> "Norway",
    "🇩🇪" -> "Germany",
    "🇹🇷" -> "Turkey",
    "🇨🇳" -> "China",
    "🇳🇱" -> "Netherlands",
    "🇳🇿" -> "New_Zealand",
    "🇮🇪" -> "Ireland",
    "🇧🇷" -> "Brazil",
    "🇧🇦" -> "Bosnia_&_Herzegovina",
    tagFlag("gbsct") -> "Scotland",
    tagFlag("gbeng") -> "England")

  /** (emoji, python-emoji-library name). Plain entries plus the
    * generated bare + toned forms of every toned base. Shared verbatim
    * with the DuckDB oracle via [[demojizeSqlBatches]]. */
  val mapping: Seq[(String, String)] = {
    val tonedSimple = tonedBases.flatMap { case (b, n) =>
      (b -> n) +: tones.map { case (tn, tc) => (b + tc) -> s"${n}_$tn" }
    }
    val tonedVs = vsTonedBases.flatMap { case (b, n) =>
      ((b + Vs16) -> n) +: tones.map { case (tn, tc) => (b + tc) -> s"${n}_$tn" }
    }
    val tonedZwj = zwjBases.flatMap { case (b, tail, n) =>
      ((b + tail) -> n) +: tones.map { case (tn, tc) => (b + tc + tail) -> s"${n}_$tn" }
    }
    val all = plain ++ tonedSimple ++ tonedVs ++ tonedZwj
    require(all.map(_._1).distinct.size == all.size, "duplicate emoji in Demojize.mapping")
    require(all.map(_._2).distinct.size == all.size, "duplicate name in Demojize.mapping")
    all
  }

  /** Longest emoji first (UTF-16 length, then lexicographic for
    * determinism) so modifier/ZWJ sequences are consumed before their
    * base. */
  private val ordered: Seq[(String, String)] =
    mapping.sortBy { case (em, _) => (-em.length, em) }

  /** The full table in replacement order as UTF8String pairs, applied
    * by [[applyAll]] from both interpreted eval and generated code. */
  private lazy val orderedUtf8: Array[(UTF8String, UTF8String)] =
    ordered.map { case (em, name) =>
      (UTF8String.fromString(em), UTF8String.fromString(s"#*$name#*"))
    }.toArray

  /** Hash of one 3-byte window into [[BitmapBits]] bits — the screen
    * key. Every pattern is ≥3 UTF-8 bytes (shortest: a lone 3-byte BMP
    * symbol like ⭐; 2-byte code points appear only with a VS16 tail),
    * enforced below. */
  private def windowHash(b0: Byte, b1: Byte, b2: Byte): Int =
    ((((b0 & 0xff) << 16) | ((b1 & 0xff) << 8) | (b2 & 0xff))
      * 0x9E3779B1) >>> (32 - BitmapLog2)

  private final val BitmapLog2 = 14 // 16384 bits = 256 longs = 2 KB
  private lazy val patternHashes: Array[Int] = orderedUtf8.map { case (em, _) =>
    require(em.numBytes >= 3, s"pattern under 3 bytes breaks the screen: $em")
    windowHash(em.getByte(0), em.getByte(1), em.getByte(2))
  }

  /** One sequential pass over the table — identical semantics to the
    * nested-`replace` fold the oracle uses, but as a flat loop: a
    * ~300-entry fold of Column `replace` calls overflows the
    * ColumnNode-to-Expression converter's stack, and a single
    * expression node keeps the plan (and whole-stage codegen) small.
    *
    * The naive loop pays ~470 full-string `replace` scans per row no
    * matter how few emoji the row holds; at sf0.1 that made demojize
    * one of the slowest queries in the suite. One screening pass fixes
    * it: hash every 3-byte window of the INPUT that starts with a
    * high (non-ASCII) byte into a 16 K-bit stack bitmap, then run a
    * table entry's `replace` only when its pattern's first window is
    * present (a ~3% false-positive just costs one scan; a pure-ASCII
    * row skips the table entirely). Screening against the ORIGINAL
    * string stays sound across the whole fold: every pattern byte is
    * non-ASCII and every replacement ("#*name#*") is non-empty pure
    * ASCII, so a replacement can only SPLIT high-byte runs, never
    * create or join them — any pattern occurrence in the partially
    * folded string is byte-contiguous in the original, so its windows
    * are in the bitmap. The fold ORDER over surviving entries is
    * unchanged, which is what keeps the oracle equivalence exact
    * (skipped entries are provable no-op `replace`s). */
  def applyAll(s: UTF8String): UTF8String = {
    val n = s.numBytes
    if (n < 3) return s
    val bits = new Array[Long](1 << (BitmapLog2 - 6))
    var any = false
    var i = 0
    while (i + 2 < n) {
      if (s.getByte(i) < 0) { // UTF-8 lead/continuation byte — candidate
        val h = windowHash(s.getByte(i), s.getByte(i + 1), s.getByte(i + 2))
        bits(h >>> 6) |= 1L << (h & 63)
        any = true
      }
      i += 1
    }
    if (!any) return s
    var cur = s
    var j = 0
    while (j < orderedUtf8.length) {
      val h = patternHashes(j)
      if (orderedUtf8(j)._1.numBytes <= n &&
          (bits(h >>> 6) & (1L << (h & 63))) != 0)
        cur = cur.replace(orderedUtf8(j)._1, orderedUtf8(j)._2)
      j += 1
    }
    cur
  }

  /** The Spark side: one native codegen Expression over the table,
    * resolved through the `demojize` function binding (installed by
    * [[graft.GraftExtensions]] or [[register]]). */
  def demojize(c: Column): Column = call_function("demojize", c)

  /** Register as a SQL function for ad-hoc sessions that don't load
    * `graft.GraftExtensions`. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "demojize")(exprs => DemojizeExpr(exprs.head))

  /** The DuckDB mirror — same entries, same order, same delimiters —
    * split into batches of `batchSize` nested `replace` calls: DuckDB's
    * binder caps expression depth at 128, so the ~350-entry chain must
    * be layered across CTE steps (one batch per step, applied to the
    * running column `col`). Sequential application order is identical
    * to [[applyAll]]'s. */
  def demojizeSqlBatches(col: String, batchSize: Int = 80): Seq[String] =
    ordered.grouped(batchSize).map { batch =>
      batch.foldLeft(col) { case (acc, (em, name)) =>
        s"replace($acc, '$em', '#*$name#*')"
      }
    }.toSeq
}

/** `demojize(str)` as a native unary Expression: a flat sequential
  * sweep of the whole [[Demojize.mapping]] table inside whole-stage
  * codegen — one plan node regardless of table size, no UDF boxing. */
case class DemojizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "demojize"

  override protected def nullSafeEval(input: Any): Any =
    Demojize.applyAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Demojize.applyAll($c)")

  override protected def withNewChildInternal(newChild: Expression): DemojizeExpr =
    copy(child = newChild)
}
