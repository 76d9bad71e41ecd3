package graft.locale

/** Locale bundles for string generation.
  *
  * The reference engine ships en/ru corpora (letters, first/last names, words,
  * phone patterns) behind a `LocalModule` interface
  * (sdvg `internal/generator/usecase/general/locale/interfaces.go:4-23`,
  * charsets `locale/consts.go:5-8`). We reproduce the *interface contract*
  * (small/large letters, gendered name lists filtered by length, phone
  * patterns, word lists with one-letter words, bytes-per-char) with our own
  * corpora — the reference's tests assert only length bounds, determinism and
  * set-membership, never specific strings, so corpus content is free to
  * differ.
  *
  * Corpus size: the reference ships thousands of entries per list (its
  * `locale/en/strings.yml` / `ru/strings.yml` raw corpora). To give generated
  * columns a comparable VALUE DOMAIN without copying those files, each
  * curated core list below is deterministically expanded through the
  * morphology its domain really has — English surnames are root+suffix
  * compounds (Ash+ley, Black+wood), Russian surnames take gendered suffix
  * pairs (-ов/-ова, -ский/-ская), English content words inflect (-s, -ed,
  * -ing, -er) — yielding name-shaped, locale-valid strings. The lists are
  * own-authored + rule-expanded, NOT reference content.
  *
  * All data is immutable and executor-local (referenced from generated code /
  * UDF closures); tens of KB per JVM, no broadcast needed.
  */
final case class LocaleBundle(
    name: String,
    smallLetters: Array[Char],
    largeLetters: Array[Char],
    firstNamesAll: Array[String], // any-gender, sorted
    lastNamesAll: Array[String],
    phonePatterns: Array[String],
    words: Array[String], // sorted lexicographically (text generator iterates in order)
    bytesPerChar: Int) {

  def firstNames(min: Int, max: Int): Array[String] =
    firstNamesAll.filter(n => n.length >= min && n.length <= max)
  def lastNames(min: Int, max: Int): Array[String] =
    lastNamesAll.filter(n => n.length >= min && n.length <= max)
  def phonePatternsIn(min: Int, max: Int): Array[String] =
    phonePatterns.filter(p => p.length >= min && p.length <= max)
  /** Cached: `text()` reads this once per generated VALUE — as a plain def
    * the O(words) filter was 90%+ of gen_text's cost once the corpus grew
    * to 12k words (the round-10 8.4x throughput collapse). */
  @transient lazy val oneLetterWords: Array[String] = words.filter(_.length == 1)
}

object Locales {

  /** Shared digit / special-char sets (reference `locale/consts.go:5-8`). */
  val Numbers: Array[Char] = "0123456789".toCharArray
  val SpecialChars: Array[Char] = "!#$%&()*+,-.:;<=>?@_{|}".toCharArray
  val WordsDelimiter = " "

  private def sorted(xs: Seq[String]): Array[String] = xs.distinct.sorted.toArray

  // ---------------------------------------------------------- en expansion

  /** English given-name morphology: onset stems × traditional endings,
    * filtered to name-shaped lengths. Cores like Mar+ia/Mar+lene or
    * Ed+win/Ed+mund are real formations; the product inevitably contains
    * some names nobody bears — acceptable for synthetic data, the contract
    * is a large, deterministic, name-shaped value domain. */
  private val enFemaleStems = Array(
    "Ad", "Al", "Am", "An", "Ar", "Bel", "Bern", "Cal", "Car", "Cat", "Cel",
    "Clar", "Cor", "Dan", "Dar", "Del", "Dor", "El", "Em", "Er", "Est", "Ev",
    "Fel", "Fern", "Gabri", "Gen", "Georg", "Ger", "Hel", "Id", "Is", "Jan",
    "Jul", "Kar", "Kat", "Lar", "Laur", "Len", "Lil", "Lor", "Luc", "Mad",
    "Magd", "Mar", "Marg", "Maril", "Mel", "Mir", "Nat", "Nel", "Nor", "Ol",
    "Pam", "Pat", "Paul", "Phil", "Reb", "Ros", "Sab", "Sam", "Ser", "Sus",
    "Tal", "Ter", "Theod", "Val", "Ver", "Vict", "Viv", "Wilhelm", "Yol", "Zar")
  private val enFemaleEnds = Array(
    "a", "ia", "ina", "ine", "issa", "ella", "ette", "elle", "een", "ene",
    "ara", "ora", "ilda", "anna", "enna", "etta", "inda", "is", "ita", "lene")
  private val enMaleStems = Array(
    "Ald", "Alv", "And", "Ans", "Arn", "Bald", "Bart", "Benn", "Bert", "Carl",
    "Ced", "Clar", "Clem", "Conr", "Dav", "Don", "Ed", "Eld", "Elm", "Ern",
    "Ferd", "Fred", "Gar", "Ger", "Gil", "God", "Hal", "Har", "Herb", "Hub",
    "Hug", "Jar", "Jer", "Kend", "Lam", "Land", "Leon", "Lor", "Mal", "Marv",
    "Mel", "Merv", "Nath", "Norm", "Orv", "Osw", "Ray", "Reg", "Rich", "Rob",
    "Rod", "Rol", "Ron", "Roll", "Sher", "Stan", "Ted", "Theo", "Vern", "Vict",
    "Wald", "Walt", "War", "Wend", "Wil", "Win", "Wood", "Zach")
  private val enMaleEnds = Array(
    "an", "en", "in", "on", "ard", "ald", "bert", "fred", "mond", "mund",
    "ton", "win", "ric", "ley", "don", "ford", "ell", "is", "us", "er")
  private def enNameExpansion: Seq[String] =
    ((for (s <- enFemaleStems; e <- enFemaleEnds) yield s + e) ++
      (for (s <- enMaleStems; e <- enMaleEnds) yield s + e))
      .filter(n => n.length >= 3 && n.length <= 12).toSeq

  /** English surname morphology: topographic/occupational roots × the
    * suffixes that actually built English surnames (Ash→Ashley, Whit→Whitfield). */
  private val enSurnameRoots = Array(
    "Ash", "Att", "Bex", "Black", "Brad", "Brent", "Brook", "Burn", "Carl",
    "Clay", "Cliff", "Cole", "Crane", "Dale", "Day", "East", "Elm", "Fair",
    "Farn", "Fern", "Field", "Ford", "Fox", "Gold", "Grant", "Gray", "Green",
    "Grove", "Hale", "Hart", "Hawk", "Hay", "Hazel", "Heath", "Hill", "Holt",
    "Horn", "Hunt", "Kirk", "Lake", "Lane", "Leaf", "Lock", "Long", "Marsh",
    "May", "Mead", "Mill", "Moor", "Moss", "New", "North", "Nor", "Oak",
    "Park", "Pember", "Pine", "Rad", "Rain", "Ravens", "Red", "Reed", "Ridge",
    "River", "Rock", "Rose", "Rush", "Ruther", "Sand", "Shaw", "Sher", "Short",
    "Silver", "Snow", "South", "Spring", "Stan", "Stone", "Summer", "Sutter",
    "Swift", "Thorn", "Under", "Vale", "Wake", "Ward", "Water", "Weather",
    "Well", "West", "Whit", "Wick", "Wild", "Win", "Winter", "Wolf", "Wood",
    "Wool", "Wort", "York")
  private val enSurnameEnds = Array(
    "s", "er", "ers", "man", "ley", "ton", "field", "wood", "ford", "worth",
    "bury", "well", "stone", "brook", "gate", "shaw", "croft", "by", "ham", "wick")
  private def enSurnameExpansion: Seq[String] =
    (for (r <- enSurnameRoots; e <- enSurnameEnds) yield r + e)
      .filter(n => n.length >= 4 && n.length <= 14)

  /** Regular inflections over the content-word subset: plural/verbal forms
    * are real English words, which multiplies the text generator's
    * vocabulary without inventing strings. */
  private def enInflections(base: Seq[String]): Seq[String] = {
    val vowels = "aeiou"
    val content = base.filter(w => w.length >= 3 && !w.endsWith("s"))
    val plurals = content.map { w =>
      if (w.endsWith("y") && !vowels.contains(w(w.length - 2))) w.dropRight(1) + "ies"
      else w + "s"
    }
    // verbal forms only for words long enough that the naive rule can't
    // produce mangled short forms (cut -> cuting); -e drops before -ing
    val verbal = content.filter(_.length >= 4)
    val ing = verbal.map(w => if (w.endsWith("e")) w.dropRight(1) + "ing" else w + "ing")
    val ed = verbal.collect {
      case w if w.endsWith("e") => w + "d"
      case w if !w.endsWith("y") && !w.endsWith("w") => w + "ed"
    }
    val er = verbal.collect { case w if !w.endsWith("e") && !w.endsWith("y") => w + "er" }
    // round-10 session-2 widening: productive DERIVATIONAL suffixes (-ly,
    // -ness, -ful/-less) on the same content base. Like -er above, the
    // rules over-generate relative to a dictionary ("bookly") — accepted:
    // the text generator's contract is a LARGE, plausible, deterministic
    // token domain (the reference ships ~10k words), not lexicographic
    // validity, and every form follows a real English formation rule.
    val ly = verbal.collect {
      case w if w.endsWith("y") && w.length >= 5 => w.dropRight(1) + "ily"
      case w if !w.endsWith("y") && !w.endsWith("ly") => w + "ly"
    }
    val ness = verbal.map(w =>
      if (w.endsWith("y")) w.dropRight(1) + "iness" else w + "ness")
    val fulLess = verbal.filter(w => !w.endsWith("l"))
      .flatMap(w => Seq(w + "ful", w + "less"))
    plurals ++ ing ++ ed ++ er ++ ly ++ ness ++ fulLess
  }

  // ---------------------------------------------------------- ru expansion

  /** Russian surname morphology: root × gendered suffix pair — the actual
    * formation rule of the overwhelming majority of Russian surnames. */
  private val ruSurnameRoots = Array(
    "Агафон", "Аким", "Аник", "Архип", "Афанас", "Богдан",
    "Бобр", "Бород", "Бык", "Вешняк", "Винокур", "Власт", "Волк", "Ворон",
    "Гаврил", "Глух", "Голов", "Горшк", "Гром", "Демид", "Добрын", "Дрозд",
    "Ерш", "Ефрем", "Жар", "Журавл", "Зим", "Злат", "Зубк", "Игнат", "Истом",
    "Калачн", "Капуст", "Кисел", "Ключн", "Ковал", "Кожевн", "Колесн",
    "Колокол", "Коршун", "Кочерг", "Кравц", "Крылат", "Кудр", "Кузнец",
    "Кукушк", "Лапт", "Ласточк", "Лебед", "Лис", "Лукьян", "Луч", "Мамонт",
    "Медвед", "Мельн", "Мешк", "Мороз", "Мух", "Найден", "Некрас",
    "Овчинн", "Одинц", "Окун", "Пастух", "Перепелк", "Пирог",
    "Плотн", "Полтор", "Прохор", "Пчелк", "Рыбак", "Рябин",
    "Сазон", "Самсон", "Сапожн", "Свирид", "Селезн", "Серг",
    "Скворц", "Сокол", "Солом", "Стрельц", "Сыч", "Терех", "Токар", "Третьяк",
    "Трофим", "Утк", "Фадд", "Филат", "Хомяк", "Цапл",
    "Чайк", "Шапошн", "Шепел", "Шишк", "Щегл", "Щук", "Ясен")
  /** Toponymic/clerical stems: the second big Russian surname family,
    * -ский/-ская. */
  private val ruSkiRoots = Array(
    "Белозер", "Бережан", "Богуслав", "Введен", "Вишнев", "Вознесен",
    "Волын", "Высоц", "Горян", "Дубров", "Заречан", "Звенигород", "Зелен",
    "Иллар", "Каменев", "Краснояр", "Крутояр", "Левитан",
    "Лугов", "Майор", "Малинов", "Можай", "Нагор", "Невер", "Озер",
    "Остров", "Покров", "Полян", "Преображен", "Рождествен", "Садов",
    "Светлогор", "Соснов", "Троиц", "Успен", "Холм", "Черномор", "Шуй",
    "Юрьев", "Ясногор")
  private def ruSurnameExpansion: Seq[String] = {
    val ovIn = ruSurnameRoots.toSeq.flatMap { r =>
      // gendered suffix pairs: soft/iotated stems take -ев/-ева, hard -ов/-ова;
      // every root also forms the -ин/-ина pair
      val (m, f) = if ("ьйеёиюя".contains(r.last)) ("ев", "ева") else ("ов", "ова")
      val stem = r.stripSuffix("ь")
      Seq(stem + m, stem + f, stem + "ин", stem + "ина")
    }
    val ski = ruSkiRoots.toSeq.flatMap(r => Seq(r + "ский", r + "ская"))
    ovIn ++ ski
  }

  /** Feminine forms of a masculine -ов/-ев/-ин surname list (+а); -ий → -ая. */
  private def ruFeminine(masc: Seq[String]): Seq[String] = masc.collect {
    case s if s.endsWith("ов") || s.endsWith("ев") || s.endsWith("ин") => s + "а"
    case s if s.endsWith("ий") => s.dropRight(2) + "ая"
  }

  // ------------------------------------------------- ru expansion, round 8
  // The reference ru corpus is 1673/14651/9978 first/last/words
  // (sdvg `internal/generator/usecase/general/locale/ru/strings.yml`). To
  // reach a comparable value domain WITHOUT copying it, round 8 widens the
  // morphology: every productive Russian surname paradigm (-ов/-ова,
  // -ев/-ева, -ин/-ина, diminutive-interfix -ков/-кин, toponymic
  // -овский/-евский, ungendered -енко/-ук/-юк/-чук, northern -ых/-их) is
  // applied over stems drawn from our own curated roots, noun vocabulary and
  // given names. Every rule below is a real formation rule of the language;
  // the product is deterministic, deduped and sorted.

  private val ruVowels = "аеёиоуыэюяАЕЁИОУЫЭЮЯ"

  /** Strip trailing vowels / soft sign / й down to the consonant stem. */
  private def ruStem(w: String): String = {
    var s = w
    while (s.nonEmpty && (ruVowels.indexOf(s.last) >= 0 || s.last == 'ь' || s.last == 'й'))
      s = s.dropRight(1)
    s
  }

  private val ruHushers = "чшщжц"

  /** The four gendered base forms of one stem: -ов/-ова (hard) or -ев/-ева
    * (husher/soft), plus the -ин/-ина pair every stem also takes. */
  private def ruGendered(stem: String): Seq[String] = {
    val (m, f) = if (ruHushers.indexOf(stem.last) >= 0) ("ев", "ева") else ("ов", "ова")
    val in = if (stem.endsWith("ин")) Nil else Seq(stem + "ин", stem + "ина")
    Seq(stem + m, stem + f) ++ in
  }

  /** Diminutive-interfix forms (Саша → Сашков/Сашкин): stem + к + gendered.
    * Velars/hushers don't take the interfix (Волк → *Волкков). */
  private def ruDiminutiveGendered(stem: String): Seq[String] =
    if ("кгхчшщц".indexOf(stem.last) >= 0) Nil
    else Seq(stem + "ков", stem + "кова", stem + "кин", stem + "кина")

  /** Ungendered paradigms: -енко (Иваненко), -ук/-юк (Ковалюк, Петрук),
    * -чук (Иванчук). */
  private def ruUngendered(stem: String): Seq[String] = {
    val enko = if ("кгх".indexOf(stem.last) >= 0) Nil else Seq(stem + "енко")
    val uk = if (stem.last == 'л' || stem.last == 'н') stem + "юк" else stem + "ук"
    val chuk = if (ruHushers.indexOf(stem.last) >= 0) Nil else Seq(stem + "чук")
    enko ++ Seq(uk) ++ chuk
  }

  /** Toponymic/possessive -овский/-евский pairs (Морозовский). */
  private def ruOvsky(stem: String): Seq[String] = {
    val o = if (ruHushers.indexOf(stem.last) >= 0) "ев" else "ов"
    Seq(stem + o + "ский", stem + o + "ская")
  }

  /** Additional own-authored surname roots (trades, animals, nature,
    * objects, pre-Christian and church given names) beyond the r7 list. */
  private val ruMoreRoots = Array(
    "Алмаз", "Анис", "Бажен", "Балаш", "Барс", "Бел", "Берез", "Беркут",
    "Блин", "Бобыл", "Богат", "Бойк", "Бор", "Борц", "Бочар", "Браг",
    "Буян", "Вавил", "Варлам", "Вдов", "Верб", "Верест", "Ветр", "Вихр",
    "Возн", "Волод", "Воропа", "Галк", "Глад", "Гнезд", "Голуб",
    "Гончар", "Горох", "Груш", "Гуляй", "Дан", "Девят", "Дег",
    "Дол", "Дуб", "Дьяк", "Елис", "Ерем", "Ермак", "Ермол", "Ждан",
    "Желез", "Жемчуж", "Жереб", "Забав", "Завьял", "Зыр", "Калин",
    "Карас", "Карп", "Кашир", "Клим", "Ковр", "Козыр", "Колос", "Кондрат",
    "Копыл", "Кос", "Костром", "Кот", "Кочет", "Кругл",
    "Крут", "Кулик", "Кур", "Лавр", "Лад", "Ларион", "Лыс", "Любим",
    "Макс", "Мал", "Мамай", "Марк", "Мастер", "Мещер", "Мин", "Мирон",
    "Молчан", "Мурав", "Мурз", "Нагиб", "Нежд", "Неклюд", "Нечай", "Нос",
    "Овсян", "Огар", "Ожег", "Опар", "Ореш", "Осташ", "Павлуш",
    "Палаш", "Панкрат", "Пантеле", "Пар", "Пахом", "Перв", "Перепел",
    "Петух", "Пешк", "Плах", "Плеш", "Подков", "Позд", "Полушк",
    "Пономар", "Потап", "Приход", "Пугач", "Пшениц", "Рак",
    "Распут", "Ремез", "Реш", "Рог", "Род", "Романц", "Рубц",
    "Руд", "Рудак", "Рыж", "Сабур", "Савв", "Салтык", "Сам",
    "Сафон", "Свищ", "Сед", "Секир", "Селиван", "Серебр",
    "Сидор", "Син", "Сит", "Скоморох", "Скор", "Смол", "Снегир", "Собол",
    "Солов", "Сотник", "Стар", "Сторож", "Стрел", "Строг", "Субб",
    "Сувор", "Суд", "Сурик", "Сухар", "Тарак", "Телег", "Тепл",
    "Терент", "Тетер", "Тимош", "Тит", "Тороп", "Треть", "Туз",
    "Тул", "Тур", "Угрим", "Улан", "Услад", "Ушак", "Фарафон", "Фатьян",
    "Фетис", "Фирс", "Фок", "Фот", "Харитон", "Хитр", "Хлебн",
    "Хмел", "Холод", "Хохл", "Храбр", "Хром", "Цар", "Целов",
    "Чап", "Чебот", "Чекмар", "Черед", "Черкас", "Черн", "Чесн", "Чет",
    "Чиж", "Чирк", "Чуд", "Чум", "Шалам", "Шатун", "Шевел", "Шемяк",
    "Шерем", "Шест", "Шил", "Шуб", "Шульг", "Щедр", "Щепк", "Юд",
    "Юрл", "Яков", "Ярц", "Яхонт")

  /** Adjective stems taking the ungendered northern -ых/-их paradigm
    * (Черных, Седых, Долгих). */
  private val ruYkhStems = Array(
    "Бел", "Больш", "Весел", "Гладк", "Глух", "Голодн", "Дик", "Долг",
    "Жёлт", "Красн", "Кругл", "Крут", "Лёгк", "Мал",
    "Мёрзл", "Молод", "Мудр", "Пьянк", "Ряб", "Сед", "Син",
    "Слаб", "Смел", "Стар", "Сух", "Тих", "Толст", "Худ",
    "Целик", "Черн", "Шир")

  private def ruYkh(stem: String): String =
    stem + (if ("кгх".indexOf(stem.last) >= 0) "их" else "ых")

  /** All round-8 surname families over one stem set. */
  private def ruExpandStems(stems: Seq[String]): Seq[String] =
    stems.flatMap(s => ruGendered(s) ++ ruDiminutiveGendered(s) ++ ruUngendered(s))

  /** Patronymic-style given-name forms (Петрович/Петровна) — recorded in
    * real name fields and name-shaped by construction. */
  private def ruPatronymics(mascNames: Seq[String]): Seq[String] =
    mascNames.flatMap { n =>
      val soft = n.last == 'й' || n.last == 'ь'
      val s = ruStem(n)
      if (s.length < 3) Nil
      else if (soft) Seq(s + "ьевич", s + "ьевна")
      else Seq(s + "ович", s + "овна")
    }

  /** Informal/diminutive given-name register (Сашка, Ирочка) — productive
    * suffixes over name stems. */
  private def ruNameDiminutives(names: Seq[String]): Seq[String] =
    names.flatMap { n =>
      val s = ruStem(n)
      if (s.length < 3 || s.length > 8) Nil
      else {
        val ka = if ("кгхчшщц".indexOf(s.last) >= 0) Nil else Seq(s + "ка")
        val ochka = if ("кгхчшщцжь".indexOf(s.last) >= 0) Nil else Seq(s + "очка")
        val usha = if ("шжч".indexOf(s.last) >= 0) Nil else Seq(s + "уша")
        ka ++ ochka ++ usha
      }
    }

  /** Regular noun inflections over the ru word list: plural (velar/husher
    * stems take -и, the rest -ы; о-nouns -а, soft stems -и), genitive
    * singular and instrumental singular — the three highest-frequency
    * oblique forms, each by the regular declension rule of its stem
    * class. */
  private def ruWordInflections(base: Seq[String]): Seq[String] = {
    val velarHusher = "кгхчшщж"
    val nouns = base.filter(_.length >= 3)
    val plural = nouns.map { w =>
      if (w.endsWith("а")) {
        val st = w.dropRight(1)
        st + (if (velarHusher.indexOf(st.last) >= 0) "и" else "ы")
      } else if (w.endsWith("я") || w.endsWith("ь") || w.endsWith("й"))
        w.dropRight(1) + "и"
      else if (w.endsWith("о")) w.dropRight(1) + "а"
      else if (w.endsWith("е")) {
        val st = w.dropRight(1)
        st + (if ("цчшщж".indexOf(st.last) >= 0) "а" else "я")
      }
      else w + (if (velarHusher.indexOf(w.last) >= 0) "и" else "ы")
    }
    val genitive = nouns.map { w =>
      if (w.endsWith("а")) {
        val st = w.dropRight(1)
        st + (if (velarHusher.indexOf(st.last) >= 0) "и" else "ы")
      } else if (w.endsWith("я")) w.dropRight(1) + "и"
      else if (w.endsWith("ь") || w.endsWith("й")) w.dropRight(1) + "я"
      else if (w.endsWith("о") || w.endsWith("е")) w.dropRight(1) + "а"
      else w + "а"
    }
    val instrumental = nouns.map { w =>
      if (w.endsWith("а")) {
        val st = w.dropRight(1)
        st + (if ("цчшщж".indexOf(st.last) >= 0) "ей" else "ой")
      } else if (w.endsWith("я")) w.dropRight(1) + "ей"
      else if (w.endsWith("ь") || w.endsWith("й")) w.dropRight(1) + "ем"
      else if (w.endsWith("о")) w.dropRight(1) + "ом"
      else if (w.endsWith("е")) w.dropRight(1) + "ем"
      else w + (if ("цчшщж".indexOf(w.last) >= 0) "ем" else "ом")
    }
    // round-10 widening: dative and prepositional singular (the remaining
    // high-frequency oblique cases) and the three plural oblique cases,
    // which are uniform -ам/-ами/-ах (hard) / -ям/-ями/-ях (soft) over the
    // plural stem — the most regular corner of the whole declension system
    val dative = nouns.collect {
      case w if w.endsWith("а") || w.endsWith("я") => w.dropRight(1) + "е"
      case w if w.endsWith("о") || w.endsWith("е") => w.dropRight(1) + "у"
      case w if !w.endsWith("ь") && !w.endsWith("й") => w + "у"
      // ь/й stems skipped: gender decides -ю vs -и there and the word list
      // carries no gender tags — no guessed non-forms
    }
    val prepositional = nouns.collect {
      case w if "аяое".indexOf(w.last) >= 0 => w.dropRight(1) + "е"
      case w if !w.endsWith("ь") && !w.endsWith("й") => w + "е"
    }
    val pluralOblique = nouns.zip(plural).flatMap { case (w, pl) =>
      val st = pl.dropRight(1)
      if (st.length < 2) Nil
      else {
        val soft = (w.endsWith("ь") && "чшщж".indexOf(st.last) < 0) ||
          w.endsWith("я") || w.endsWith("й") ||
          (w.endsWith("е") && "цчшщж".indexOf(st.last) < 0)
        val sfx = if (soft) Seq("ям", "ями", "ях") else Seq("ам", "ами", "ах")
        sfx.map(st + _)
      }
    }
    plural ++ genitive ++ instrumental ++ dative ++ prepositional ++ pluralOblique
  }

  val en: LocaleBundle = LocaleBundle(
    name = "en",
    smallLetters = ('a' to 'z').toArray,
    largeLetters = ('A' to 'Z').toArray,
    firstNamesAll = sorted(Seq(
      "Alice", "Amber", "Amelia", "Amy", "Anna", "Aria", "Ava", "Bella", "Beth", "Brooke",
      "Carol", "Chloe", "Clara", "Daisy", "Diana", "Elena", "Ella", "Emily", "Emma", "Erin",
      "Eva", "Faith", "Fiona", "Grace", "Hannah", "Hazel", "Holly", "Iris", "Ivy", "Jade",
      "Jane", "Julia", "Kate", "Laura", "Lily", "Lucy", "Luna", "Maria", "Mary", "Maya",
      "Mia", "Molly", "Nina", "Nora", "Olivia", "Paige", "Rose", "Ruby", "Sarah", "Sofia",
      "Stella", "Tara", "Violet", "Wendy", "Zoe",
      "Aaron", "Adam", "Aiden", "Alan", "Albert", "Alex", "Andrew", "Anthony", "Arthur", "Ben",
      "Blake", "Brian", "Caleb", "Carl", "Chase", "Chris", "Cole", "Daniel", "David", "Dean",
      "Derek", "Dylan", "Edward", "Eli", "Eric", "Ethan", "Evan", "Felix", "Frank", "Gavin",
      "George", "Henry", "Hugo", "Ian", "Isaac", "Jack", "Jacob", "James", "Jason", "John",
      "Jordan", "Joseph", "Kevin", "Kyle", "Leo", "Liam", "Logan", "Lucas", "Luke", "Mark",
      "Mason", "Max", "Miles", "Nathan", "Noah", "Oliver", "Oscar", "Owen", "Patrick", "Paul",
      "Peter", "Ryan", "Samuel", "Scott", "Sean", "Simon", "Thomas", "Tyler", "Victor", "Wade")
      ++ enNameExpansion),
    lastNamesAll = sorted(Seq(
      "Adams", "Allen", "Anderson", "Bailey", "Baker", "Barnes", "Bell", "Bennett", "Brooks", "Brown",
      "Bryant", "Butler", "Campbell", "Carter", "Clark", "Coleman", "Collins", "Cook", "Cooper", "Cox",
      "Davis", "Diaz", "Edwards", "Evans", "Fisher", "Foster", "Garcia", "Gibson", "Gonzalez", "Gray",
      "Green", "Griffin", "Hall", "Harris", "Hayes", "Henderson", "Hill", "Howard", "Hughes", "Jackson",
      "James", "Jenkins", "Johnson", "Jones", "Kelly", "King", "Lee", "Lewis", "Long", "Lopez",
      "Martin", "Martinez", "Miller", "Mitchell", "Moore", "Morgan", "Morris", "Murphy", "Nelson", "Parker",
      "Patterson", "Perez", "Perry", "Peterson", "Phillips", "Powell", "Price", "Reed", "Richardson", "Rivera",
      "Roberts", "Robinson", "Rogers", "Ross", "Russell", "Sanders", "Scott", "Simmons", "Smith", "Stewart",
      "Taylor", "Thomas", "Thompson", "Torres", "Turner", "Walker", "Ward", "Watson", "White", "Wilson",
      "Wood", "Wright", "Young")
      ++ enSurnameExpansion),
    phonePatterns = Array(
      "+1 (###) ###-####",
      "+1-###-###-####",
      "(###) ###-####",
      "###-###-####",
      "1-###-###-####",
      "+1 ###.###.####"),
    words = {
      val base = Seq(
      "a", "i",
      "air", "all", "and", "any", "arm", "art", "ask", "bad", "bag", "ball", "band", "bank",
      "base", "bear", "bed", "big", "bird", "blue", "boat", "body", "book", "born", "both",
      "box", "boy", "bread", "call", "car", "card", "care", "case", "cat", "city", "class",
      "clean", "clear", "cold", "come", "cook", "cool", "corn", "cost", "could", "cut", "dark",
      "day", "deep", "desk", "do", "dog", "door", "down", "draw", "dream", "drive", "dry",
      "each", "early", "earth", "east", "easy", "eat", "edge", "egg", "end", "even", "ever",
      "eye", "face", "fact", "fall", "far", "farm", "fast", "fear", "feel", "few", "field",
      "find", "fine", "fire", "first", "fish", "five", "flat", "floor", "fly", "food", "foot",
      "for", "form", "four", "free", "from", "full", "fun", "game", "gate", "get", "girl",
      "give", "glass", "go", "gold", "good", "gray", "great", "green", "group", "grow", "hair",
      "half", "hand", "hard", "have", "he", "head", "hear", "heart", "heavy", "help", "here",
      "high", "hill", "hold", "home", "hope", "horse", "hot", "hour", "house", "how", "ice",
      "idea", "if", "in", "iron", "it", "job", "join", "jump", "just", "keep", "key", "kind",
      "king", "know", "lake", "land", "large", "last", "late", "lead", "leaf", "learn", "left",
      "leg", "let", "life", "light", "like", "line", "list", "live", "long", "look", "loud",
      "love", "low", "main", "make", "man", "many", "map", "mark", "may", "mean", "meet",
      "mile", "milk", "mind", "miss", "moon", "more", "most", "move", "much", "music", "must",
      "name", "near", "need", "new", "next", "nice", "night", "nine", "no", "north", "note",
      "now", "of", "off", "old", "on", "once", "one", "only", "open", "or", "order", "other",
      "out", "over", "own", "page", "paper", "park", "part", "pass", "past", "path", "pay",
      "peace", "pick", "place", "plan", "plant", "play", "point", "pull", "push", "put",
      "rain", "reach", "read", "real", "red", "rest", "rich", "ride", "right", "ring", "rise",
      "river", "road", "rock", "roll", "roof", "room", "root", "rose", "round", "rule", "run",
      "safe", "said", "salt", "same", "sand", "say", "sea", "seat", "see", "seed", "self",
      "sell", "send", "set", "seven", "shape", "sharp", "she", "ship", "shop", "short", "show",
      "side", "sign", "sing", "sit", "six", "size", "sky", "sleep", "slow", "small", "smile",
      "snow", "so", "soft", "soil", "some", "song", "soon", "sound", "south", "space", "speak",
      "speed", "spell", "spend", "spot", "spring", "stand", "star", "start", "stay", "step",
      "still", "stone", "stop", "store", "story", "street", "strong", "sun", "sure", "table",
      "take", "talk", "tall", "team", "tell", "ten", "test", "than", "that", "the", "then",
      "there", "they", "thing", "think", "this", "three", "time", "to", "today", "told", "tone",
      "too", "took", "top", "town", "tree", "trip", "true", "try", "turn", "two", "under",
      "unit", "up", "use", "very", "view", "voice", "wait", "walk", "wall", "want", "warm",
      "watch", "water", "wave", "way", "we", "wear", "week", "well", "west", "what", "wheel",
      "when", "where", "white", "who", "why", "wide", "wild", "will", "wind", "window", "wing",
      "winter", "wish", "with", "wood", "word", "work", "world", "write", "yard", "year", "yes",
      "yet", "you", "young")
      sorted(base ++ enWordsMore ++ enInflections(base ++ enWordsMore))
    },
    bytesPerChar = 1
  )

  /** Round-10 vocabulary widening toward the reference's ~10k-word text
    * domain: more common English vocabulary (own-authored, 3–9 letters,
    * everyday register) feeding the same regular-inflection expansion. */
  private lazy val enWordsMore: Seq[String] = Seq(
    "about", "above", "accept", "account", "across", "act", "action", "active", "actor", "add",
    "admit", "adult", "advice", "affect", "afraid", "after", "again", "against", "age", "agent",
    "agree", "ahead", "aim", "alarm", "alive", "alone", "along", "aloud", "always", "among",
    "amount", "anchor", "angle", "angry", "animal", "answer", "apart", "apple", "apply", "area",
    "argue", "around", "arrive", "arrow", "aside", "attack", "aunt", "autumn", "avoid", "awake",
    "award", "away", "baby", "back", "bake", "ban", "bar", "bare", "bark", "barn",
    "basic", "basin", "basket", "bath", "battle", "beach", "bean", "beat", "become", "beef",
    "been", "before", "begin", "behind", "being", "bell", "belong", "below", "belt", "bench",
    "bend", "berry", "best", "better", "between", "beyond", "bill", "bind", "bit", "bite",
    "bitter", "black", "blade", "blame", "blank", "blast", "blend", "bless", "blind", "block",
    "blood", "bloom", "blow", "board", "bone", "bonus", "boot", "border", "borrow", "boss",
    "bottle", "bottom", "bound", "bowl", "brain", "branch", "brand", "brave", "break", "breath",
    "brick", "bridge", "brief", "bright", "bring", "broad", "brother", "brown", "brush", "bubble",
    "budget", "build", "bulb", "bulk", "bull", "bundle", "burn", "burst", "bury", "bus",
    "bush", "busy", "butter", "button", "buy", "cabin", "cable", "cage", "cake", "calm",
    "camp", "can", "canal", "candle", "cap", "cape", "carbon", "cargo", "carry", "cart",
    "carve", "castle", "catch", "cattle", "cause", "cave", "cell", "cent", "center", "chain",
    "chair", "chalk", "chance", "change", "charge", "charm", "chart", "chase", "cheap", "check",
    "cheek", "cheer", "cheese", "chest", "chief", "child", "chill", "chin", "choice", "choose",
    "chop", "circle", "claim", "clay", "clerk", "click", "client", "cliff", "climb", "clock",
    "close", "cloth", "cloud", "clown", "club", "clue", "coach", "coal", "coast", "coat",
    "code", "coffee", "coin", "collar", "color", "column", "comb", "comet", "common", "copy",
    "coral", "cord", "core", "cork", "corner", "cotton", "couch", "count", "course", "court",
    "cousin", "cover", "cow", "crack", "craft", "crash", "crawl", "crazy", "cream", "create",
    "credit", "creek", "crew", "crime", "crisp", "crop", "cross", "crowd", "crown", "cruel",
    "crush", "cry", "cube", "cup", "cure", "curl", "current", "curve", "custom", "cycle",
    "daily", "dairy", "dance", "danger", "dare", "date", "dawn", "deal", "dear", "debate",
    "debt", "decade", "decide", "deck", "deed", "deer", "degree", "delay", "demand", "den",
    "dense", "deny", "depend", "depth", "desert", "design", "detail", "device", "dig", "dinner",
    "direct", "dirt", "dish", "divide", "dock", "doctor", "dollar", "done", "dot", "double",
    "doubt", "dozen", "draft", "drag", "drain", "drama", "dress", "drift", "drill", "drink",
    "drop", "drum", "duck", "due", "dull", "dust", "duty", "eager", "eagle", "ear",
    "earn", "effect", "effort", "eight", "either", "elbow", "elder", "elect", "eleven", "else",
    "empty", "energy", "engine", "enjoy", "enough", "enter", "entire", "equal", "error", "escape",
    "estate", "event", "exact", "exam", "except", "exist", "exit", "expand", "expect", "expert",
    "extra", "fabric", "fade", "fail", "fair", "faith", "false", "fame", "family", "fan",
    "fancy", "fault", "favor", "feast", "fee", "feed", "fence", "fetch", "fever", "fiber",
    "fifty", "fight", "figure", "file", "fill", "film", "filter", "final", "finger", "finish",
    "firm", "fit", "fix", "flag", "flame", "flash", "flavor", "flee", "flesh", "flight",
    "float", "flock", "flood", "flour", "flow", "flower", "fluid", "foam", "fog", "fold",
    "follow", "fond", "force", "forest", "forget", "fork", "fort", "forty", "forward", "found",
    "fox", "frame", "fresh", "friend", "frog", "front", "frost", "fruit", "fuel", "funny",
    "fur", "future", "gain", "gap", "garden", "gas", "gather", "gaze", "gear", "gentle",
    "ghost", "giant", "gift", "glad", "glance", "globe", "glory", "glove", "glow", "glue",
    "goal", "goat", "grab", "grace", "grade", "grain", "grand", "grant", "grape", "grass",
    "grave", "graze", "grief", "grip", "ground", "guard", "guess", "guest", "guide", "gulf",
    "habit", "hall", "hammer", "happy", "harbor", "harm", "harsh", "haste", "hat", "hate",
    "hawk", "hay", "heal", "health", "heap", "heat", "hello", "hen", "herd", "hero",
    "hide", "hint", "hire", "hit", "hobby", "hole", "hollow", "honest", "honey", "honor",
    "hook", "horn", "host", "hotel", "huge", "human", "humor", "hunger", "hunt", "hurry",
    "hurt", "image", "impact", "inch", "income", "indeed", "index", "indoor", "inner", "input",
    "insect", "inside", "invite", "island", "issue", "item", "ivory", "jacket", "jar", "jaw",
    "jewel", "joke", "joy", "judge", "juice", "jungle", "junior", "jury", "keen", "kettle",
    "kick", "kid", "kiss", "kite", "knee", "knife", "knock", "knot", "label", "labor",
    "lace", "lack", "ladder", "lady", "lamb", "lamp", "lane", "lap", "laugh", "launch",
    "law", "lawn", "layer", "lazy", "leader", "league", "lean", "leap", "lease", "least",
    "leave", "lemon", "lend", "length", "lesson", "level", "lever", "lid", "limit", "link",
    "lion", "lip", "liquid", "little", "load", "loaf", "loan", "local", "lock", "lodge",
    "log", "loop", "loose", "lord", "lose", "loss", "lost", "lot", "lower", "luck",
    "lump", "lunch", "lung", "mad", "magic", "mail", "major", "manage", "manner", "maple",
    "marble", "march", "margin", "market", "marry", "mask", "mass", "master", "match", "matter",
    "meadow", "meal", "meat", "medal", "media", "medium", "melt", "member", "memory", "mend",
    "mental", "menu", "mercy", "merry", "mess", "metal", "meter", "method", "middle", "might",
    "mild", "mill", "minor", "minute", "mirror", "mix", "model", "modern", "moment", "money",
    "monkey", "month", "mood", "motion", "motor", "mount", "mouse", "mouth", "mud", "muscle",
    "museum", "nail", "narrow", "nation", "native", "nature", "navy", "neat", "neck", "needle",
    "nephew", "nerve", "nest", "net", "never", "news", "niece", "noble", "nod", "noise",
    "noon", "normal", "nose", "notice", "novel", "number", "nurse", "nut", "oak", "object",
    "ocean", "offer", "office", "often", "oil", "olive", "onion", "orange", "orbit", "organ",
    "origin", "ounce", "outer", "output", "oven", "owl", "owner", "oxygen", "pace", "pack",
    "packet", "paint", "pair", "palace", "pale", "palm", "pan", "panel", "panic", "parade",
    "pardon", "parent", "party", "paste", "pat", "patch", "pause", "paw", "pearl", "pen",
    "pencil", "penny", "people", "pepper", "period", "permit", "person", "pet", "phase", "phone",
    "photo", "phrase", "piano", "picnic", "piece", "pig", "pile", "pillow", "pilot", "pin",
    "pine", "pink", "pipe", "pitch", "pity", "plain", "planet", "plate", "please", "plenty",
    "plot", "plow", "pocket", "poem", "poet", "poison", "pole", "police", "policy", "polish",
    "polite", "pond", "pony", "pool", "poor", "pop", "port", "post", "pot", "pound",
    "pour", "powder", "power", "praise", "pray", "prefer", "press", "pretty", "price", "pride",
    "prime", "prince", "print", "prison", "prize", "profit", "proof", "proper", "proud", "prove",
    "public", "pump", "pupil", "pure", "purple", "purse", "puzzle", "queen", "quest", "quick",
    "quiet", "quite", "rabbit", "race", "rack", "radio", "raft", "rail", "raise", "rank",
    "rapid", "rare", "rate", "rather", "raw", "ray", "razor", "ready", "reason", "recall",
    "record", "refuse", "region", "relax", "relief", "remain", "remark", "remedy", "remind", "remote",
    "remove", "rent", "repair", "repeat", "reply", "report", "rescue", "result", "return", "reveal",
    "reward", "rhythm", "ribbon", "rice", "rid", "riddle", "ridge", "rifle", "rim", "ripe",
    "risk", "rival", "roar", "roast", "rob", "robe", "robin", "rod", "role", "rope",
    "rough", "route", "row", "royal", "rub", "rubber", "rude", "rug", "ruin", "rumor",
    "rush", "rust", "sack", "sad", "saddle", "sail", "salad", "sale", "sample", "saw",
    "scale", "scare", "scene", "scent", "school", "score", "scrap", "scream", "screen", "screw",
    "script", "search", "season", "second", "secret", "secure", "seek", "seem", "seize", "seldom",
    "select", "senior", "sense", "serve", "settle", "severe", "sew", "shade", "shadow", "shake",
    "shall", "shame", "share", "shark", "sheep", "sheet", "shelf", "shell", "shield", "shift",
    "shine", "shirt", "shock", "shoe", "shoot", "shore", "shout", "shower", "shut", "sick",
    "sight", "silent", "silk", "silly", "silver", "simple", "since", "single", "sink", "sister",
    "skill", "skin", "skirt", "sled", "slice", "slide", "slight", "slip", "slope", "smart",
    "smell", "smoke", "smooth", "snake", "snap", "soap", "social", "sock", "sofa", "solar",
    "sold", "solid", "solve", "sort", "soul", "soup", "sour", "source", "spade", "spare",
    "spark", "spear", "spice", "spider", "spill", "spin", "spirit", "spite", "splash", "split",
    "spoil", "spoon", "sport", "spray", "spread", "square", "stable", "stack", "staff", "stage",
    "stair", "stake", "stamp", "stare", "state", "status", "steady", "steal", "steam", "steel",
    "steep", "steer", "stem", "stick", "stiff", "sting", "stir", "stitch", "stock", "stool",
    "storm", "stove", "strain", "strap", "straw", "stream", "stress", "strict", "strike", "string",
    "stripe", "stroke", "study", "stuff", "style", "sudden", "sugar", "suit", "summer", "supper",
    "supply", "surf", "survey", "swamp", "swan", "swear", "sweat", "sweep", "sweet", "swell",
    "swim", "swing", "switch", "sword", "symbol", "system", "tail", "tailor", "tale", "tank",
    "tap", "tape", "target", "task", "taste", "tax", "tea", "teach", "tear", "tease",
    "temper", "temple", "tend", "tender", "tent", "term", "text", "thank", "theme", "theory",
    "thick", "thief", "thin", "third", "thirst", "thirty", "thorn", "thread", "threat", "throat",
    "throne", "throw", "thumb", "ticket", "tide", "tidy", "tie", "tiger", "tight", "tile",
    "till", "timber", "tin", "tiny", "tip", "tire", "title", "toast", "toe", "tongue",
    "tool", "tooth", "total", "touch", "tough", "tour", "toward", "tower", "toy", "trace",
    "track", "trade", "trail", "train", "trap", "travel", "tray", "treat", "trend", "trial",
    "tribe", "trick", "troop", "truck", "trunk", "trust", "truth", "tube", "tune", "tunnel",
    "twelve", "twenty", "twice", "twin", "twist", "type", "ugly", "uncle", "union", "until",
    "upon", "upper", "upset", "urban", "urge", "usual", "valley", "value", "vapor", "vast",
    "vein", "verse", "vessel", "vine", "visit", "vital", "vivid", "vote", "vowel", "voyage",
    "wagon", "waist", "wake", "wander", "war", "wash", "waste", "weak", "wealth", "weapon",
    "weather", "weave", "web", "weed", "weigh", "weight", "welcome", "wet", "whale", "wheat",
    "while", "whip", "whole", "wife", "win", "wine", "wipe", "wire", "wise", "wit",
    "witness", "woman", "wonder", "wool", "worry", "worth", "wound", "wrap", "wreck", "wrist",
    "wrong", "yawn", "yellow", "yield", "youth", "zero", "zone")

  private val ruFemCanonical = Seq(
    "Анна", "Алёна", "Алина", "Алиса", "Варвара", "Вера", "Вероника", "Галина", "Дарья", "Ева",
    "Екатерина", "Елена", "Жанна", "Зоя", "Инна", "Ирина", "Карина", "Кира", "Ксения", "Лариса",
    "Лидия", "Любовь", "Людмила", "Марина", "Мария", "Надежда", "Наталья", "Нина", "Оксана", "Ольга",
    "Полина", "Раиса", "Светлана", "София", "Тамара", "Татьяна", "Ульяна", "Юлия", "Яна")
  private val ruMascCanonical = Seq(
    "Александр", "Алексей", "Анатолий", "Андрей", "Антон", "Аркадий", "Артём", "Борис", "Вадим", "Валентин",
    "Василий", "Виктор", "Виталий", "Владимир", "Владислав", "Геннадий", "Георгий", "Глеб", "Григорий", "Даниил",
    "Денис", "Дмитрий", "Евгений", "Егор", "Иван", "Игорь", "Илья", "Кирилл", "Константин", "Леонид",
    "Максим", "Матвей", "Михаил", "Никита", "Николай", "Олег", "Павел", "Пётр", "Роман", "Руслан",
    "Семён", "Сергей", "Станислав", "Степан", "Тимофей", "Фёдор", "Юрий", "Ярослав")
  // diminutive / informal forms — real given-name register in data
  private val ruInformalFirst = Seq(
    "Саша", "Маша", "Катя", "Наташа", "Оля", "Таня", "Лена", "Света", "Ира", "Юля",
    "Аня", "Галя", "Даша", "Женя", "Зина", "Клава", "Лида", "Люда", "Мила", "Надя",
    "Настя", "Нюра", "Поля", "Рая", "Соня", "Тома", "Шура", "Валя", "Вика", "Алла",
    "Дима", "Коля", "Петя", "Ваня", "Миша", "Гриша", "Толя", "Костя", "Лёша", "Серёжа",
    "Боря", "Вася", "Витя", "Володя", "Гена", "Гоша", "Данила", "Егорка", "Жора", "Захар",
    "Игорёк", "Кеша", "Лёва", "Макар", "Марат", "Мирон", "Назар", "Остап", "Платон", "Прохор",
    "Родион", "Савва", "Тарас", "Тимур", "Филипп", "Эдуард", "Эльдар", "Юра", "Яша", "Артур")
  private val ruFirstBase = ruFemCanonical ++ ruMascCanonical ++ ruInformalFirst

  val ru: LocaleBundle = LocaleBundle(
    name = "ru",
    smallLetters = "абвгдеёжзийклмнопрстуфхцчшщъыьэюя".toCharArray,
    largeLetters = "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ".toCharArray,
    firstNamesAll = sorted(
      ruFirstBase ++ ruPatronymics(ruMascCanonical) ++ ruNameDiminutives(ruFirstBase)),
    lastNamesAll = {
      val masc = Seq(
      "Абрамов", "Александров", "Алексеев", "Андреев", "Антонов", "Баранов", "Белов", "Богданов", "Борисов", "Васильев",
      "Виноградов", "Волков", "Воробьёв", "Герасимов", "Голубев", "Гончаров", "Горбунов", "Гусев", "Давыдов", "Данилов",
      "Дмитриев", "Егоров", "Ефимов", "Жуков", "Зайцев", "Захаров", "Иванов", "Ильин", "Исаев", "Казаков",
      "Калинин", "Карпов", "Киселёв", "Козлов", "Комаров", "Кондратьев", "Королёв", "Кузнецов", "Кузьмин", "Лазарев",
      "Лебедев", "Макаров", "Максимов", "Марков", "Мартынов", "Медведев", "Мельников", "Миронов", "Михайлов", "Морозов",
      "Назаров", "Никитин", "Николаев", "Новиков", "Орлов", "Осипов", "Павлов", "Петров", "Поляков", "Попов",
      "Романов", "Рябов", "Савельев", "Семёнов", "Сергеев", "Сидоров", "Смирнов", "Соболев", "Соколов", "Соловьёв",
      "Сорокин", "Степанов", "Тарасов", "Тимофеев", "Титов", "Тихонов", "Фёдоров", "Филиппов", "Фомин", "Фролов",
      "Цветков", "Чернов", "Шестаков", "Широков", "Щербаков", "Яковлев")
      // round-8 widening: every productive paradigm over stems drawn from
      // hand roots, the noun vocabulary and given names (details above)
      val handStems = (ruSurnameRoots ++ ruMoreRoots).toSeq.map(ruStem).filter(_.length >= 3)
      val wordStems = ruWordsBase.map(w => ruStem(w.capitalize)).filter(s => s.length >= 3 && s.length <= 10)
      val nameStems = ruFirstBase.map(ruStem).filter(_.length >= 3)
      val allStems = (handStems ++ wordStems ++ nameStems).distinct
      sorted(masc ++ ruFeminine(masc) ++ ruSurnameExpansion ++
        ruExpandStems(allStems) ++
        (handStems ++ nameStems).distinct.flatMap(ruOvsky) ++
        ruYkhStems.toSeq.map(ruYkh))
    },
    phonePatterns = Array(
      "+7 (###) ###-##-##",
      "+7-###-###-##-##",
      "8 (###) ###-##-##",
      "8-###-###-##-##",
      "+7##########"),
    words = sorted(ruWordsBase ++ ruWordInflections(ruWordsBase) ++ ruAdjForms),
    bytesPerChar = 2
  )

  /** Round-10 session-2 widening: the full hard-stem ADJECTIVE paradigm —
    * the most regular corner of Russian adjective morphology. Per stem:
    * masc/fem/neut/plural nominative, genitive, dative, instrumental,
    * genitive-plural, the -о adverb and the -ее comparative (10 forms);
    * velar/husher stems take the -ий/-ие/-им/-их spellings and hushers the
    * -ее neuter, per the standard orthographic rules. Own-authored common
    * adjective stems, same method as the surname paradigms. */
  private lazy val ruAdjStems: Array[String] = Array(
    "бедн", "бел", "богат", "быстр", "важн", "верн", "весел", "вечн",
    "вкусн", "влажн", "вредн", "высок", "вязк", "главн", "гладк", "глух",
    "голодн", "горд", "горьк", "громк", "груб", "грустн", "густ", "добр",
    "долг", "дорог", "дружн", "жадн", "жарк", "желт", "жив", "звонк",
    "зелен", "знатн", "зорк", "кисл", "красн", "крепк", "кругл", "крупн",
    "легк", "ломк", "мал", "мил", "мирн", "модн", "мокр", "молод",
    "мощн", "мрачн", "мудр", "мутн", "мягк", "нежн", "низк", "нов",
    "остр", "плотн", "полн", "прав", "прост", "прочн", "пуст", "равн",
    "редк", "резк", "робк", "ровн", "светл", "сильн", "скромн", "скучн",
    "слаб", "сладк", "слеп", "смел", "стар", "строг", "сух", "сыр",
    "тверд", "темн", "тесн", "тих", "толст", "тонк", "точн", "трудн",
    "тяжк", "умн", "холодн", "храбр", "хрупк", "цел", "честн", "чист",
    "широк", "шумн", "щедр", "ярк", "ясн")

  private def ruAdjForms: Seq[String] = ruAdjStems.toSeq.flatMap { st =>
    val velar = "кгх".indexOf(st.last) >= 0
    val hush = "чшщж".indexOf(st.last) >= 0
    val soft = velar || hush
    val masc = if (soft) "ий" else "ый"
    val plural = if (soft) "ие" else "ые"
    val instr = if (soft) "им" else "ым"
    val genPl = if (soft) "их" else "ых"
    val neut = if (hush) "ее" else "ое"
    Seq(st + masc, st + "ая", st + neut, st + plural,
      st + "ого", st + "ому", st + instr, st + genPl,
      st + "о", st + "ее")
  }

  private lazy val ruWordsBase: Seq[String] = Seq(
      "а", "в", "и", "к", "о", "с", "у", "я",
      "без", "белый", "берег", "боль", "брат", "быть", "вверх", "вода", "воздух", "война",
      "вопрос", "время", "город", "гора", "дверь", "дело", "день", "дерево", "дождь", "дом",
      "дорога", "друг", "душа", "жизнь", "закон", "земля", "зима", "игра", "идти", "имя",
      "книга", "конец", "край", "лес", "лето", "лицо", "луна", "люди", "масло", "мать",
      "место", "месяц", "мир", "море", "мост", "мысль", "народ", "небо", "ночь", "огонь",
      "окно", "осень", "отец", "песня", "поле", "правда", "птица", "путь", "работа", "радость",
      "река", "рука", "рыба", "сад", "свет", "семья", "сердце", "сила", "слово", "смех",
      "снег", "солнце", "сон", "стол", "страна", "сын", "театр", "тело", "тень", "труд",
      "улица", "утро", "хлеб", "холод", "цвет", "час", "человек", "число", "школа", "яблоко",
      "берёза", "ветер", "вечер", "волна", "воля", "вкус", "глаз", "голос", "гость", "гриб",
      "губа", "дача", "девочка", "дед", "доктор", "доля", "дым", "еда", "ёж", "ёлка",
      "жар", "железо", "жук", "забор", "завод", "запах", "звезда", "зверь", "звук", "зерно",
      "камень", "капля", "карта", "каша", "ключ", "кожа", "колесо", "кольцо", "корень", "корова",
      "кот", "кровь", "крыло", "крыша", "куст", "лампа", "лёд", "лист", "ложка", "лошадь",
      "мальчик", "мёд", "мел", "металл", "мех", "молоко", "мука", "мышь", "нож", "нора",
      "облако", "овца", "озеро", "орёл", "печь", "письмо", "плечо", "плод", "площадь", "повар",
      "погода", "пол", "полка", "порог", "порт", "посуда", "похвала", "право", "праздник", "пыль",
      "роса", "рот", "рубль", "ручей", "сахар", "свеча", "север", "сено", "скала", "сказка",
      "сокол", "соль", "сосна", "стекло", "стена", "стул", "суп", "трава", "туман", "туча",
      "угол", "уголь", "узел", "ухо", "флаг", "форма", "царь", "цена", "цепь", "чашка",
      "честь", "шаг", "шум", "щека", "юг", "язык", "якорь", "яма", "ясень", "ящик",
      // round-10 widening: more everyday nouns (own-authored), feeding the
      // same declension expansion
      "весна", "ветка", "вишня", "внук", "волос", "врач", "выбор", "глина", "гнездо", "год",
      "голубь", "гром", "груша", "дар", "дыня", "жена", "жемчуг", "забота", "залив", "заяц",
      "здание", "зеркало", "зонт", "изба", "камыш", "капуста", "карман", "картина", "клетка", "ковш",
      "колено", "колос", "комната", "корабль", "корзина", "корм", "короб", "костёр", "кость", "краска",
      "кресло", "круг", "крупа", "кувшин", "кукла", "курица", "лавка", "ладонь", "лимон", "линия",
      "лодка", "локоть", "луг", "лук", "магазин", "малина", "мастер", "машина", "медаль", "мешок",
      "минута", "молот", "монета", "мрамор", "муравей", "мыло", "мясо", "набор", "награда", "неделя",
      "нить", "обед", "овёс", "огурец", "опыт", "орех", "осина", "остров", "ответ", "отдых",
      "охота", "очаг", "палец", "палка", "пальто", "память", "пар", "парус", "перо", "песок",
      "печаль", "пирог", "платок", "платье", "плита", "победа", "подарок", "подвал", "поезд", "пожар",
      "покой", "полоса", "помощь", "поток", "почта", "пояс", "прибор", "привет", "природа", "провод",
      "пруд", "пчела", "пшеница", "радуга", "разум", "рассказ", "ремень", "рецепт", "рис", "рисунок",
      "родина", "рой", "рынок", "рысь", "сапог", "сарай", "свинья", "свобода", "секрет", "село",
      "серебро", "сестра", "сирень", "слава", "слеза", "слон", "смола", "собака", "совет", "солома",
      "сорока", "сосед", "союз", "спина", "спор", "способ", "стадо", "сталь", "старик", "степь",
      "стрела", "строка", "судьба", "сумка", "сундук", "схема", "счастье", "тайна", "танец", "тарелка",
      "телега", "телефон", "тетрадь", "тишина", "товар", "топор", "торт", "точка", "тропа", "труба",
      "тыква", "удача", "ужин", "узор", "улыбка", "урок", "успех", "утка", "ферма", "фонарь",
      "хозяин", "холм", "цветок", "церковь", "чай", "чемодан", "черта", "чудо", "шапка", "шар",
      "шахта", "шея", "шкаф", "шляпа", "щит", "экран", "этаж", "юбка", "юноша", "яблоня",
      "ягода", "яйцо", "янтарь", "ярмарка",
      // round-10 session-2: a further everyday-noun pass (own-authored,
      // same declension expansion; nature/household/town/body/abstract)
      "автобус", "адрес", "аист", "алмаз", "аптека", "арбуз", "багаж", "базар", "балкон", "банка",
      "баня", "барабан", "баран", "башня", "белка", "берет", "беседа", "билет", "блюдо", "бобр",
      "бочка", "браслет", "бревно", "бровь", "бумага", "бусина", "бутылка", "вагон", "ваза", "варенье",
      "ведро", "век", "верёвка", "верблюд", "вершина", "вес", "весло", "вилка", "вино", "виноград",
      "водопад", "вокзал", "ворота", "воротник", "восток", "выставка", "гавань", "газета", "галстук", "гвоздь",
      "герой", "гиря", "глагол", "гончар", "горизонт", "горло", "горох", "гортань", "градус", "граница",
      "гребень", "грива", "грудь", "грядка", "дельфин", "деревня", "десерт", "диван", "долина", "дорожка",
      "доска", "дракон", "дрова", "дубрава", "дупло", "дюжина", "единица", "ежевика", "ель", "жаба",
      "жаворонок", "желание", "жёлудь", "живот", "жилет", "журнал", "зал", "замок", "занавес", "запад",
      "заря", "зарплата", "звено", "земляника", "знамя", "зуб", "ива", "игла", "игрушка", "изюм",
      "икра", "инструмент", "калитка", "канат", "карандаш", "карась", "карета", "кастрюля", "качели", "каюта",
      "квадрат", "кедр", "кирпич", "кисть", "клад", "кладовая", "клюв", "книга", "ковёр", "коза",
      "колодец", "колыбель", "компас", "конверт", "конь", "копыто", "корица", "коробка", "коса", "костюм",
      "котёл", "кофта", "крапива", "крыльцо", "кулак", "кулон", "кухня", "лагерь", "ландыш", "лапа",
      "ласточка", "лебедь", "лекарство", "лента", "лепесток", "лестница", "ливень", "литр", "лифт", "лоб",
      "ловушка", "лосось", "лужа", "лукошко", "льдина", "любовь", "маяк", "мебель", "медведь", "мельница",
      "метель", "метр", "мечта", "миска", "млечник", "моряк", "мост", "мотор", "музей", "мундир",
      "напиток", "насос", "небо", "невод", "нерпа", "обруч", "обувь", "овраг", "одеяло", "окунь",
      "олень", "опушка", "оркестр", "оса", "отец", "отряд", "парад", "паркет", "паук", "пейзаж",
      "пекарь", "перчатка", "печенье", "пианино", "пила", "пилот", "плащ", "плотина", "подкова", "подушка",
      "полотно", "поляна", "помидор", "портфель", "посёлок", "пост", "прогулка", "простор", "птенец", "пуговица",
      "пузырь", "путник", "работа", "раковина", "рама", "ракета", "рассвет", "рельс", "решето", "рог",
      "рожь", "розетка", "рояль", "рубаха", "рукав", "ручка", "рыба", "рюкзак", "салат", "салфетка",
      "самолёт", "свет", "свитер", "сводка", "сеть", "сивка", "сито", "слива", "словарь", "смородина",
      "снежинка", "сугроб", "таблица", "табун", "творог", "телёнок", "терем", "тигр", "ткань",
      "улей", "улитка", "фартук", "фиалка", "футляр", "халат", "хвост", "хижина", "хлопок", "хомут",
      "цыплёнок", "чайник", "черника", "чеснок", "шерсть", "шёлк", "шиповник", "шорох", "щавель", "щепка")

  def apply(name: String): LocaleBundle = name match {
    case "en" => en
    case "ru" => ru
    case other => throw new IllegalArgumentException(s"unknown locale: $other")
  }
}
