package graft.locale

/** Locale bundles for string generation.
  *
  * The reference engine ships en/ru corpora (letters, first/last names, words,
  * phone patterns) behind a `LocalModule` interface
  * (sdvg `internal/generator/usecase/general/locale/interfaces.go:4-23`,
  * charsets `locale/consts.go:5-8`). We reproduce the *interface contract*
  * (small/large letters, gendered name lists filtered by length, phone
  * patterns, word lists with one-letter words, bytes-per-char) with our own
  * compact corpora — the reference's tests assert only length bounds,
  * determinism and set-membership, never specific strings, so corpus content
  * is free to differ.
  *
  * All data is immutable and executor-local (referenced from generated code /
  * UDF closures); a few KB per JVM, no broadcast needed.
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
  def oneLetterWords: Array[String] = words.filter(_.length == 1)
}

object Locales {

  /** Shared digit / special-char sets (reference `locale/consts.go:5-8`). */
  val Numbers: Array[Char] = "0123456789".toCharArray
  val SpecialChars: Array[Char] = "!#$%&()*+,-.:;<=>?@_{|}".toCharArray
  val WordsDelimiter = " "

  private def sorted(xs: Seq[String]): Array[String] = xs.distinct.sorted.toArray

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
      "Peter", "Ryan", "Samuel", "Scott", "Sean", "Simon", "Thomas", "Tyler", "Victor", "Wade")),
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
      "Wood", "Wright", "Young")),
    phonePatterns = Array(
      "+1 (###) ###-####",
      "+1-###-###-####",
      "(###) ###-####",
      "###-###-####"),
    words = sorted(Seq(
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
      "yet", "you", "young")),
    bytesPerChar = 1
  )

  val ru: LocaleBundle = LocaleBundle(
    name = "ru",
    smallLetters = "абвгдеёжзийклмнопрстуфхцчшщъыьэюя".toCharArray,
    largeLetters = "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ".toCharArray,
    firstNamesAll = sorted(Seq(
      "Анна", "Алёна", "Алина", "Алиса", "Варвара", "Вера", "Вероника", "Галина", "Дарья", "Ева",
      "Екатерина", "Елена", "Жанна", "Зоя", "Инна", "Ирина", "Карина", "Кира", "Ксения", "Лариса",
      "Лидия", "Любовь", "Людмила", "Марина", "Мария", "Надежда", "Наталья", "Нина", "Оксана", "Ольга",
      "Полина", "Раиса", "Светлана", "София", "Тамара", "Татьяна", "Ульяна", "Юлия", "Яна",
      "Александр", "Алексей", "Анатолий", "Андрей", "Антон", "Аркадий", "Артём", "Борис", "Вадим", "Валентин",
      "Василий", "Виктор", "Виталий", "Владимир", "Владислав", "Геннадий", "Георгий", "Глеб", "Григорий", "Даниил",
      "Денис", "Дмитрий", "Евгений", "Егор", "Иван", "Игорь", "Илья", "Кирилл", "Константин", "Леонид",
      "Максим", "Матвей", "Михаил", "Никита", "Николай", "Олег", "Павел", "Пётр", "Роман", "Руслан",
      "Семён", "Сергей", "Станислав", "Степан", "Тимофей", "Фёдор", "Юрий", "Ярослав")),
    lastNamesAll = sorted(Seq(
      "Абрамов", "Александров", "Алексеев", "Андреев", "Антонов", "Баранов", "Белов", "Богданов", "Борисов", "Васильев",
      "Виноградов", "Волков", "Воробьёв", "Герасимов", "Голубев", "Гончаров", "Горбунов", "Гусев", "Давыдов", "Данилов",
      "Дмитриев", "Егоров", "Ефимов", "Жуков", "Зайцев", "Захаров", "Иванов", "Ильин", "Исаев", "Казаков",
      "Калинин", "Карпов", "Киселёв", "Козлов", "Комаров", "Кондратьев", "Королёв", "Кузнецов", "Кузьмин", "Лазарев",
      "Лебедев", "Макаров", "Максимов", "Марков", "Мартынов", "Медведев", "Мельников", "Миронов", "Михайлов", "Морозов",
      "Назаров", "Никитин", "Николаев", "Новиков", "Орлов", "Осипов", "Павлов", "Петров", "Поляков", "Попов",
      "Романов", "Рябов", "Савельев", "Семёнов", "Сергеев", "Сидоров", "Смирнов", "Соболев", "Соколов", "Соловьёв",
      "Сорокин", "Степанов", "Тарасов", "Тимофеев", "Титов", "Тихонов", "Фёдоров", "Филиппов", "Фомин", "Фролов",
      "Цветков", "Чернов", "Шестаков", "Широков", "Щербаков", "Яковлев")),
    phonePatterns = Array(
      "+7 (###) ###-##-##",
      "+7-###-###-##-##",
      "8 (###) ###-##-##"),
    words = sorted(Seq(
      "а", "в", "и", "к", "о", "с", "у", "я",
      "без", "белый", "берег", "боль", "брат", "быть", "вверх", "вода", "воздух", "война",
      "вопрос", "время", "город", "гора", "дверь", "дело", "день", "дерево", "дождь", "дом",
      "дорога", "друг", "душа", "жизнь", "закон", "земля", "зима", "игра", "идти", "имя",
      "книга", "конец", "край", "лес", "лето", "лицо", "луна", "люди", "масло", "мать",
      "место", "месяц", "мир", "море", "мост", "мысль", "народ", "небо", "ночь", "огонь",
      "окно", "осень", "отец", "песня", "поле", "правда", "птица", "путь", "работа", "радость",
      "река", "рука", "рыба", "сад", "свет", "семья", "сердце", "сила", "слово", "смех",
      "снег", "солнце", "сон", "стол", "страна", "сын", "театр", "тело", "тень", "труд",
      "улица", "утро", "хлеб", "холод", "цвет", "час", "человек", "число", "школа", "яблоко")),
    bytesPerChar = 2
  )

  def apply(name: String): LocaleBundle = name match {
    case "en" => en
    case "ru" => ru
    case other => throw new IllegalArgumentException(s"unknown locale: $other")
  }
}
