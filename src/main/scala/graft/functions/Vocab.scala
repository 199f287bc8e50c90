package graft.functions

/** Replacement vocabularies for scrub transforms.
  *
  * The reference ships ~10k-entry public datasets (txt files under
  * slice_db/data).
  * Graft embeds original, deliberately compact lists — the transform
  * *algorithm* (deterministic pepper-keyed choice, case preservation) is
  * what's re-expressed; swapping in larger vocabularies is a one-line
  * change and they broadcast as literal arrays either way.
  */
object Vocab {
  val givenNames: Seq[String] = Seq(
    "Alice", "Benjamin", "Carmen", "Diego", "Elena", "Felix", "Grace", "Hassan",
    "Ingrid", "Jamal", "Keiko", "Liam", "Maria", "Noah", "Olivia", "Pedro",
    "Quinn", "Rosa", "Samuel", "Tara", "Umar", "Vera", "Wesley", "Yara")

  val surnames: Seq[String] = Seq(
    "Anderson", "Brown", "Chen", "Davis", "Evans", "Fischer", "Garcia", "Hoffman",
    "Ivanov", "Johnson", "Kim", "Lopez", "Martin", "Nguyen", "Okafor", "Patel",
    "Quintero", "Rossi", "Silva", "Tanaka", "Ueda", "Vargas", "Williams", "Yamamoto")

  val cities: Seq[String] = Seq(
    "Austin", "Boston", "Chicago", "Denver", "El Paso", "Fresno", "Houston",
    "Indianapolis", "Jacksonville", "Kansas City", "Louisville", "Memphis",
    "Nashville", "Oakland", "Phoenix", "Portland", "Sacramento", "Tucson",
    "Wichita", "Yonkers")

  val usStates: Seq[String] = Seq(
    "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
    "Connecticut", "Delaware", "Florida", "Georgia", "Hawaii", "Idaho",
    "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky", "Louisiana", "Maine",
    "Maryland", "Massachusetts", "Michigan", "Minnesota", "Mississippi",
    "Missouri", "Montana", "Nebraska", "Nevada", "New Hampshire", "New Jersey",
    "New Mexico", "New York", "North Carolina", "North Dakota", "Ohio",
    "Oklahoma", "Oregon", "Pennsylvania", "Rhode Island", "South Carolina",
    "South Dakota", "Tennessee", "Texas", "Utah", "Vermont", "Virginia",
    "Washington", "West Virginia", "Wisconsin", "Wyoming")

  val usStateAbbrs: Seq[String] = Seq(
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV",
    "WI", "WY")

  val streets: Seq[String] = Seq(
    "Maple Street", "Oak Avenue", "Cedar Lane", "Elm Drive", "Pine Road",
    "Birch Boulevard", "Walnut Way", "Chestnut Court", "Spruce Terrace",
    "Willow Place", "Aspen Circle", "Juniper Trail", "Magnolia Parkway",
    "Sycamore Alley", "Poplar Row", "Hickory Loop")

  /** Words bucketed by length 1..12 (8 each); longer originals clamp to
    * the length-12 bucket, like the reference's default-length fallback
    * (slice_db/transforms/text.py:150-158). All lowercase; case is
    * re-applied from the original token. */
  val wordsByLen: Seq[Seq[String]] = Seq(
    Seq("a", "i", "o", "n", "s", "t", "e", "m"),
    Seq("an", "be", "do", "go", "he", "in", "my", "we"),
    Seq("air", "bed", "cat", "dog", "end", "fog", "hat", "ink"),
    Seq("acre", "bell", "cold", "dust", "echo", "fern", "gate", "hill"),
    Seq("amber", "bloom", "cedar", "delta", "ember", "frost", "grove", "haven"),
    Seq("anchor", "breeze", "candle", "dollar", "embark", "fabric", "garden", "harbor"),
    Seq("balance", "cabinet", "diagram", "elastic", "factory", "gallery", "harvest", "inquiry"),
    Seq("absolute", "baseline", "calendar", "diameter", "electron", "festival", "graceful", "hospital"),
    Seq("adventure", "blueprint", "candidate", "dangerous", "elaborate", "framework", "grapevine", "highlight"),
    Seq("adjustment", "background", "calculator", "dictionary", "elementary", "foundation", "generation", "horizontal"),
    Seq("achievement", "bureaucracy", "calculation", "description", "engineering", "frustration", "grandmother", "handwriting"),
    Seq("acceleration", "championship", "civilization", "conservation", "distribution", "encyclopedia", "headquarters", "intelligence"))
}
