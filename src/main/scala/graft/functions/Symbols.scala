package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exchange-aware trading-pair splitting + normalization (reference
  * common/symbols.py:5-39 — COMMON_QUOTES, BASE_ALIASES XBT→BTC,
  * split_pair for Kraken `X/Y` / Coinbase `X-Y` / Binance `XYUSDT`
  * suffix styles, normalize_symbol → "BASE_QUOTE").
  *
  * Implemented as native Column expressions (`when`-chain + string
  * builtins) — no UDF, fully codegen'd, usable in any query; plus plain
  * Scala versions for driver-side use. Quote suffixes are tried
  * longest-first (USDT before USD) exactly like the reference iterates its
  * ordered list.
  */
object Symbols {

  /** Ordered: longer quotes first so XBTUSDT → (XBT, USDT) not (XBTUSD?, T). */
  val commonQuotes: Seq[String] = Seq("USDT", "USDC", "USD", "EUR", "GBP", "JPY", "BTC", "ETH")

  val baseAliases: Map[String, String] = Map("XBT" -> "BTC", "XDG" -> "DOGE")

  /** Base currency of a pair symbol, any exchange style. */
  def baseCol(sym: Column): Column = {
    val suffixHit = commonQuotes.foldLeft(lit(null).cast("string")) { (acc, q) =>
      coalesce(acc,
        when(sym.endsWith(q) && length(sym) > lit(q.length),
          sym.substr(lit(1), length(sym) - lit(q.length))))
    }
    when(sym.contains("/"), substring_index(sym, "/", 1))
      .when(sym.contains("-"), substring_index(sym, "-", 1))
      .otherwise(coalesce(suffixHit, sym))
  }

  /** Quote currency of a pair symbol, any exchange style. */
  def quoteCol(sym: Column): Column = {
    val suffixHit = commonQuotes.foldLeft(lit(null).cast("string")) { (acc, q) =>
      coalesce(acc, when(sym.endsWith(q) && length(sym) > lit(q.length), lit(q)))
    }
    when(sym.contains("/"), substring_index(sym, "/", -1))
      .when(sym.contains("-"), substring_index(sym, "-", -1))
      .otherwise(coalesce(suffixHit, lit("")))
  }

  /** Alias-map a base currency (XBT→BTC etc.), upper-cased. */
  def canonicalBaseCol(base: Column): Column =
    baseAliases.foldLeft(upper(base)) { case (acc, (from, to)) =>
      when(acc === from, to).otherwise(acc)
    }

  /** normalize_symbol: "BASE_QUOTE" with aliases applied. */
  def normalizeCol(sym: Column): Column =
    concat(canonicalBaseCol(baseCol(sym)), lit("_"), upper(quoteCol(sym)))

  // ---- plain-Scala twins (driver-side / generator use) ----

  def splitPair(sym: String): (String, String) =
    if (sym.contains("/")) { val a = sym.split("/", 2); (a(0), a(1)) }
    else if (sym.contains("-")) { val a = sym.split("-", 2); (a(0), a(1)) }
    else commonQuotes.find(q => sym.endsWith(q) && sym.length > q.length)
      .map(q => (sym.dropRight(q.length), q)).getOrElse((sym, ""))

  def normalizeSymbol(sym: String): String = {
    val (b, q) = splitPair(sym)
    val base = baseAliases.getOrElse(b.toUpperCase, b.toUpperCase)
    s"${base}_${q.toUpperCase}"
  }
}
