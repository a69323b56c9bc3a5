package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2 — the
 * rules that turned Common Crawl into C4): keep only the lines of each
 * document that look like real prose, then keep only the documents that
 * retain enough lines. The classic web-corpus pre-filter that runs BEFORE
 * dedup/quality scoring in a pretraining pipeline. Not in the reference
 * (no corpus surface); SURVEY.md §2.6 north-star addition.
 *
 * Line rules (each toggleable — published C4 values as defaults):
 *  - ≥ `minLineWords` whitespace words (C4 used 3);
 *  - ends in a terminal punctuation mark (`. ! ? "` after rtrim);
 *  - does not mention "javascript" (case-insensitive).
 * Document rules, applied AFTER line filtering:
 *  - ≥ `minKeptLines` surviving lines (C4's "at least 5 sentences");
 *  - no "lorem ipsum" and no `{` anywhere in the ORIGINAL text (C4 drops
 *    the whole page — code and boilerplate markers).
 * C4's fourth page rule — dedup of three-sentence spans across pages —
 * is corpus-level, not per-row: compose with [[Dedup.segmentDedup]] /
 * [[Spans]] downstream, as the paper pipelines it.
 *
 * Emits one row per input document: (id, n_lines, n_kept, clean_text,
 * c4_pass) where clean_text rejoins the kept lines with '\n' — callers
 * filter on `c4_pass` and project `clean_text`. Keeping dropped docs in
 * the output (pass=false) makes the operator a pure projection, so the
 * lens op stays row-level and invertible-free like `gopher_rules`.
 *
 * 100 TB shape: a narrow map — per-doc work is O(lines × words) with no
 * shuffle at all; the operator adds zero exchanges to whatever plan it
 * runs in. Whole-corpus decisions (span dedup) are deliberately left to
 * the set-level operators built for them.
 */
object C4Clean {

  private val TerminalChars = Seq(".", "!", "?", "\"")

  /** The per-line keep predicate over a line Column — shared by the
   *  operator and [[keptLines]] so rule toggles cannot drift. */
  private def lineOk(l: Column, minLineWords: Int,
      requireTerminalPunct: Boolean): Column = {
    val words = size(split(trim(l), " "))
    val enough = words >= minLineWords && trim(l) =!= ""
    val punct = substring(rtrim(l), -1, 1).isin(TerminalChars: _*)
    val noJs = !lower(l).contains("javascript")
    if (requireTerminalPunct) enough && punct && noJs else enough && noJs
  }

  private def keptLines(t: Column, minLineWords: Int,
      requireTerminalPunct: Boolean): Column =
    filter(split(t, "\n"), l => lineOk(l, minLineWords, requireTerminalPunct))

  /** (id, n_lines, n_kept, clean_text, c4_pass) per input document. */
  def clean(df: DataFrame, textCol: String, idCol: String,
      minLineWords: Int = 3, minKeptLines: Int = 5,
      requireTerminalPunct: Boolean = true,
      keep: Seq[String] = Nil): DataFrame = {
    require(minLineWords >= 1, "need minLineWords >= 1")
    require(minKeptLines >= 1, "need minKeptLines >= 1")
    val t = col(textCol)
    val kept = keptLines(t, minLineWords, requireTerminalPunct)
    val pageOk = !lower(t).contains("lorem ipsum") && !t.contains("{")
    df.select(
      (col(idCol) +: keep.map(col)) ++ Seq(
        size(split(t, "\n")).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        array_join(kept, "\n").as("clean_text"),
        (size(kept) >= minKeptLines && pageOk).as("c4_pass")): _*)
  }
}
