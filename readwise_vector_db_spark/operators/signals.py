"""Fused per-document quality signals (round 10 — r9 verdict item 7).

A real curation pipeline records, for every document, the full signal
row — LM perplexity (CCNet), Gopher-style repetition fractions, and
the duplicated-n-gram fraction (RefinedWeb/FineWeb) — before deciding
thresholds.  Composed sequentially from this repo's operators that
costs:

- ``repetition_stats``: one text scan + THREE corpus-wide shuffles of
  exploded tokens/bigrams (groupBy (doc, gram)) + three joins;
- ``lm_quality``: one text scan through the Arrow scorer;
- ``doc_dup_fraction``: two text scans + the window-hash shuffle;
- two more doc_id joins to land one row per doc.

:func:`doc_quality_signals` fuses the per-document half into ONE
Arrow pass — repetition counting is per-doc state (a Counter over the
doc's own grams; it never needed a shuffle) and rides the same batch
iterator as the LM scorer, sharing one tokenization — then joins the
one genuinely corpus-wide signal (dup fraction, whose 8-byte window
hashes must shuffle to be corpus-wide) on doc_id.  Net: token explode
shuffles eliminated entirely, text scanned once for all per-doc
signals (plus doc_dup_fraction's own scans), one join instead of two.

Exactness contract: every fraction is emitted RAW from the Arrow pass
and rounded JVM-side with ``F.round`` (HALF_UP — Python's ``round`` is
half-to-even), the LM term reuses the exact integer-nano summation of
``operators/lm.py``, and tokenization mirrors ``ws_tokens``
(``F.split(text, r"\\s+")``: empty string → empty array — the one
Python ``re.split`` divergence, special-cased).  The registered
``doc_quality_signals`` query is value-hash-checked against a DuckDB
twin that composes the three sequential SQL oracles — the fused pass
is bit-identical to the sequential composition by the strongest gate
this repo has.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from readwise_vector_db_spark.operators.dedup import _dup_token_coverage
from readwise_vector_db_spark.operators.lm import _make_scorer

# re.ASCII (r11): Python's default \s is UNICODE-aware — it splits
#  / -class whitespace that Java's \s (Spark split) and
# RE2's \s (the DuckDB twins) do NOT.  On real web text (nbsp is
# everywhere) the fused pass would silently tokenize differently from
# the Spark-split-based operators it must compose with.  ASCII \s
# ([ \t\n\r\f\v]) equals Java's \s exactly; RE2 differs only on \v —
# a pre-existing, corpus-irrelevant residue shared by every
# split-based oracle.
_WS = re.compile(r"\s+", re.ASCII)


def _ws_tokens_py(text: str) -> list[str]:
    # mirror Spark split(text, '\s+'): '' -> [], otherwise re.split
    # (leading/trailing empties preserved identically)
    return [] if text == "" else _WS.split(text)


def doc_quality_signals(
    docs: DataFrame,
    uni: dict,
    bi: dict,
    vocab_size: int,
    add_k: float = 0.5,
    n: int = 8,
    min_repeats: int = 2,
    min_span_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per non-null-text document with the fused signal set:

    (id, n_tokens, top_unigram_frac, top_bigram_frac, dup_trigram_frac,
    rep_keep, n_bigrams, avg_logp, ppl, dup_tokens, dup_fraction)

    Repetition fractions are NULL (rep_keep NULL) for docs under 3
    tokens — the same domain ``repetition_stats`` defines them on; LM
    fields are NULL without bigram evidence; dup_tokens/dup_fraction
    default to 0 (no repeated window).  ``uni``/``bi``/``vocab_size``
    come from :func:`operators.lm.train_bigram_lm` — training is the
    caller's artifact exactly as in the sequential pipeline."""
    per_doc = per_doc_signal_frame(
        docs, uni, bi, vocab_size, add_k=add_k, id_col=id_col, text_col=text_col
    )
    # Round 13 (guide §1.2): consume the RESULT-SIZED coverage counts,
    # not the full doc_dup_fraction frame — the latter pays a third
    # corpus scan + tokenize solely to re-derive n_tokens, a value the
    # Arrow pass above already computed for every doc (same ws_tokens
    # contract, pinned by the composed-oracle hash check on BOTH
    # operators' n_tokens columns).  dup_fraction is recomputed here
    # with doc_dup_fraction's exact expression over per_doc.n_tokens,
    # so the emitted values are bit-identical; the left join shrinks
    # from corpus-sized (every doc) to coverage-sized (docs with ≥1
    # repeated window).
    cov = _dup_token_coverage(
        docs, id_col=id_col, text_col=text_col, n=n,
        min_repeats=min_repeats, min_span_tokens=min_span_tokens,
    ).select(F.col("id").alias(id_col), "dup_tokens")
    return _join_signals_cov(per_doc, cov, id_col)


def _join_signals_cov(per_doc: DataFrame, cov: DataFrame, id_col: str) -> DataFrame:
    """Join the coverage COUNTS (docs with repeated content only) and
    derive dup_fraction from the per-doc pass's own n_tokens — the
    exact expression :func:`operators.dedup.doc_dup_fraction` emits
    (same when/coalesce/HALF-UP round), over the same token count."""
    dup_tokens = F.coalesce(F.col("dup_tokens"), F.lit(0))
    return per_doc.join(cov, id_col, "left").select(
        per_doc[id_col],
        "n_tokens",
        "top_unigram_frac",
        "top_bigram_frac",
        "dup_trigram_frac",
        "rep_keep",
        "n_bigrams",
        "avg_logp",
        "ppl",
        dup_tokens.alias("dup_tokens"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                dup_tokens / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_fraction"),
    )


def _join_signals(per_doc: DataFrame, dup: DataFrame, id_col: str) -> DataFrame:
    """The one corpus-wide signal joins on the id — everything else
    never left its document."""
    return per_doc.join(dup, id_col, "left").select(
        per_doc[id_col],
        "n_tokens",
        "top_unigram_frac",
        "top_bigram_frac",
        "dup_trigram_frac",
        "rep_keep",
        "n_bigrams",
        "avg_logp",
        "ppl",
        F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
        F.coalesce(F.col("dup_fraction"), F.lit(0.0)).alias("dup_fraction"),
    )


def quality_signal_summary(
    signals: DataFrame, exact: bool = True, accuracy: int = 10_000
) -> DataFrame:
    """ONE bounded row summarizing a signal frame's distribution — the
    per-batch statistic the streaming quality-drift gate compares
    (round 11, r10 verdict item 2: the embedding drift gate's missing
    sibling).  NULL-aware: percentile ignores NULL ppl (docs without
    bigram evidence), ``ppl_null_frac`` reports how many there were,
    and ``rep_bad_frac`` is the flagged share of docs WHERE the
    repetition domain applies (≥3 tokens).  One partial-aggregatable
    pass over the batch — O(batch), never a corpus rescan.

    ``exact=True`` (default, the oracle-checked path) computes exact
    continuous-interpolation percentiles — cross-engine-checkable
    (same rationale as ``q_value_percentiles``), but the aggregation
    buffer holds a per-value counts map: O(distinct values) state per
    partial, fine per-batch, wrong for a 100 TB corpus-wide summary.
    ``exact=False`` is that scale path made real (round 12 — r11
    verdict item 8 closed the docstring promise): ``approx_percentile``
    swaps the buffer for a bounded quantile sketch (state O(accuracy),
    ``accuracy`` ≈ 1/ε) with the IDENTICAL plan shape — one
    ObjectHashAggregate with a map-side partial, one single-row
    exchange, NO sort anywhere (asserted by test) — so the swap changes
    executor memory, never the plan.  Sketch outputs are within ε of
    exact (not hash-comparable; keep ``exact=True`` wherever a DuckDB
    oracle or the drift gate's reference history is involved)."""

    def pct(col: str, q: float):
        if exact:
            return F.expr(f"percentile({col}, {q})")
        return F.expr(f"approx_percentile({col}, {q}, {int(accuracy)})")

    n_docs = F.count(F.lit(1))
    return signals.agg(
        n_docs.cast("long").alias("n_docs"),
        F.round(pct("ppl", 0.5), 6).alias("ppl_p50"),
        F.round(pct("ppl", 0.9), 6).alias("ppl_p90"),
        F.round(pct("dup_fraction", 0.5), 6).alias("dup_frac_p50"),
        F.round(pct("dup_fraction", 0.9), 6).alias("dup_frac_p90"),
        F.round(
            F.avg(F.when(F.col("rep_keep").isNotNull(),
                         F.when(F.col("rep_keep"), 0.0).otherwise(1.0))),
            6,
        ).alias("rep_bad_frac"),
        F.round(
            F.avg(F.when(F.col("ppl").isNull(), 1.0).otherwise(0.0)), 6
        ).alias("ppl_null_frac"),
    )


class QualityDriftError(RuntimeError):
    """A batch's signal distribution shifted beyond the declared band
    vs the reference window — the quality sibling of the embedding
    drift gate's loud reject.  Carries the batch summary and the
    reference medians; the message points at the remediation."""

    def __init__(self, msg: str, summary: dict, reference: dict):
        super().__init__(msg)
        self.summary = summary
        self.reference = reference


def _median(xs: list[float]) -> float:
    """Interpolated median (``statistics.median`` semantics): even-length
    inputs average the two middle elements — r11 ADVICE fix; the upper
    element previously biased the drift-gate reference and the
    ``_drifted_cells`` baseline upward for even-sized windows."""
    import statistics

    return float(statistics.median(xs))


def quality_drift_gate(
    summary: dict,
    reference: list[dict],
    max_ppl_ratio: float = 1.5,
    max_dup_frac_delta: float = 0.15,
    max_rep_bad_delta: float = 0.2,
    min_ref: int = 2,
    max_ppl_null_delta: float = 0.3,
) -> None:
    """Trip when ``summary`` (one batch's :func:`quality_signal_summary`
    row as a dict) shifts beyond the declared band vs the MEDIAN of the
    ``reference`` window's summaries (prior batches — the same
    healthy-majority anchoring as every drift baseline in this repo):

    - ``ppl_p50`` beyond ``max_ppl_ratio``× the reference median (a
      crawl gone bad reads as a perplexity jump against the frozen LM);
    - ``dup_frac_p90`` more than ``max_dup_frac_delta`` ABOVE reference
      (a source turned spammy floods repeated windows — absolute delta,
      not ratio: the healthy value is often ~0);
    - ``rep_bad_frac`` more than ``max_rep_bad_delta`` above reference;
    - ``ppl_null_frac`` more than ``max_ppl_null_delta`` ABOVE reference
      (round 12 — found by the planted-drift soak's failure analysis: a
      batch of DEGENERATE docs — empty bodies, single tokens, the
      classic crawler regression — scores ppl NULL per doc (no bigram
      evidence) and its repetition/dup signals are NULL too (their ≥3-
      token domain), so ``ppl_p50`` goes NULL and NO other band can
      fire; the null FRACTION is the only statistic that sees it).

    Fewer than ``min_ref`` reference batches → warm-up, no gate (the
    first batches DEFINE normal).  Pure driver-side arithmetic over
    O(ref_window) tiny dicts — nothing rescans.  On trip raises
    :class:`QualityDriftError` naming the breach and the remediation:
    quarantine the batch (``on_drift='quarantine'`` in the streaming
    loop keeps the stream alive and diverts the batch), raise the band
    if the shift is expected, or retrain the signal LM if 'normal'
    itself moved."""
    if len(reference) < min_ref:
        return
    ref = {
        k: _median([float(r[k]) for r in reference if r.get(k) is not None])
        for k in ("ppl_p50", "dup_frac_p90", "rep_bad_frac", "ppl_null_frac")
        if any(r.get(k) is not None for r in reference)
    }
    breaches = []
    s_ppl = summary.get("ppl_p50")
    if s_ppl is not None and ref.get("ppl_p50"):
        if float(s_ppl) / ref["ppl_p50"] > max_ppl_ratio:
            breaches.append(
                f"ppl_p50 {float(s_ppl):.3f} is "
                f"{float(s_ppl) / ref['ppl_p50']:.2f}x the reference "
                f"median {ref['ppl_p50']:.3f} (limit {max_ppl_ratio}x)"
            )
    s_dup = summary.get("dup_frac_p90")
    if s_dup is not None and "dup_frac_p90" in ref:
        if float(s_dup) - ref["dup_frac_p90"] > max_dup_frac_delta:
            breaches.append(
                f"dup_frac_p90 {float(s_dup):.3f} is "
                f"{float(s_dup) - ref['dup_frac_p90']:.3f} above the "
                f"reference median {ref['dup_frac_p90']:.3f} "
                f"(limit +{max_dup_frac_delta})"
            )
    s_rep = summary.get("rep_bad_frac")
    if s_rep is not None and "rep_bad_frac" in ref:
        if float(s_rep) - ref["rep_bad_frac"] > max_rep_bad_delta:
            breaches.append(
                f"rep_bad_frac {float(s_rep):.3f} is "
                f"{float(s_rep) - ref['rep_bad_frac']:.3f} above the "
                f"reference median {ref['rep_bad_frac']:.3f} "
                f"(limit +{max_rep_bad_delta})"
            )
    s_null = summary.get("ppl_null_frac")
    if s_null is not None and "ppl_null_frac" in ref:
        if float(s_null) - ref["ppl_null_frac"] > max_ppl_null_delta:
            breaches.append(
                f"ppl_null_frac {float(s_null):.3f} is "
                f"{float(s_null) - ref['ppl_null_frac']:.3f} above the "
                f"reference median {ref['ppl_null_frac']:.3f} "
                f"(limit +{max_ppl_null_delta}) — docs the frozen LM "
                "cannot score at all: fully out-of-vocabulary content"
            )
    if breaches:
        raise QualityDriftError(
            "quality drift gate: " + "; ".join(breaches) + " — quarantine "
            "the batch (on_drift='quarantine' diverts it and keeps the "
            "stream alive), raise the band if the shift is expected, or "
            "retrain the signal LM if the corpus legitimately moved",
            summary,
            ref,
        )


def per_doc_signal_frame(
    docs: DataFrame,
    uni: dict,
    bi: dict,
    vocab_size: int,
    add_k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The fused PER-DOCUMENT half alone (LM score + repetition
    fractions, one Arrow pass, zero shuffle) — composed with whichever
    corpus-wide dup signal fits the context: :func:`doc_dup_fraction`
    for a batch corpus (:func:`doc_quality_signals`), or the span
    store's incremental fraction for streaming
    (``jobs.incremental_dedup.batch_quality_signals``)."""
    if vocab_size <= 0 or add_k <= 0:
        raise ValueError("per_doc_signal_frame needs vocab_size > 0 and add_k > 0")
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast((uni, bi, int(vocab_size), float(add_k)))

    schema = T.StructType(
        [
            # id passes through with the INPUT's type (r10 review: a
            # long cast silently NULLed string/uuid ids)
            T.StructField("sig_id", docs.schema[id_col].dataType, False),
            T.StructField("n_tokens", T.IntegerType(), False),
            T.StructField("u_frac", T.DoubleType(), True),
            T.StructField("b_frac", T.DoubleType(), True),
            T.StructField("t_frac", T.DoubleType(), True),
            T.StructField("n_bigrams", T.IntegerType(), False),
            T.StructField("raw_avg", T.DoubleType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        score = _make_scorer(*bc.value)
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in
                ("sig_id", "n_tokens", "u_frac", "b_frac", "t_frac",
                 "n_bigrams", "raw_avg")
            }
            for did, text in zip(pdf["id"], pdf["t"]):
                toks = _ws_tokens_py(text)
                nt = len(toks)
                if nt >= 3:
                    u_mx = max(Counter(toks).values())
                    b_mx = max(
                        Counter(zip(toks, toks[1:])).values()
                    )
                    tgs = list(zip(toks, toks[1:], toks[2:]))
                    u_frac = u_mx / nt
                    b_frac = b_mx / (nt - 1)
                    t_frac = 1.0 - len(set(tgs)) / len(tgs)
                else:
                    u_frac = b_frac = t_frac = None
                nb, raw = score(text)
                out["sig_id"].append(did)
                out["n_tokens"].append(nt)
                out["u_frac"].append(u_frac)
                out["b_frac"].append(b_frac)
                out["t_frac"].append(t_frac)
                out["n_bigrams"].append(nb)
                out["raw_avg"].append(raw)
            yield pd.DataFrame(out)

    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("t")
    ).filter(F.col("t").isNotNull())
    sig = base.mapInPandas(run, schema=schema)

    # JVM-side rounding so HALF_UP matches the sequential operators and
    # their DuckDB twins bit-for-bit
    top_uni = F.round(F.col("u_frac"), 6)
    top_bi = F.round(F.col("b_frac"), 6)
    dup_tri = F.round(F.col("t_frac"), 6)
    avg = F.round(F.col("raw_avg"), 6)
    return sig.select(
        F.col("sig_id").alias(id_col),
        "n_tokens",
        top_uni.alias("top_unigram_frac"),
        top_bi.alias("top_bigram_frac"),
        dup_tri.alias("dup_trigram_frac"),
        F.when(
            F.col("u_frac").isNotNull(),
            (top_uni <= 0.3) & (top_bi <= 0.2) & (dup_tri <= 0.3),
        ).alias("rep_keep"),
        "n_bigrams",
        avg.alias("avg_logp"),
        F.round(F.exp(-avg), 6).alias("ppl"),
    )
