"""Planted-drift soak for the streaming quality gate (round 12 — r11
verdict item 4).

A 16-batch document stream runs through ``run_incremental_span_dedup``
with the signals gate in quarantine mode.  Batches are labeled:

- ``clean`` (11): phrase-structured text from a stable phrase pool —
  the LEARNABLE bigram structure a real corpus has (the first harness
  draft used uniform-random tokens, and the failure analysis showed a
  bigram LM cannot anchor on structureless text: clean and shifted
  batches scored near-identical ppl through pure smoothing mass, so
  the ppl band separated nothing — the harness, not the gate, was
  broken; phrases fix the anchor).
- ``spam`` (2, batches 5 and 11): every doc is one phrase flooded — the
  dup-saturation defect the gate's ``dup_frac_p90`` band exists for.
- ``shift`` (1, batch 13): tokens from a disjoint vocabulary — the
  crawl-gone-bad defect the ``ppl_p50`` band exists for (unseen
  unigrams explode perplexity against the frozen LM).
- ``mild`` (1, batch 8): clean docs, each with ONE phrase repeated
  once (~30 % intra-doc dup fraction) — the borderline the operator
  has to place the band around.
- ``empty`` (1, batch 14): near-empty docs (≤1 token — a crawler
  returning blank bodies).  Every per-doc signal is NULL in this
  batch, so NO pre-round-12 band could fire: the class the
  ``ppl_null_frac`` band exists for.

For each band setting the stream runs end-to-end (fresh store/output/
signals tables per run) and the per-batch quarantine verdicts are read
back from the signals commit metas.  Reported per band: trip set,
recall on hard-planted defects (spam+shift), false trips on clean, and
the mild batch's verdict — the sensitivity curve an operator reads to
pick the band.  Deterministic (seeded generators, fixed batch plan).

Usage: python tools/bench_gate_soak.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPAM_BATCHES = {5, 11}
SHIFT_BATCH = 13
MILD_BATCH = 8
EMPTY_BATCH = 14
N_BATCHES = 16
DOCS_PER_BATCH = 8

# the clean corpus's learnable structure: 80 five-word phrases over a
# 120-word vocabulary, interleaved with doc-unique separator tokens.
# Harness calibration (two failed drafts, both instructive): uniform-
# random tokens gave the bigram LM nothing to anchor on (clean and
# shifted batches scored near-identical smoothing-mass ppl — no band
# could separate them), and bare phrase CONCATENATION made clean
# batches genuinely self-duplicating as the span store accumulated
# phrase-adjacency windows (the dup band tripped 5/11 clean batches —
# correctly: that harness simulated a near-dup corpus).  The unique
# separators make every 8-token window contain a doc-unique token —
# clean cross-doc window repeats become impossible BY CONSTRUCTION
# (phrases are 5 < 8 tokens) while the LM still learns the in-phrase
# bigrams, so the dup band measures only the PLANTED defects.
_PHRASE_RNG = np.random.default_rng(11)
_VOCAB = [f"w{i}" for i in range(120)]
_PHRASES = [
    " ".join(_VOCAB[j] for j in _PHRASE_RNG.integers(0, 120, 5))
    for _ in range(80)
]


def _clean_doc(rng, did) -> str:
    picks = rng.integers(0, len(_PHRASES), 4)
    return " ".join(
        f"{_PHRASES[j]} uq{did}x{k}" for k, j in enumerate(picks)
    )


def make_batches() -> list[tuple[str, list[tuple[int, str]]]]:
    rng = np.random.default_rng(7)
    shift_vocab = [f"zz{i}" for i in range(400)]
    batches = []
    for b in range(N_BATCHES):
        rows = []
        for i in range(DOCS_PER_BATCH):
            did = 1000 * b + i
            if b in SPAM_BATCHES:
                text = " ".join(["grab this deal now"] * 10) + f" uq{did}"
            elif b == SHIFT_BATCH:
                text = " ".join(
                    shift_vocab[j] for j in rng.integers(0, 400, 22)
                )
            elif b == MILD_BATCH:
                phrase = _PHRASES[int(rng.integers(0, len(_PHRASES)))]
                text = f"{_clean_doc(rng, did)} {phrase} {phrase} {phrase}"
            elif b == EMPTY_BATCH:
                text = "" if i % 2 == 0 else f"uq{did}"
            else:
                text = _clean_doc(rng, did)
            rows.append((did, text))
        kind = (
            "spam" if b in SPAM_BATCHES
            else "shift" if b == SHIFT_BATCH
            else "mild" if b == MILD_BATCH
            else "empty" if b == EMPTY_BATCH
            else "clean"
        )
        batches.append((kind, rows))
    return batches


def run_soak(spark, band: dict) -> dict:
    from readwise_vector_db_spark.jobs.incremental_dedup import (
        run_incremental_span_dedup,
    )
    from readwise_vector_db_spark.operators.lm import train_bigram_lm
    from readwise_vector_db_spark.sources.versioned import VersionedTable

    batches = make_batches()
    work = tempfile.mkdtemp(prefix="gate_soak_")
    try:
        src = f"{work}/incoming"
        schema = "doc_id LONG, text STRING"
        for i, (_, rows) in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite" if i == 0 else "append"
            ).parquet(src)
        # the frozen LM trains on a clean-distribution sample larger
        # than one batch (5 batches' worth) — the reference-model
        # regime; training on a single 8-doc batch leaves even the
        # clean phrases half-unseen
        lm_rows = [
            (i, _clean_doc(np.random.default_rng(100 + i), 10_000 + i))
            for i in range(80)
        ]
        model = train_bigram_lm(
            spark.createDataFrame(lm_rows, schema), min_count=1
        )
        store_root, out_dir = f"{work}/store", f"{work}/out"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        run_incremental_span_dedup(
            spark, stream, store_root, out_dir,
            signals_lm=model,
            signals_gate={**band, "on_drift": "quarantine"},
        ).awaitTermination(600)
        sig = VersionedTable(f"{out_dir}_signals")
        verdicts = {
            m["batch_id"]: bool(m.get("quarantined", False))
            for _, m in sig.commit_metas()
        }
        reasons = {
            m["batch_id"]: m["quarantine_reason"].split(";")[0][:90]
            for _, m in sig.commit_metas()
            if m.get("quarantine_reason")
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    kinds = {i: k for i, (k, _) in enumerate(batches)}
    tripped = sorted(b for b, q in verdicts.items() if q)
    hard = SPAM_BATCHES | {SHIFT_BATCH, EMPTY_BATCH}
    clean = [b for b, k in kinds.items() if k == "clean"]
    return {
        "band": band,
        "tripped": tripped,
        "hard_recall": sum(1 for b in hard if verdicts.get(b)) / len(hard),
        "clean_false_trips": sum(1 for b in clean if verdicts.get(b)),
        "n_clean": len(clean),
        "mild_tripped": bool(verdicts.get(MILD_BATCH)),
        "empty_tripped": bool(verdicts.get(EMPTY_BATCH)),
        "shift_tripped": bool(verdicts.get(SHIFT_BATCH)),
        "reasons": reasons,
    }


def main() -> int:
    from readwise_vector_db_spark.session import get_spark

    spark = get_spark("gate-soak")
    default = {"min_ref": 2}  # library defaults: ppl 1.5x, dup +0.15, null +0.3
    sweeps = [
        ("default", default),
        # the pre-round-12 blindness, kept as the control: with the
        # null band disabled, the degenerate (near-empty-doc) batch has
        # every per-doc signal NULL and no band can see it
        ("null-off", {**default, "max_ppl_null_delta": 2.0}),
        *[
            (f"dup+{d}", {**default, "max_dup_frac_delta": d})
            for d in (0.05, 0.30, 0.60)
        ],
        *[
            (f"ppl{r}x", {**default, "max_ppl_ratio": r})
            for r in (1.1, 2.0, 4.0)
        ],
    ]
    results = []
    for name, band in sweeps:
        r = run_soak(spark, band)
        r["name"] = name
        results.append(r)
        print(json.dumps(r), flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
