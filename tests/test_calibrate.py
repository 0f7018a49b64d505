"""Threshold calibration sweep over the labeled-pairs oracle."""

from __future__ import annotations

from mix_blink_spark.plans.calibrate import calibrate_threshold, score_labeled_pairs


def test_calibration_sweep(spark, corpus):
    pages = corpus["pages"]
    golds = corpus["mentions_gold"]
    labeled = corpus["labeled_pairs"]
    spans = golds.select("url", "mention_id", "start", "end")

    scored = score_labeled_pairs(spark, pages, spans, labeled)
    assert scored.count() == labeled.count()

    table = calibrate_threshold(scored)
    rows = table.collect()
    assert len(rows) == 25
    best = rows[0]
    # direct-pair scores alone should separate the fixture's labeled set
    # well; the pipeline's default tau_mm (0.82) must sit in a
    # high-F1 region of the sweep
    assert best["f1"] >= 0.9, best
    by_tau = {r["tau"]: r["f1"] for r in rows}
    assert by_tau[0.82] >= 0.85
    # sweep is monotone-sane: thresholds beyond all scores score 0 recall
    assert rows[-1]["f1"] <= best["f1"]
