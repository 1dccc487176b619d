"""The language-ID heuristic must discriminate on planted-language docs
— not just agree with its own oracle (the testdata's text is
English-ish under every `lang` label, so the plain lang_id gate is
parity-only; this fixture makes the marker lists falsifiable)."""

SF = "/root/testdata/sf0.01"


def test_planted_language_accuracy(spark):
    from gpiv_spark.queries_text import PLANT_SENT, q_lang_id_planted

    rows = q_lang_id_planted(spark, SF).collect()
    by_true: dict[str, dict[str, int]] = {}
    for r in rows:
        by_true.setdefault(r["true_lang"], {})[r["pred_lang"]] = r["n_docs"]
    assert set(by_true) == set(PLANT_SENT)  # every planted lang present
    for lang, preds in by_true.items():
        total = sum(preds.values())
        correct = preds.get(lang, 0)
        assert correct / total > 0.9, (lang, preds)
        # with the marker-rich fixture the heuristic is in fact exact
        assert preds == {lang: total}, (lang, preds)


def test_markers_discriminate_single_sentences():
    """Unit-level falsifiability: each planted sentence scores strictly
    highest on its own language's marker list."""
    from gpiv_spark.functions.text import LANG_MARKERS
    from gpiv_spark.queries_text import PLANT_SENT

    for lang, sent in PLANT_SENT.items():
        padded = f" {sent} "
        scores = {
            cand: sum(padded.count(m) for m in ms)
            for cand, ms in LANG_MARKERS.items()
        }
        best = max(scores.values())
        winners = [c for c, s in scores.items() if s == best]
        assert winners == [lang], (lang, scores)
