"""Fellegi-Sunter EM linkage: behavior on a planted-duplicate corpus.

The q64 DuckDB-oracle parity (identical unrolled arithmetic) lives in
test_entry_oracle.py; here the *model* is checked — does EM actually
separate planted matches from non-matches, and are the fitted
parameters proper probability vectors?
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.linkage import (
    DOCUMENT_COMPARISONS,
    document_comparison_vectors,
    em_fellegi_sunter,
)


@pytest.fixture(scope="module")
def scored(spark):
    # 40 base docs; even ids get a near-identical twin at id+1000 (one
    # token changed), odd ids get an unrelated partner — so pairs
    # (i, i+1000) are half planted matches, half planted non-matches.
    rows = []
    for i in range(40):
        text = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i} theta{i}"
        lang = f"l{i % 3}"
        rows.append((i, text, lang, len(text)))
        if i % 2 == 0:
            twin = text.replace(f"theta{i}", "omega")
            rows.append((i + 1000, twin, lang, len(twin)))
        else:
            other = f"unrelated{i} words{i} entirely{i} different{i} corpus{i}"
            rows.append((i + 1000, other, f"l{(i + 1) % 3}", len(other)))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    pairs = spark.createDataFrame(
        [(i, i + 1000) for i in range(40)], "id_a long, id_b long"
    )
    gammas = document_comparison_vectors(docs, pairs).persist()
    params, out = em_fellegi_sunter(gammas, DOCUMENT_COMPARISONS, iters=5)
    rows = {r["id_a"]: r for r in out.collect()}
    gammas.unpersist()
    return params, rows


def test_params_are_probability_vectors(scored):
    params, _ = scored
    assert 0.0 < params["lambda"] < 1.0
    for c in DOCUMENT_COMPARISONS:
        for kind in ("m", "u"):
            vec = params[f"{kind}_{c.name}"]
            assert len(vec) == c.levels
            assert all(v >= 0.0 for v in vec)
            assert sum(vec) == pytest.approx(1.0, abs=1e-9)


def test_em_separates_planted_matches(scored):
    params, rows = scored
    match_probs = [rows[i]["match_prob"] for i in range(0, 40, 2)]
    nonmatch_probs = [rows[i]["match_prob"] for i in range(1, 40, 2)]
    # every planted twin outranks every planted non-match
    assert min(match_probs) > max(nonmatch_probs)
    assert min(match_probs) > 0.9
    assert max(nonmatch_probs) < 0.1
    # lambda approaches the planted match rate (0.5)
    assert params["lambda"] == pytest.approx(0.5, abs=0.05)


def test_match_weight_sign_agrees_with_prob(scored):
    _, rows = scored
    for r in rows.values():
        # NULL weight = an m/u level collapsed to exactly 0 (infinite
        # Bayes factor) — legal on a perfectly-separated corpus
        if r["match_weight"] is None:
            continue
        if r["match_prob"] > 0.75:
            assert r["match_weight"] > 0
        if r["match_prob"] < 0.25:
            assert r["match_weight"] < 0


def test_higher_gamma_never_lowers_prob(scored):
    """Posterior is monotone in each gamma when the fitted m/u are —
    check the fitted text comparison orders its Bayes factors."""
    params, _ = scored
    m, u = params["m_gamma_text"], params["u_gamma_text"]
    bf = [
        (m[lvl] / u[lvl]) if u[lvl] > 0 else float("inf")
        for lvl in range(3)
        if m[lvl] + u[lvl] > 0
    ]
    assert bf == sorted(bf)


def test_score_with_params_matches_fit_scoring(spark, scored):
    """Delta batches scored under the persisted params equal the fitting
    path's own scoring — fit once, score forever."""
    from dedupe_spark.operators.linkage import score_with_params

    params, rows = scored
    docs = spark.createDataFrame(
        [
            (1, "alpha0 beta0 gamma0 delta0 epsilon0 zeta0 eta0 theta0", "l0", 54),
            (2, "alpha0 beta0 gamma0 delta0 epsilon0 zeta0 eta0 omega", "l0", 53),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    g = document_comparison_vectors(docs, pairs)
    (r,) = score_with_params(g, DOCUMENT_COMPARISONS, params).collect()
    # near-identical twin under the fitted model -> confident match
    assert r["match_prob"] > 0.9


def test_reciprocal_best_links_one_to_one(spark):
    """Every left/right id appears at most once, the kept links are
    reciprocal bests, and ties break to the smaller partner id."""
    from dedupe_spark.operators.linkage import reciprocal_best_links

    pairs = spark.createDataFrame(
        [
            # a1's best is b1 (0.9) and vice versa -> kept
            (1, 101, 0.9), (1, 102, 0.5),
            (2, 101, 0.7),  # b101's best is a1, so a2-b101 dropped
            # a3 ties between b103/b104 at 0.8 -> tie-break to b103;
            # b103's best is a3 -> kept
            (3, 103, 0.8), (3, 104, 0.8),
            # b104's BEST is a3 (0.8 > 0.6), but a3 chose b103 — so
            # (4, 104) is not reciprocal and b104 stays unmatched this
            # round (reciprocal-best returns a conflict-free SUBSET)
            (4, 104, 0.6),
        ],
        "id_a long, id_b long, score double",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in reciprocal_best_links(pairs, "id_a", "id_b", "score").collect()
    }
    assert got == {(1, 101), (3, 103)}
    # one-to-one by construction
    assert len({a for a, _ in got}) == len(got)
    assert len({b for _, b in got}) == len(got)


def test_tf_adjustment_rare_value_beats_common(spark):
    """Two pairs agreeing on lang with identical gammas: the one agreeing
    on the RARE lang ends up with the higher adjusted weight, the common
    lang is penalized below the generic weight, and disagreeing pairs
    keep the base weight."""
    from dedupe_spark.operators.linkage import (
        score_with_params,
        term_frequencies,
        tf_adjusted_weights,
    )

    # 9 common-lang docs, 1 rare-lang doc
    docs = spark.createDataFrame(
        [(i, "en" if i < 9 else "xx") for i in range(10)], "doc_id long, lang string"
    )
    tf = term_frequencies(docs, "lang")
    got = {r["value"]: r["tf"] for r in tf.collect()}
    assert got == {"en": pytest.approx(0.9), "xx": pytest.approx(0.1)}

    params = {"lambda": 0.5}
    for c in DOCUMENT_COMPARISONS:
        params[f"m_{c.name}"] = list(c.init_m)
        params[f"u_{c.name}"] = list(c.init_u)
    gammas = spark.createDataFrame(
        [
            (1, 2, 2, 1, 2, "en"),   # agree on common lang
            (3, 4, 2, 1, 2, "xx"),   # agree on rare lang
            (5, 6, 2, 0, 2, "en"),   # disagree on lang
        ],
        "id_a long, id_b long, gamma_text int, gamma_lang int, gamma_len int, lang string",
    )
    scored = score_with_params(gammas, DOCUMENT_COMPARISONS, params)
    u_agree = next(c for c in DOCUMENT_COMPARISONS if c.name == "gamma_lang").init_u[1]
    out = {
        r["id_a"]: r
        for r in tf_adjusted_weights(
            scored, tf, "lang", "gamma_lang", u_agree=u_agree, agree_level=1
        ).collect()
    }
    import math

    # rare-lang agreement gains weight, common-lang agreement loses it
    assert out[3]["tf_adj_weight"] > out[3]["match_weight"]
    assert out[1]["tf_adj_weight"] < out[1]["match_weight"]
    assert out[3]["tf_adj_weight"] > out[1]["tf_adj_weight"]
    # the adjustment is exactly log2(u_agree / tf_v)
    assert out[1]["tf_adj_weight"] - out[1]["match_weight"] == pytest.approx(
        math.log2(u_agree / 0.9)
    )
    # disagreeing pair untouched
    assert out[5]["tf_adj_weight"] == pytest.approx(out[5]["match_weight"])


def test_unlinkables_histogram_hand_computed(spark):
    """Hand-built scored pairs: per-record best weight, bins, and the
    cumulative count; NULL weights drop out of the max."""
    from dedupe_spark.operators.linkage import unlinkables_histogram

    scored = spark.createDataFrame(
        [
            (1, 2, 5.3),    # best for 1 and 2
            (1, 3, -2.1),   # 3's only (and best) weight
            (4, 5, None),   # both all-NULL -> excluded
            (3, 4, -2.9),   # lifts 4 out of the NULL bucket
        ],
        "id_a long, id_b long, match_weight double",
    )
    rows = {
        r["weight_bin"]: (r["n_records"], r["cum_records"])
        for r in unlinkables_histogram(scored).collect()
    }
    # best: 1 -> 5.3 (bin 5), 2 -> 5.3 (bin 5), 3 -> -2.1 (bin -3),
    # 4 -> -2.9 (bin -3); 5 excluded (all NULL)
    assert rows == {-3.0: (2, 2), 5.0: (2, 4)}
