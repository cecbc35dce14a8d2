"""Query/operator layer.

``ALL_QUERIES`` maps query name -> (spark_fn, oracle_sql | None); the
driver contract in __spark_entry__.py is assembled from it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from . import (
        asof,
        cdc_query,
        chunking,
        coverage,
        curation,
        dedup_cluster,
        dedup_incremental,
        dedup_text,
        incremental,
        ivm,
        lm_quality,
        medallion,
        multimodal,
        packing,
        rangejoin,
        repetition,
        sampling,
        scd,
        selection,
        sessionize,
        similarity,
        sketch,
        textops,
    )

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        medallion,
        cdc_query,
        incremental,
        coverage,
        textops,
        repetition,
        dedup_text,
        dedup_cluster,
        dedup_incremental,
        ivm,
        curation,
        lm_quality,
        selection,
        sampling,
        similarity,
        sketch,
        asof,
        rangejoin,
        sessionize,
        scd,
        packing,
        chunking,
        multimodal,
    ):
        out.update(mod.QUERIES)
    missing = [n for n in DRIVER_WINDOW if n not in out]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names unknown queries: {missing}")
    ordered = {n: out[n] for n in DRIVER_WINDOW}
    ordered.update({n: v for n, v in out.items() if n not in ordered})
    return ordered


# The round driver gates only the FIRST 50 ``queries()`` entries in
# insertion order (confirmed against CORRECTNESS_r03.json — exactly
# list(queries())[:50]). This list pins the window deliberately instead
# of leaving it to module-update order. Round-5 rotation policy
# (VERDICT r4 task 1): every r4-first-green entry KEEPS its slot for a
# second green row; the five r2-single-green queries and the four
# r3-single-green queries rotate back IN; the two new r5
# bounded-state-percentile gates take slots; eleven entries with ≥3
# green rows (CDC flagships cdc_replay_mor/dml/constrained/merge_into/
# convert/restore [2,3,4], incremental_gold_by_source [2,3,4],
# cobertura_sucursal_marca [2,3,4], coverage_two_level [1,2,3,4],
# vocab_top_words [3,4], training_mix_sample [3,4]) rotate OUT — their
# evidence base is the deepest in the repo. After an all-green r5 gate
# every pre-r5 queries() entry has ≥2 green rows (verified against
# CORRECTNESS_r01-r04: no out-of-window entry has fewer than 2; the
# two new r5 gates get their first). Keep len == 50 and update the
# rotation each round; tests/test_driver_contract_window.py pins the
# invariants.
DRIVER_WINDOW: tuple[str, ...] = (
    # r4-first-green — kept for a second green row
    "near_dup_clusters",
    "cdc_incremental_signatures",
    "curated_training_mix",
    "ann_ivf_topk",
    "kmv_distinct_users",
    "hll_distinct_users",
    "cms_word_counts",
    "asof_attribution",
    "view_purchase_range_join",
    "user_sessions",
    "scd2_user_type",
    "packed_sequences",
    "multimodal_meta",  # green r2+r4 — third row closes its gap-year
    "tokenize_documents",  # red r3 (canonicalizer), green r4
    "sig_rebootstrap_after_restore",
    "curated_mix_over_mor_corpus",
    # CDC flagship visibility: the two family anchors stay (greens
    # [1,2,3,4] and [2,3,4]); the other six flagships rotate out with
    # three green rows each
    "cdc_replay_latest_state",
    "cdc_change_feed",
    "cdc_wap_publish_state",
    "cdc_redrive_reconverge",
    "cdc_schema_evolution_state",
    "doc_repetition_stats",
    "source_token_drift",
    "cobertura_vendedor_generico",
    "token_ngram_decontaminate",
    "train_val_test_split",
    "dup_span_stats",
    "pii_scrub_stats",
    "semdedup_prune",
    "semantic_curated_mix",
    "doc_chunk_inventory",
    "lm_perplexity_filter",
    "token_budget_selection",
    "stratified_sample_k",
    "temperature_mix_weights",
    "dup_span_removal",
    "packed_batch_payloads",
    "shuffled_shards",
    "ivm_source_stats",
    # r2-single-green set, back in for a second green row (VERDICT r4
    # task 1 — rotated out late-r4 before re-check; take the slots of
    # cdc_replay_mor_state / cdc_dml_state / cdc_constrained_replay /
    # cdc_merge_into_state / cdc_convert_documents, each green [2,3,4])
    "simhash_clusters",
    "embedding_near_dup_pairs",
    "ann_topk_bruteforce",
    "ann_lsh_topk",
    "embedding_centroid_distance",
    # r3-single-green set, back in for a second green row (take the
    # slots of cdc_restore_reconverge / incremental_gold_by_source /
    # cobertura_sucursal_marca [each 2,3,4] and vocab_top_words [3,4])
    "cobertura_sucursal_aguas",
    "cobertura_sucursal_generico",
    "decontaminate_against_benchmark",
    "doc_length_percentiles",
    # new in r5: tolerance-banded oracles for the bounded-state
    # (approx_percentile) formulations — VERDICT r4 task 3 (take the
    # slots of coverage_two_level [1,2,3,4] and training_mix_sample
    # [3,4])
    "doc_length_percentiles_approx",
    "lm_cutoffs_approx",
)
