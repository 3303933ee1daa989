#!/usr/bin/env python3
"""Empty-document parity fixture (driver-side tool, like check.py).

Writes a tiny documents.parquet containing an EMPTY document and a
WHITESPACE-ONLY document placed adjacently, so the d03/d06/t08/q34
empty-text oracle guards (DuckDB split('') = [''], 0/0 Jaccard) are
exercised end-to-end against the real DuckDB compare:

    python3 tools/empty_fixture.py /tmp/efix
    sbt "runMain graft.Verify /tmp/efix /tmp/efix_out \
         d03_adjacent_jaccard d06_dedup_clusters t08_repetition q34_recursive_cte \
         t22_bigram_xent t23_interp_xent t24_trigram_xent t37_fourgram_xent t25_ccnet_buckets t26_dsir_weights t27_data_card d19_substring_stats d29_substring_cut d33_substring_cut_keep1 t28_bpe_pairs t29_c4_line_filters t30_bpe_apply t40_bpe_train t44_bpe_train_deep t45_bpe_apply_heldout t41_bpe_tokenize t31_pmi_collocations t32_source_kl d25_selfdedup_lines t33_eval_leakage d27_snapshot_delta d28_dup_histogram t34_edu_score t35_signal_corr t36_leakage_by_source t42_winnowing t43_chunk_windows d30_winnow_pairs d31_winnow_match_spans d32_winnow_match_slices s28_chunk_retrieval s29_chunk_lsh_recall s30_chunk_multiprobe s31_chunk_multiprobe2 s32_chunk_retrieval_lsh s33_chunk_multiprobe_topk s34_chunk_band_recall s35_chunk_band_topk s36_chunk_band_sweep s37_chunk_lsh_recall_wide s38_chunk_band_topk_wide t47_decontaminate_cut t46_bpe_apply_blocked"
    python3 tools/check.py /tmp/efix /tmp/efix_out

EmptyDocParitySpec mirrors these rows in Scala and pins the engine-side
values; this script + check.py is the cross-engine half of the gate.
"""
import sys
import pandas as pd

ROWS = [
    # (doc_id, text, lang, source) — n_chars derived. doc 2 is empty and
    # doc 3 whitespace-only (ADJACENT: the d03/q34 0/0 pair); docs 0-5 all
    # share (en, web, len_band 0) so d06's block contains the 0/0 pair too;
    # (0,1) is an exact dup (edge at both thresholds) and (4,5) a near dup
    # (Jaccard 7/9 ≈ 0.778: d06 edge at >=0.6, NO q34 edge at >=0.85).
    (0, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2, "",                                            "en", "web"),
    (3, "   ",                                         "en", "web"),
    (4, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"),
    (5, "alpha beta gamma delta epsilon zeta eta iota",  "en", "web"),
    (6, "uno dos tres cuatro cinco",                   "es", "news"),
]


def main():
    out_dir = sys.argv[1]
    import os
    os.makedirs(out_dir, exist_ok=True)
    df = pd.DataFrame(
        [(i, t, l, s, len(t)) for (i, t, l, s) in ROWS],
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    df = df.astype({"doc_id": "int64", "n_chars": "int64"})
    path = os.path.join(out_dir, "documents.parquet")
    df.to_parquet(path, index=False)
    print(f"wrote {len(df)} docs -> {path}")


if __name__ == "__main__":
    main()
