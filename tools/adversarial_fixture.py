#!/usr/bin/env python3
"""Adversarial-text fixture (driver-side tool, third leg of the fixture
gates after empty_fixture.py and structured_text_fixture.py).

Encoding and escaping edge cases the other fixtures don't reach: BMP
accents, CJK, ASTRAL emoji (UTF-16 surrogate pairs — the codepoint vs
code-unit fork), tabs, CRLF line endings, single/double quotes,
backslashes (exercises Verify's oracle-JSON escaping end-to-end), a
10k-char line, intra-doc duplicate lines, and an empty doc:

    python3 tools/adversarial_fixture.py /tmp/xfix
    sbt "runMain graft.Verify /tmp/xfix /tmp/xfix_out \
         d01_exact_dedup d03_adjacent_jaccard d06_dedup_clusters \
         d07_decontaminate d08_boilerplate_ngrams d11_line_dedup \
         d12_boilerplate_lines d13_paragraph_dedup d14_dedup_collapse \
         d17_incremental_dedup \
         t01_token_stats t02_quality_features t03_source_lang_rollup \
         t06_hash_split t07_clean_corpus t08_repetition t12_source_mix \
         t13_pack_bins t14_pii_counts t15_pii_redact t16_redact_rescore \
         t21_temperature_mix t22_bigram_xent t23_interp_xent t24_trigram_xent t37_fourgram_xent t25_ccnet_buckets t26_dsir_weights t27_data_card d19_substring_stats d29_substring_cut d33_substring_cut_keep1 t28_bpe_pairs t29_c4_line_filters t30_bpe_apply t40_bpe_train t44_bpe_train_deep t45_bpe_apply_heldout t41_bpe_tokenize t31_pmi_collocations t32_source_kl d25_selfdedup_lines t33_eval_leakage d27_snapshot_delta d28_dup_histogram t34_edu_score t35_signal_corr t36_leakage_by_source t42_winnowing t43_chunk_windows d30_winnow_pairs d31_winnow_match_spans d32_winnow_match_slices s28_chunk_retrieval s29_chunk_lsh_recall s30_chunk_multiprobe s31_chunk_multiprobe2 s32_chunk_retrieval_lsh s33_chunk_multiprobe_topk s34_chunk_band_recall s35_chunk_band_topk s36_chunk_band_sweep s37_chunk_lsh_recall_wide s38_chunk_band_topk_wide t47_decontaminate_cut t46_bpe_apply_blocked \
         q34_recursive_cte"
    python3 tools/check.py /tmp/xfix /tmp/xfix_out   # 44/44 OK

(Signature-vector queries — d04/d05/d09/d10/t04/t05, s04, and the
d16/d16s/d18/d20/d26 family whose oracles embed the d04 signature VALUES — carry
driver-data-specific VALUES and are excluded by design.)

First run of this gate caught the t01 astral divergence: the engine pins
Spark's composed-regex semantics where the subword split falls between
surrogate HALVES (an emoji = two pieces), while DuckDB regex counts
codepoints — the oracle now adds one per astral char. Everything else
(unicode md5 over UTF-8, codepoint len() on both engines, CRLF, quote/
backslash escaping through oracle_sql.json) agrees with no adjustment.
"""
import os
import sys

import pandas as pd

ROWS = [
    (0, "plain ascii baseline document with enough letters", "en", "web"),
    (1, "café déjà vu naïve résumé — BMP accents and a dash", "en", "web"),
    (2, "日本語のテキストです 中文文本 한국어 텍스트", "ja", "web"),
    (3, "emoji 🙂 inside 🚀 the text 🎉 three astral chars", "en", "news"),
    (4, "tab\tseparated\tcolumns and\r\ncrlf line endings here", "en", "web"),
    (5, "single 'quotes' and double \"quotes\" and back\\slash", "en", "web"),
    (6, "x" * 5000 + " one very long line " + "y" * 5000, "en", "web"),
    (7, "mixed 🙂 emoji\nnew line\twith tab é accent", "en", "news"),
    (8, "", "en", "web"),
    (9, "line one\nline one\nline two\nline one", "en", "web"),
]


def main():
    out_dir = sys.argv[1]
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
