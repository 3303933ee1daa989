#!/usr/bin/env python3
"""Structured-text fixture (driver-side tool, like empty_fixture.py).

The driver's synthetic documents have no newlines and no digits, so the
line-level dedup (d11/d12) and PII (t14/t15) surfaces are degenerate
there: well-defined and oracle-green, but every doc is one line and every
count is zero. This writes a documents.parquet with REALISTIC structure —
multi-line docs, shared boilerplate lines, blank/whitespace lines, leading
indentation (trim canonicalization), emails / phones / IPv4s / long digit
runs, empty and whitespace-only docs, and digitless source names (the t12
guard) — so those operators are exercised non-degenerately end-to-end
against the real DuckDB compare:

    python3 tools/structured_text_fixture.py /tmp/sfix
    sbt "runMain graft.Verify /tmp/sfix /tmp/sfix_out \
         d11_line_dedup d12_boilerplate_lines d13_paragraph_dedup \
         d14_dedup_collapse t14_pii_counts t15_pii_redact t16_redact_rescore \
         d17_incremental_dedup \
         d01_exact_dedup t01_token_stats t08_repetition t12_source_mix \
         t21_temperature_mix t22_bigram_xent t23_interp_xent t24_trigram_xent t37_fourgram_xent t25_ccnet_buckets t26_dsir_weights t27_data_card d19_substring_stats d29_substring_cut d33_substring_cut_keep1 t28_bpe_pairs t29_c4_line_filters t30_bpe_apply t40_bpe_train t44_bpe_train_deep t45_bpe_apply_heldout t41_bpe_tokenize t31_pmi_collocations t32_source_kl d25_selfdedup_lines t33_eval_leakage d27_snapshot_delta d28_dup_histogram t34_edu_score t35_signal_corr t36_leakage_by_source t42_winnowing t43_chunk_windows d30_winnow_pairs d31_winnow_match_spans d32_winnow_match_slices s28_chunk_retrieval s29_chunk_lsh_recall s30_chunk_multiprobe s31_chunk_multiprobe2 s32_chunk_retrieval_lsh s33_chunk_multiprobe_topk s34_chunk_band_recall s35_chunk_band_topk s36_chunk_band_sweep s37_chunk_lsh_recall_wide s38_chunk_band_topk_wide t47_decontaminate_cut t46_bpe_apply_blocked"
    python3 tools/check.py /tmp/sfix /tmp/sfix_out

    Keep that query list in sync with every operator that reads document
    STRUCTURE (lines, paragraphs, digits) — an oracle verified only on the
    driver's newline-free, digit-free text is under-verified (the t01
    n_subwords divergence hid exactly that way).

StructuredTextParitySpec mirrors a hand-computed subset of these shapes in
Scala and pins the engine-side values; this script + check.py is the
cross-engine half of the gate. Deterministic: seeded PRNG, no time or env
input.
"""
import os
import random
import sys

import pandas as pd

BOILERPLATE = [
    "All rights reserved by the publisher.",
    "Subscribe to our newsletter for weekly updates.",
    "Click here to read the full article.",
    "Terms of service apply to every visitor.",
    "Share this story on your favorite network.",
    "Copyright 2024 Example Media Group.",
]

PII_LINES = [
    "Contact us at support@example.com for help.",
    "Email archive.team+crawl@web-archive.org with questions.",
    "Call 555-123-4567 during office hours.",
    "Fax (202) 555-0176 or phone 555.867.5309 anytime.",
    "Server logs list 192.168.1.10 and 10.0.0.254 today.",
    "Invoice 1234567890 was settled, order 98765432 pending.",
]

# THE hot key: a nav line appearing in ~85% of docs. The d11 family's
# first-occurrence pass must stay a partial-aggregated groupBy, not a
# digest window — this line makes the skew real in the fixture gate (a
# window would funnel ~85% of instance rows into one task), so the
# de-skewed shape is exercised against the oracle, not assumed.
HOT_LINE = "Home | About | Contact"

WORDS = (
    "crawl stream archive harvest frontier queue robots sitemap fetch parse "
    "render index dedup shard replica latency throughput budget policy "
    "capture snapshot warc surt revisit mime checksum outlink hop seed scope"
).split()

LANGS = ["en", "en", "en", "es", "de"]
# digitless names on purpose: every query on this fixture re-runs the t12
# digitless-source guard (ADVICE r6) through the real oracle compare
SOURCES = ["web", "news", "forum", "blog"]


def main():
    out_dir = sys.argv[1]
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(42)
    docs = []
    for i in range(150):
        n = rng.randint(2, 8)
        lines = []
        if rng.random() < 0.85:  # the skewed nav header (HOT_LINE doc)
            lines.append(HOT_LINE)
        if rng.random() < 0.7:  # most docs open with chrome
            lines.append(rng.choice(BOILERPLATE))
        while len(lines) < n:
            r = rng.random()
            if r < 0.15:
                lines.append(rng.choice(BOILERPLATE))
            elif r < 0.30:
                lines.append(rng.choice(PII_LINES))
            elif r < 0.38:
                lines.append("")  # blank line inside the doc
            elif r < 0.44:  # leading indentation: trim canonicalization
                lines.append("   " + rng.choice(BOILERPLATE))
            else:
                k = rng.randint(4, 12)
                lines.append(
                    " ".join(rng.choice(WORDS) for _ in range(k)) + ".")
        text = "\n".join(lines) + ("\n" if rng.random() < 0.3 else "")
        docs.append((i, text, rng.choice(LANGS), rng.choice(SOURCES)))
    # edge docs: empty, whitespace-lines-only, all-boilerplate, exact dup,
    # and an int-OVERFLOWING digit run in the source name (t12's try_cast
    # guard: both engines must answer rate index 0, not crash vs answer)
    docs.append((150, "", "en", "web"))
    docs.append((151, "   \n  \n", "en", "news"))
    docs.append((152, "\n".join(BOILERPLATE), "en", "web"))
    docs.append((153, docs[0][1], docs[0][2], docs[0][3]))
    docs.append((154, "archived snapshot body with enough letters here",
                 "en", "crawl20240101120000"))
    # C4 line-filter triggers (t29): each drop rule fired at least once,
    # plus a keeper line, in one doc — and a doc whose every line drops
    docs.append((155, "\n".join([
        "Too few.",                                       # short (< 4 words)
        "function render() { return body; }",             # brace
        "Please enable JavaScript to view this page.",    # javascript
        "Lorem ipsum dolor sit amet, consectetur elit.",  # lorem (first match)
        "This sentence has enough words and ends well.",  # keeps
        "this line just trails off with no punctuation",  # no_punct
        'He said "it ends with a quote."',                # keeps (quote end)
    ]), "en", "web"))
    docs.append((156, "menu\nnav\nfooter", "en", "web"))  # all short

    df = pd.DataFrame(
        [(i, t, l, s, len(t)) for (i, t, l, s) in docs],
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    df = df.astype({"doc_id": "int64", "n_chars": "int64"})
    path = os.path.join(out_dir, "documents.parquet")
    df.to_parquet(path, index=False)
    print(f"wrote {len(df)} docs -> {path}")


if __name__ == "__main__":
    main()
