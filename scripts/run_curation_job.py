"""End-to-end training-data curation job: the whole operator library in one
runnable pipeline over a documents corpus.

    python scripts/run_curation_job.py [--sf-dir /root/testdata/sf0.001]
                                       [--out /tmp/curated] [--cores 8]

Stages (each one a library operator — this script only chains them):

0. URL gates [opt]             (--blocklist PATH: UT1-style domain suffix
                                filter; --max-per-domain K: registrable-
                                domain quota cap — both need --url-col)
1. exact dedup                 (fingerprint hash-agg, min-id representative)
2. MinHash near-dedup          (LSH bands, connected-components keep rule)
3. benchmark decontamination   (shingle overlap vs a held-out eval slice)
4. PII scrub                   (native regexp email/IPv4/phone redaction)
5. boilerplate cut [opt]       (--cut-dup-ngram N: remove cross-doc
                                duplicated runs of >= N tokens)
5b. C4 line gate [opt]         (--c4-lines MIN_WORDS: keep sentence-like
                                lines only, drop docs left empty)
6. quality gate                (quality score + Gopher repetition fractions)
6b. classifier gate [opt]      (--classifier-weights PATH + --min-score:
                                hashed-BoW linear model score, FineWeb-
                                style learned filter; keeps 'score')
6c. perplexity gate [opt]      (--max-ppl X: drop docs above X under a
                                corpus-fit add-alpha unigram LM)
7. language filter             (native n-gram language id)
7b. DSIR selection [opt]       (--dsir-target PATH + --dsir-k K: keep the
                                K docs whose hashed-n-gram distribution
                                best matches the target corpus, ∝ the
                                importance weight — Xie et al. 2023)
8. stratified sample [opt]     (--sample '{"src":frac,...}': per-source
                                hash-threshold downsampling)
9. source mixture weights      (count^alpha tempered mixing)
10. train/val/test split       (portable hash buckets)
11. sequence-packing manifest  (concat-then-chunk offsets, train split)

Outputs under --out: ``curated/`` (parquet corpus with weights + split),
``packing/`` (chunk manifest), ``dedup_index/`` (the MinHash representative
index: id, shingle set, signature), and one summary JSON line on stdout
with per-stage row counts — the shape a 100 TB run would emit to its log.

Incremental mode (``--incremental``): when ``dedup_index/`` already exists
under --out, the near-dedup stage treats the input as a corpus DELTA and
runs :func:`incremental_minhash_dedup` against the stored index — the
previously-ingested corpus is never re-read or re-sketched — then writes
the survivors-extended index back. This is how the curation pipeline
composes with the CDC engine: each committed batch of new pages flows
through this job with the index as carried state.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--max-dup-3gram", type=float, default=0.5)
    ap.add_argument("--langs", default="en,de,fr,es,it")
    ap.add_argument("--chunk-tokens", type=int, default=512)
    ap.add_argument("--min-jaccard", type=float, default=0.8)
    ap.add_argument("--cut-dup-ngram", type=int, default=0,
                    help="if > 0, cut cross-document duplicated runs of "
                         ">= N tokens after decontamination (boilerplate "
                         "removal; rewrites text as the normalized token "
                         "stream)")
    ap.add_argument("--c4-lines", type=int, default=0, metavar="MIN_WORDS",
                    help="if > 0, apply the C4 line-level cleaning gate "
                         "(terminal punctuation, >= MIN_WORDS words, no "
                         "boilerplate markers) before the quality gate and "
                         "drop docs left empty; off by default — the "
                         "synthetic corpus has no sentence punctuation")
    ap.add_argument("--max-ppl", type=float, default=0.0,
                    help="if > 0, fit an add-alpha unigram LM on the "
                         "surviving corpus and drop documents whose "
                         "perplexity exceeds this bound (CCNet-style "
                         "quality gate); off by default")
    ap.add_argument("--sample", default=None,
                    help="JSON dict of per-source keep fractions for "
                         'deterministic stratified sampling, e.g. '
                         '\'{"src0": 1.0, "src1": 0.5}\'; unlisted sources '
                         "are kept")
    ap.add_argument("--incremental", action="store_true",
                    help="near-dedup the input as a DELTA against the "
                         "persisted dedup_index instead of a full pass")
    ap.add_argument("--blocklist", default=None, metavar="PATH",
                    help="parquet of blocked domains (one 'domain' "
                         "column); docs whose --url-col host has any "
                         "listed dot-suffix are dropped BEFORE dedup "
                         "(UT1-style URL filtering, the cheapest gate "
                         "first)")
    ap.add_argument("--max-per-domain", type=int, default=0,
                    help="if > 0, cap each registrable domain of "
                         "--url-col to this many docs (hash-ranked, "
                         "deterministic) before dedup")
    ap.add_argument("--url-col", default="url",
                    help="URL column for --blocklist / --max-per-domain "
                         "(stages error if requested and the column is "
                         "absent)")
    ap.add_argument("--classifier-weights", default=None, metavar="PATH",
                    help="parquet (bucket, weight) hashed-BoW linear "
                         "model; adds a 'score' column and drops docs "
                         "below --min-score after the quality gate "
                         "(FineWeb-style learned filter)")
    ap.add_argument("--min-score", type=float, default=0.5)
    ap.add_argument("--classifier-bias", type=float, default=0.0)
    ap.add_argument("--gopher", action="store_true",
                    help="apply the full Gopher rule bundle (Rae et al. "
                         "2021 A1.1) as a keep/drop gate after the "
                         "heuristic quality gate")
    ap.add_argument("--gopher-min-words", type=int, default=50)
    ap.add_argument("--dsir-target", default=None, metavar="PATH",
                    help="parquet corpus of target-domain documents: keep "
                         "the --dsir-k cleaned docs whose hashed-n-gram "
                         "distribution best matches it (DSIR importance "
                         "resampling, Xie et al. 2023)")
    ap.add_argument("--dsir-k", type=int, default=0)
    ap.add_argument("--dsir-buckets", type=int, default=10_000)
    args = ap.parse_args()
    # fail BEFORE the pipeline runs (every stage materializes a count —
    # a late flag error would waste the whole job)
    if args.dsir_target and args.dsir_k <= 0:
        raise SystemExit("--dsir-target needs --dsir-k > 0")

    from pyspark.sql import functions as F

    from hyped_spark.functions.hashing import tokens_col
    from hyped_spark.functions.text import (
        dup_ngram_frac_col,
        lang_id_col,
        quality_score_col,
    )
    from hyped_spark.operators.curation import (
        pack_offsets,
        source_mixture_weights,
        split_by_hash,
    )
    from hyped_spark.operators.dedup import (
        build_minhash_index,
        decontaminate,
        exact_dedup,
        incremental_minhash_dedup,
        minhash_dedup,
    )
    from hyped_spark.session import get_spark

    spark = get_spark("curation_job", cores=args.cores,
                      shuffle_partitions=args.cores)
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    counts = {"input": docs.count()}

    if (args.blocklist or args.max_per_domain > 0) \
            and args.url_col not in docs.columns:
        raise SystemExit(
            f"--blocklist/--max-per-domain need column {args.url_col!r} "
            f"(corpus has: {docs.columns})"
        )
    if args.blocklist:
        from hyped_spark.operators.curation import filter_blocklisted_urls

        bl = spark.read.parquet(args.blocklist)
        docs = filter_blocklisted_urls(docs, bl, url_col=args.url_col)
        counts["after_blocklist"] = docs.count()
    if args.max_per_domain > 0:
        from hyped_spark.operators.curation import cap_per_domain

        docs = cap_per_domain(docs, url_col=args.url_col,
                              k=args.max_per_domain)
        counts["after_domain_cap"] = docs.count()

    d = exact_dedup(docs)
    counts["after_exact_dedup"] = d.count()

    idx_path = os.path.join(args.out, "dedup_index")
    # crash recovery: a leftover .old with no live index means a previous
    # run died between the two renames of the swap below — roll back
    if os.path.isdir(idx_path + ".old") and not os.path.isdir(idx_path):
        os.rename(idx_path + ".old", idx_path)
    if args.incremental and os.path.isdir(idx_path):
        # delta mode: the stored representative index carries the state;
        # the existing corpus is never re-read or re-sketched
        idx = spark.read.parquet(idx_path)
        counts["index_in"] = idx.count()
        d, updated = incremental_minhash_dedup(
            d, idx, min_jaccard=args.min_jaccard)
        # truncate lineage BEFORE the index swap below: the survivors frame
        # reads the old index files (anti-join against its band table), and
        # every later stage would re-execute that read after they're gone
        d = d.localCheckpoint(eager=True)
        counts["after_minhash_dedup"] = d.count()
        tmp = idx_path + ".next"
        updated.write.mode("overwrite").parquet(tmp)  # updated reads idx_path
        # crash-safe swap: rename old aside, promote new, THEN delete —
        # a death at any point leaves either the old or the new index
        # recoverable (see the .old rollback at startup)
        import shutil
        old = idx_path + ".old"
        shutil.rmtree(old, ignore_errors=True)  # stale from a prior crash
        os.rename(idx_path, old)
        os.rename(tmp, idx_path)
        shutil.rmtree(old)
        # the session FileStatusCache still holds the old part-file listing
        # for this path — invalidate before anyone re-reads it
        spark.catalog.refreshByPath(idx_path)
        counts["index_out"] = spark.read.parquet(idx_path).count()
    else:
        d = minhash_dedup(d, strategy="cc", min_jaccard=args.min_jaccard)
        counts["after_minhash_dedup"] = d.count()
        build_minhash_index(d).write.mode("overwrite").parquet(idx_path)
        counts["index_out"] = spark.read.parquet(idx_path).count()

    # deterministic pseudo-eval slice stands in for real benchmark files
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    d = decontaminate(d.filter(F.col("doc_id") % 97 != 0), bench)
    counts["after_decontaminate"] = d.count()

    from hyped_spark.functions.text import pii_scrub_col

    d = d.withColumn("text", pii_scrub_col(F.col("text")))

    if args.cut_dup_ngram > 0:
        from hyped_spark.operators.substrings import cut_duplicate_spans

        clean = cut_duplicate_spans(d, n=args.cut_dup_ngram)
        d = (d.drop("text").join(clean, "doc_id")
             .withColumnRenamed("clean_text", "text"))
        counts["after_boilerplate_cut"] = d.count()

    if args.c4_lines > 0:
        from hyped_spark.functions.text import c4_line_filter_col

        d = (d.withColumn("text", c4_line_filter_col(F.col("text"),
                                                     min_words=args.c4_lines))
             .filter(F.length("text") > 0))
        counts["after_c4_line_gate"] = d.count()

    d = (
        d.withColumn("quality", quality_score_col(F.col("text")))
        .withColumn("dup_3gram_frac",
                    dup_ngram_frac_col(tokens_col(F.col("text")), 3))
        .filter((F.col("quality") >= args.min_quality)
                & (F.col("dup_3gram_frac") <= args.max_dup_3gram))
    )
    counts["after_quality_gate"] = d.count()

    if args.gopher:
        from hyped_spark.functions.text import gopher_rules_col

        d = (d.withColumn("__g", gopher_rules_col(
                F.col("text"), min_words=args.gopher_min_words))
             .filter(F.col("__g")["keep"]).drop("__g"))
        counts["after_gopher_gate"] = d.count()

    if args.classifier_weights:
        from hyped_spark.operators.classify import linear_text_score

        wdf = spark.read.parquet(args.classifier_weights)
        ws = [r[1] for r in wdf.orderBy(wdf.columns[0]).collect()]
        d = linear_text_score(d, ws, bias=args.classifier_bias) \
            .filter(F.col("score") >= args.min_score)
        counts["after_classifier_gate"] = d.count()

    if args.max_ppl > 0:
        from hyped_spark.operators.lm import fit_unigram_lm, lm_perplexity

        lm = fit_unigram_lm(d)
        scores = lm_perplexity(d, lm)
        d = d.join(scores.select("doc_id", "perplexity"), "doc_id") \
             .filter(F.col("perplexity") <= args.max_ppl)
        counts["after_ppl_gate"] = d.count()

    langs = [s.strip() for s in args.langs.split(",") if s.strip()]
    d = d.withColumn("lang_guess", lang_id_col(F.col("text"))) \
         .filter(F.col("lang_guess").isin(langs))
    counts["after_lang_filter"] = d.count()

    if args.dsir_target:
        from hyped_spark.operators.dsir import dsir_select

        target = spark.read.parquet(args.dsir_target)
        d = dsir_select(target, d, k=args.dsir_k,
                        buckets=args.dsir_buckets).drop("logw")
        counts["after_dsir_select"] = d.count()

    if args.sample:
        from hyped_spark.operators.curation import stratified_sample

        d = stratified_sample(d, "source", json.loads(args.sample),
                              key_col="doc_id", default_fraction=1.0)
        counts["after_stratified_sample"] = d.count()

    d = source_mixture_weights(d, "source", alpha=0.5)
    d = split_by_hash(d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})

    curated = os.path.join(args.out, "curated")
    d.write.mode("overwrite").parquet(curated)
    curated_df = spark.read.parquet(curated)
    counts["curated"] = curated_df.count()

    train = curated_df.filter(F.col("split") == "train").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    manifest = pack_offsets(train, "n_tokens", "doc_id",
                            chunk_tokens=args.chunk_tokens)
    packing = os.path.join(args.out, "packing")
    manifest.write.mode("overwrite").parquet(packing)
    counts["train_docs"] = train.count()
    counts["pack_rows"] = spark.read.parquet(packing).count()
    counts["chunks"] = (
        spark.read.parquet(packing).agg(F.max("chunk_id")).collect()[0][0]
    )

    print(json.dumps({"job": "curation", "sf_dir": args.sf_dir,
                      "out": args.out, "counts": counts}))


if __name__ == "__main__":
    main()
