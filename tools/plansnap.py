"""Snapshot raw ``explain("formatted")`` output per query for plan diffing.

Usage:
    python tools/plansnap.py --repo <repo_root> --outdir plans/r13 \
        --suffix after [--sf /root/testdata/sf0.01] [--names a,b,c]

Writes ``<outdir>/<query>_<suffix>.txt`` for every selected query.  The
default selection mirrors ``tools/explain_all.py``: every bench HEADLINE
query whose construction is lazy (streaming_* / pattern_search_* execute
eagerly, so they are skipped) plus the same extra audit set.  ``--repo``
points at the package tree to import (so a git worktree of an older
commit can produce the "before" side with this one script); queries not
registered in that tree are skipped, letting one name list serve both
sides across rounds that add queries.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default="")
    args = ap.parse_args()

    repo = os.path.abspath(args.repo)
    sys.path.insert(0, repo)

    from bench import HEADLINE
    from dask_patternsearch_spark.plans.inspect import plan_text
    from dask_patternsearch_spark.queries import all_queries
    from dask_patternsearch_spark.session import get_spark

    spark = get_spark("plansnap", cpus="4")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        skip = ("streaming_", "pattern_search_")
        names = [n for n in HEADLINE if not n.startswith(skip)]
        extra = ["trigram_redundancy", "minhash_estimate_error",
                 "substring_dup_docs", "bm25_top_docs",
                 "weighted_sample_docs", "triangle_copurchase",
                 "chunk_docs", "sparse_cosine_docs", "time_weighted_value",
                 "record_linkage_parts", "ccnet_perplexity_buckets",
                 "inverted_postings", "language_id", "star_wide_rollup",
                 "scd2_pointintime_join", "fk_integrity_audit",
                 "incremental_agg_maintenance", "stratified_weighted_docs",
                 "bigram_logprob_scores", "snapshot_diff_orders",
                 "cascade_delete_audit", "zscore_extreme_docs",
                 "rrf_hybrid_search", "incremental_join_maintenance",
                 "multimodal_metadata", "ewma_user_values",
                 "regression_by_flag", "sql_recursive_chain_rollup",
                 "decontaminate_corpus", "kmv_distinct_users",
                 "hll_manual_users", "heavy_hitter_priorities",
                 "heaps_vocab_growth", "cdc_dedup_rewrite",
                 "leakage_guarded_split", "mmr_diversified_topk",
                 "token_budget_mixture"]
        names += [n for n in extra if n not in names]

    os.makedirs(args.outdir, exist_ok=True)
    done = skipped = 0
    for name in names:
        if name not in qs:
            skipped += 1
            continue
        try:
            txt = plan_text(qs[name](spark, args.sf))
        except Exception as exc:  # pragma: no cover - diagnostics
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
            skipped += 1
            continue
        with open(os.path.join(args.outdir, f"{name}_{args.suffix}.txt"),
                  "w") as fh:
            fh.write(txt)
        done += 1
    print(f"wrote {done} plans to {args.outdir} (suffix={args.suffix}, "
          f"skipped {skipped})")
    spark.stop()


if __name__ == "__main__":
    main()
