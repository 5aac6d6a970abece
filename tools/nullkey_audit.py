"""NULL-key audit (VERDICT r11 task 3): enumerate every keyed operation
(groupBy / Window.partitionBy / writer partitionBy / stateful key) in
the package and classify each enclosing function:

  a  guarded        - in-function isNotNull filter / loud raise on keys
  c  fixed-r12      - was unguarded, fixed + regression-tested in r12
  b-up  guarded upstream - keys flow through a helper that guards
  b-der derived     - keys created by non-nullable expressions (hash,
                      row_number, posexplode, literal, bucket id, ...)
  b-cmp comparison-dropped - NULL keys cannot pass a <,>,!= filter or
                      equijoin on the key path
  b-gate fixture gate - plans/* gate bound to the driver parquet tables;
                      Spark and the DuckDB oracle share NULL-grouping
                      semantics, so parity holds regardless; robustness
                      lives in the operator layer underneath
  d  value-semantics - NULL is a legitimate key VALUE for this operator
                      (profiling/FD/skew/writer), documented in its docstring

Usage: python tools/nullkey_audit.py [--md]   (table to stdout)
"""
import ast, glob, sys

FIXED_R12 = {  # (c) — fixed + tested in tests/test_hardening_r12.py
    "knn_topk", "knn_topk_gemm", "search", "search_df", "mmr_select",
    "maxsim_scores", "pagerank", "pagerank_exact",
    "personalized_pagerank_exact", "bfs_hops", "daily_counts",
    "stratified_ate", "shapley_attribution", "markov_entropy_rate",
    "pass_at_k", "wilson_interval", "abc_classes", "build_postings",
    "resample_ffill", "rolling_distinct", "log_state_as_of",
    "prefix_filtered_pairs", "dbscan", "dsir_weights",
    "sessionize_batch", "upsert_df", "embedding_dup_pairs_lsh",
    "hourly_aggregate", "run_segment_rollup",
}
VALUE_SEMANTICS = {  # (d)
    "fd_error", "key_uniqueness", "k_anonymity_report",
    "l_diversity_report", "_key_histograms", "write_partitioned",
    "fs_pattern_counts", "fs_pattern_counts_blocked",
    "fs_weights_blocked", "stream_events_to_parquet",
}
UPSTREAM = {  # (b-up): the named helper guards the keys
    "jaccard_pairs": "_shingle_table", "minhash_signature": "_shingle_table",
    "minhash_signatures_with_sets": "_shingle_table",
    "dedup_survivors_by": "duplicate_groups(non-null group ids)",
    "frequent_pairs": "basketize", "association_rules": "basketize",
    "frequent_itemsets": "basketize", "pmi_pairs": "basketize",
    "item_similarity": "basketize", "also_bought_topk": "basketize",
    "bm25_from_index": "build_text_index",
    "maxsim_topk": "maxsim_scores", "knn_graph": "topk_join->knn_topk",
    "twonn_intrinsic_dim": "knn_graph", "knn_label_loo_accuracy": "knn_graph",
    "repeated_passages": "window_doc_pairs",
    "winnow_pairs": "winnow_fingerprints",
    "trend_ma": "daily_counts", "weekday_profile": "daily_counts",
    "volume_anomalies": "daily_counts",
    "stream_upsert": "upsert_df raise",
    "good_turing_rstar": "explode-derived terms",
    "unigram_counts": "explode-derived terms",
    "decontamination_report": "ngram_containment + winnow_fingerprints",
    "phrase_match": "build_postings", "phrase_doc_counts": "build_postings",
    "multi_phrase_match": "build_postings",
}
COMPARISON = {  # (b-cmp)
    "k_core", "graph_summary", "degree_powerlaw", "modularity",
    "link_scores", "triangle_count",
}


def key_names(call):
    out = []
    for a in call.args:
        if isinstance(a, ast.Constant) and isinstance(a.value, str):
            out.append(a.value)
        elif isinstance(a, ast.Name):
            out.append(f"${a.id}")
        elif isinstance(a, ast.Call):
            f = a.func
            if isinstance(f, ast.Attribute) and f.attr == "alias" and a.args:
                v = a.args[0]
                out.append(v.value if isinstance(v, ast.Constant) else "<expr>")
            elif isinstance(f, (ast.Attribute, ast.Name)):
                nm = f.attr if isinstance(f, ast.Attribute) else f.id
                if nm in ("col", "_c", "asc", "desc") and a.args:
                    v = a.args[0]
                    out.append(v.value if isinstance(v, ast.Constant)
                               else f"${v.id}" if isinstance(v, ast.Name)
                               else "<expr>")
                else:
                    out.append(f"<{nm}()>")
            else:
                out.append("<expr>")
        else:
            out.append("<expr>")
    return out


def classify(path, name, has_guard):
    if name in FIXED_R12:
        return "c->a"
    if name in VALUE_SEMANTICS:
        return "d"
    if name in UPSTREAM:
        return f"b-up({UPSTREAM[name]})"
    if name in COMPARISON:
        return "b-cmp"
    if has_guard:
        return "a"
    if "/plans/" in path or path.endswith("__spark_entry__.py"):
        return "b-gate"
    return "b-der"


def main():
    rows = []
    for path in sorted(glob.glob("weaviate_txtai_spark/**/*.py", recursive=True)):
        src = open(path).read()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            fsrc = ast.get_source_segment(src, node) or ""
            sites = []
            for sub in ast.walk(node):
                if isinstance(sub, ast.Call) and isinstance(sub.func, ast.Attribute):
                    at = sub.func.attr
                    if at in ("groupBy", "partitionBy", "groupby"):
                        if at == "partitionBy" and not sub.args:
                            continue
                        sites.append((at, key_names(sub)))
                    elif at == "applyInPandasWithState":
                        sites.append((at, ["<state-key>"]))
            if sites:
                guard = "isNotNull" in fsrc or "raise_error" in fsrc
                keys = sorted({k for _, ks in sites for k in ks})
                rows.append((path, node.name, len(sites),
                             classify(path, node.name, guard), keys))
    md = "--md" in sys.argv
    if md:
        print("| file | function | sites | class | keys |")
        print("|---|---|---|---|---|")
    counts = {}
    for path, fn, n, cls, keys in rows:
        counts[cls.split("(")[0]] = counts.get(cls.split("(")[0], 0) + 1
        if md:
            print(f"| {path.replace('weaviate_txtai_spark/','')} | {fn} | {n} "
                  f"| {cls} | {', '.join(keys)} |")
        else:
            print(f"{cls:10s} {path}:{fn} keys={keys}")
    print(f"\nTOTAL functions: {len(rows)}  by class: {sorted(counts.items())}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
