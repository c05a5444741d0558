#!/usr/bin/env python3
"""Exact closure-labeling verification for generated-scale runs where the
DuckDB recursive-CTE oracles explode (path enumeration is super-linear in
edge density; the engine's pointer-doubling resolves the same components in
seconds — the asymmetry the distributed form exists for).

Verifies engine outputs with an independent linear-time union-find:

  check_closure.py <edges.parquet> <clusters.parquet> [keeper.parquet]

- edges: id_a/id_b pair output already hash-verified at oracle-able scale
  (e.g. q_simhash_pairs).
- clusters: doc_id, cluster_id, is_keeper (q_dedup_clusters contract:
  cluster_id = min reachable id, singletons labeled self, is_keeper =
  (doc_id == cluster_id)). Checked EXACTLY, row for row.
- keeper (optional): cluster_id, keeper_doc, n_members, keeper_quality
  (q_dedup_keeper contract). Structural checks: one row per component,
  cluster_id = component min-label, n_members = component size,
  keeper_doc a member of its component. (keeper_quality's argmax is
  engine-side TextAnalysis arithmetic — covered by the hash-exact oracle
  at sf0.01/sf0.001; here the structure is what scale can break.)
"""
import sys

import duckdb


def main() -> int:
    edges_path, clusters_path = sys.argv[1], sys.argv[2]
    keeper_path = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()

    edges = con.sql(
        f"SELECT id_a, id_b FROM '{edges_path}/*.parquet'").fetchall()
    clusters = con.sql(
        "SELECT doc_id, cluster_id, is_keeper FROM "
        f"'{clusters_path}/*.parquet'").fetchall()
    print(f"[closure] {len(edges)} edges, {len(clusters)} labeled docs")

    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra  # min-label as root

    for a, b in edges:
        union(a, b)

    # component min-label per doc (singletons label themselves)
    bad = 0
    comp_sizes = {}
    for doc_id, cluster_id, is_keeper in clusters:
        expect = find(doc_id)
        comp_sizes[expect] = comp_sizes.get(expect, 0) + 1
        if cluster_id != expect or is_keeper != (1 if doc_id == expect else 0):
            bad += 1
            if bad <= 5:
                print(f"[closure] MISMATCH doc {doc_id}: engine "
                      f"({cluster_id},{is_keeper}) vs union-find {expect}")
    if bad:
        print(f"[closure] FAIL clusters: {bad} mismatched labels")
        return 1
    n_comp = len(comp_sizes)
    n_multi = sum(1 for s in comp_sizes.values() if s > 1)
    print(f"[closure] PASS clusters: {len(clusters)} labels exact "
          f"({n_comp} components, {n_multi} multi-doc)")

    if keeper_path:
        keepers = con.sql(
            "SELECT cluster_id, keeper_doc, n_members FROM "
            f"'{keeper_path}/*.parquet'").fetchall()
        if len(keepers) != n_comp:
            print(f"[closure] FAIL keeper: {len(keepers)} rows != "
                  f"{n_comp} components")
            return 1
        kbad = 0
        for cluster_id, keeper_doc, n_members in keepers:
            ok = (find(cluster_id) == cluster_id
                  and comp_sizes.get(cluster_id) == n_members
                  and find(keeper_doc) == cluster_id)
            if not ok:
                kbad += 1
                if kbad <= 5:
                    print(f"[closure] MISMATCH keeper row ({cluster_id}, "
                          f"{keeper_doc}, {n_members}) vs union-find "
                          f"({find(cluster_id)}, size "
                          f"{comp_sizes.get(cluster_id)})")
        if kbad:
            print(f"[closure] FAIL keeper: {kbad} bad rows")
            return 1
        print(f"[closure] PASS keeper: {len(keepers)} rows structurally "
              "exact (min-label, size, membership)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
