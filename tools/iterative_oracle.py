#!/usr/bin/env python3
"""Exact second-opinion oracles for the four ITERATIVE-algorithm queries
(r16 VERDICT item 3): d_dedup_clusters, d_cluster_keep_best, s_knn_graph,
s_pagerank. DuckDB's recursive SQL cannot finish these at the
sf1-equivalent 10x blow-up (>2,400 s), so round 16 certified them by
structural invariants only; this tool replaces the invariants with EXACT
hash-grade comparison from an independent reimplementation:

  - connected components: pure-python union-find over the (already
    DuckDB-hash-verified) d_ngram_jaccard pair dump
  - keep-best: max-by-(quality, -id) per component, quality taken from the
    (already DuckDB-hash-verified) t_quality_score dump
  - exact kNN: numpy block top-k with the engine's EXACT float semantics —
    candidates ranked by float64 matmul, then the survivors' cosines
    recomputed with strict LEFT-TO-RIGHT accumulation (np.add.accumulate),
    matching the VecDot codegen loop (HashExprs.scala VecDot: acc +=
    a[i]*b[i] in element order), tie-break (cosine desc, nbr asc)
  - PageRank: exact integer arithmetic (the engine's formulation is
    integer by design: r0 = 1e12 // n, teleport = r0*15//100,
    contrib = pr//od, next = teleport + 85*sum//100)

Usage:
  python3 tools/iterative_oracle.py <corpusDir> <verifyOutDir>

<corpusDir>   the corpus the Verify dump was produced from
              (e.g. /tmp/graft-scale10 — needs embeddings.parquet)
<verifyOutDir> a graft.Verify output dir containing the dumps:
              d_ngram_jaccard/ t_quality_score/ d_dedup_clusters/
              d_cluster_keep_best/ s_knn_graph/ s_pagerank/

Exit 0 = all four EXACT-match the dumps; 1 = any divergence.
"""
import glob
import os
import sys
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pyarrow.parquet as pq


def read_parquet(path):
    """Read a file, a Spark directory-parquet, or a glob of part files."""
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no part files under {path}")
        import pyarrow as pa
        return pa.concat_tables([pq.read_table(p) for p in parts])
    return pq.read_table(path)


def dump_path(out_dir, name):
    for cand in (os.path.join(out_dir, name),
                 os.path.join(out_dir, name + ".parquet")):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"dump {name} not found under {out_dir}")


def round6(x):
    """Spark Round(double, 6): BigDecimal.valueOf(d) — i.e. the SHORTEST
    decimal repr, which python's repr also produces — quantized HALF_UP."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP))


def compare(name, oracle_rows, dump_rows):
    """Exact sorted-tuple-list comparison with a readable first-diff."""
    o, d = sorted(oracle_rows), sorted(dump_rows)
    if o == d:
        print(f"[oracle] {name}: PASS exact ({len(o)} rows)")
        return True
    print(f"[oracle] {name}: FAIL (oracle {len(o)} rows, dump {len(d)})")
    od, dd = set(o) - set(d), set(d) - set(o)
    for r in sorted(od)[:5]:
        print(f"[oracle]   oracle-only: {r}")
    for r in sorted(dd)[:5]:
        print(f"[oracle]   dump-only:   {r}")
    return False


# ---------------------------------------------------------- union-find
def union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by value: keep the smaller id as root so the root IS
            # the component minimum (the engine's canonical label)
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {n: find(n) for n in nodes}


def oracle_clusters(out_dir):
    pairs = read_parquet(dump_path(out_dir, "d_ngram_jaccard"))
    ia = pairs.column("id_a").to_pylist()
    ib = pairs.column("id_b").to_pylist()
    edges = list(zip(ia, ib))
    nodes = set(ia) | set(ib)
    print(f"[oracle] pair graph: {len(edges)} edges over {len(nodes)} nodes"
          " (from the DuckDB-verified d_ngram_jaccard dump)")
    return union_find(edges, nodes)


def check_dedup_clusters(out_dir, labels):
    dump = read_parquet(dump_path(out_dir, "d_dedup_clusters"))
    got = list(zip(dump.column("doc_id").to_pylist(),
                   dump.column("canonical").to_pylist()))
    return compare("d_dedup_clusters", list(labels.items()), got)


def check_cluster_keep_best(out_dir, labels):
    q_dump = read_parquet(dump_path(out_dir, "t_quality_score"))
    q = dict(zip(q_dump.column("doc_id").to_pylist(),
                 q_dump.column("quality").to_pylist()))
    # engine: max(struct(q, -id)) per label — best quality, ties -> min id
    best = {}
    for doc, lab in labels.items():
        key = (q[doc], -doc)
        if lab not in best or key > best[lab][0]:
            best[lab] = (key, doc)
    rows = [(doc, lab, best[lab][1], best[lab][0][0])
            for doc, lab in labels.items()]
    dump = read_parquet(dump_path(out_dir, "d_cluster_keep_best"))
    got = list(zip(dump.column("doc_id").to_pylist(),
                   dump.column("cluster").to_pylist(),
                   dump.column("keep_id").to_pylist(),
                   dump.column("keep_q").to_pylist()))
    return compare("d_cluster_keep_best", rows, got)


# ---------------------------------------------------------- exact kNN
def seq_dot(A, B):
    """Strict left-to-right float64 accumulation along axis 1 — the exact
    IEEE sum order of the VecDot codegen loop (acc += a[i]*b[i])."""
    return np.add.accumulate(A * B, axis=1)[:, -1]


def exact_knn(corpus_dir, k):
    t = read_parquet(os.path.join(corpus_dir, "embeddings.parquet"))
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb32 = t.column("embedding").to_pylist()
    V = np.asarray(emb32, dtype=np.float32).astype(np.float64)
    n, d = V.shape
    # norms with the engine's exact sum order; zero-norm vectors excluded
    norms = np.sqrt(seq_dot(V, V))
    keep = norms > 0
    ids, V, norms = ids[keep], V[keep], norms[keep]
    n = len(ids)
    print(f"[oracle] exact kNN: {n} vectors x {d} dims, k={k}")
    order = np.argsort(ids)
    ids, V, norms = ids[order], V[order], norms[order]
    CAND = min(n - 1, max(4 * k, 32))
    edges = []  # (src_id, dst_id, exact_cos, rank)
    block = 2048
    for s0 in range(0, n, block):
        s1 = min(s0 + block, n)
        # fast approximate scores (pairwise-summed matmul): only used to
        # nominate candidates, never to rank them
        G = V[s0:s1] @ V.T
        C = G / np.outer(norms[s0:s1], norms)
        for r in range(s1 - s0):
            i = s0 + r
            row = C[r].copy()
            row[i] = -np.inf  # exclude self
            # Deterministic nomination (r17 ADVICE): argpartition breaks
            # ties arbitrarily, so >=CAND tied approximate scores (e.g.
            # duplicate embeddings, cosine exactly 1.0 — plausible in a
            # dedup corpus) could cut away the engine's winners under its
            # (cosine desc, id asc) ordering and spuriously FAIL correct
            # output. Nominate by (approx cosine desc, id asc) instead,
            # and widen the cut while the boundary scores are within
            # float tolerance of the CAND-th.
            order = np.lexsort((ids, -row))
            cut = CAND
            thresh = row[order[CAND - 1]] - 1e-9
            while cut < len(row) and row[order[cut]] >= thresh:
                cut += 1
            cand = order[:cut]
            # exact cosines for the candidates, engine sum order
            dots = seq_dot(np.broadcast_to(V[i], (len(cand), V.shape[1])),
                           V[cand])
            cos = dots / (norms[i] * norms[cand])
            # (cosine desc, nbr id asc) — the engine's row_number ordering
            sel = sorted(range(len(cand)),
                         key=lambda j: (-cos[j], ids[cand[j]]))[:k]
            for rank, j in enumerate(sel, start=1):
                edges.append((int(ids[i]), int(ids[cand[j]]),
                              float(cos[j]), rank))
    return edges


def check_knn_graph(corpus_dir, out_dir, edges5):
    eset = {(a, b) for a, b, _, _ in edges5}
    rows = [(a, b, round6(c), r, 1 if (b, a) in eset else 0)
            for a, b, c, r in edges5]
    dump = read_parquet(dump_path(out_dir, "s_knn_graph"))
    got = list(zip(dump.column("id").to_pylist(),
                   dump.column("nbr").to_pylist(),
                   dump.column("cos").to_pylist(),
                   dump.column("rank").to_pylist(),
                   dump.column("mutual").to_pylist()))
    return compare("s_knn_graph", rows, got)


def check_pagerank(out_dir, edges5, iters=3, k=3):
    # the engine's k=3 graph is exactly the rank<=3 prefix of the same
    # total ordering (partial-then-global top-k composes)
    edges = [(a, b) for a, b, _, r in edges5 if r <= k]
    nodes = sorted({a for a, _ in edges})
    od = {}
    for a, _ in edges:
        od[a] = od.get(a, 0) + 1
    n = len(nodes)
    r0 = 10**12 // n
    teleport = r0 * 15 // 100
    pr = {v: r0 for v in nodes}
    for _ in range(iters):
        s = {}
        for a, b in edges:
            s[b] = s.get(b, 0) + pr[a] // od[a]
        pr = {v: teleport + 85 * s.get(v, 0) // 100 for v in nodes}
    dump = read_parquet(dump_path(out_dir, "s_pagerank"))
    got = list(zip(dump.column("vec_id").to_pylist(),
                   dump.column("pr").to_pylist()))
    return compare("s_pagerank", list(pr.items()), got)


def main():
    corpus_dir, out_dir = sys.argv[1], sys.argv[2]
    ok = True
    labels = oracle_clusters(out_dir)
    ok &= check_dedup_clusters(out_dir, labels)
    ok &= check_cluster_keep_best(out_dir, labels)
    edges5 = exact_knn(corpus_dir, k=5)
    ok &= check_knn_graph(corpus_dir, out_dir, edges5)
    ok &= check_pagerank(out_dir, edges5)
    print("[oracle] " + ("ALL FOUR EXACT" if ok else "DIVERGENCE — see above"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
