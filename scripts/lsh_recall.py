"""Measure multi-probe LSH top-k recall vs brute-force ground truth.

Feeds the SCALE.md recall table: for 1..3 hyperplane tables, what fraction
of each vector's true top-k neighbors the LSH candidate graph recovers,
and what share of all pairs was scored to get it. (The synthetic
embeddings are near-random — max pairwise cos ~0.6 at sf0.1 — so
threshold-style recall is vacuous; recall@k is the meaningful metric.)
"""
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casf_spark.operators import similarity as SIM
from casf_spark.session import get_spark
from casf_spark.sources.tables import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10

spark = get_spark("lsh_recall")
emb = load_table(spark, SF, "embeddings")
n_vec = emb.count()
all_pairs = n_vec * (n_vec - 1) // 2

truth = defaultdict(set)
for r in SIM.brute_force_topk(emb, emb, k=K).collect():
    truth[r.query_id].add(r.neighbor_id)
n_truth = sum(len(v) for v in truth.values())
print(f"corpus={n_vec} vectors; ground truth = exact top-{K} per vector "
      f"({n_truth} edges; brute force scores {all_pairs} pairs)")

for n_seeds in (1, 2, 3):
    seeds = tuple(42 + i for i in range(n_seeds))
    cand = SIM.lsh_candidates_multiprobe(emb, num_planes=8, seeds=seeds)
    rows = cand.collect()
    best = defaultdict(list)
    for r in rows:
        best[r.id0].append((-r.cos_sim, r.id1))
        best[r.id1].append((-r.cos_sim, r.id0))
    hit = sum(
        len({nb for _, nb in sorted(cands)[:K]} & truth[q])
        for q, cands in best.items())
    print(f"tables={n_seeds}: candidates={len(rows)} "
          f"({len(rows)/all_pairs:.2%} of all pairs) "
          f"recall@{K}={hit/n_truth:.3f}")
