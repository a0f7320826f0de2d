"""Properties of the connected-components dedup step and the
sampling/distribution operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_eamples_spark.operators.dedup import dedup_clusters, dedup_minhash
from dbt_eamples_spark.operators.sampling import (
    STRATUM_N,
    agg_histogram,
    sample_stratified,
)


class TestDedupClusters:
    def test_components_cover_pair_graph(self, spark, sf_dir):
        pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b").collect()
        rows = dedup_clusters(spark, sf_dir).collect()
        comp = {r.doc_id: r.cluster_id for r in rows}
        nodes = {d for p in pairs for d in (p.doc_a, p.doc_b)}
        # every paired doc gets a component; nothing else does
        assert set(comp) == nodes
        # both endpoints of every edge share a component (transitivity
        # base case — label propagation must not split an edge)
        for p in pairs:
            assert comp[p.doc_a] == comp[p.doc_b]

    def test_cluster_id_is_component_minimum_and_keep_unique(self, spark, sf_dir):
        rows = dedup_clusters(spark, sf_dir).collect()
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for cid, members in by_cluster.items():
            ids = [m.doc_id for m in members]
            assert cid == min(ids)
            keeps = [m for m in members if m.keep]
            assert len(keeps) == 1 and keeps[0].doc_id == cid
            assert all(m.cluster_size == len(members) for m in members)

    def test_matches_python_union_find(self, spark, sf_dir):
        """Ground truth via a driver-side union-find over the same
        edge list (fine at fixture scale; the operator exists because
        this doesn't distribute)."""
        pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b").collect()
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for p in pairs:
            ra, rb = find(p.doc_a), find(p.doc_b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in parent}
        got = {
            r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()
        }
        assert got == expected


class TestSampling:
    def test_stratified_quota_and_determinism(self, spark, sf_dir):
        s1 = sample_stratified(spark, sf_dir)
        rows = s1.collect()
        per_lang: dict[str, int] = {}
        for r in rows:
            per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
        n_docs_per_lang = {
            r.lang: r.n
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for lang, n in per_lang.items():
            assert n == min(STRATUM_N, n_docs_per_lang[lang])
        # deterministic: second run identical
        s2 = {(r.doc_id, r.lang, r.sample_rank) for r in
              sample_stratified(spark, sf_dir).collect()}
        assert {(r.doc_id, r.lang, r.sample_rank) for r in rows} == s2

    def test_histogram_partitions_all_rows(self, spark, sf_dir):
        rows = agg_histogram(spark, sf_dir).collect()
        total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        assert sum(r.n_orders for r in rows) == total
        for r in rows:
            assert r.bin_min >= r.bin_lo
            # overflow bin (last) may exceed its nominal width
            if r.bin_id < 11:
                assert r.bin_max < r.bin_lo + 50_000


class TestCorpusKeepList:
    def test_verdict_consistent_with_tiers(self, spark, sf_dir):
        from dbt_eamples_spark.operators.dedup import (
            corpus_keep_list,
            dedup_exact,
        )

        rows = {r.doc_id: r for r in corpus_keep_list(spark, sf_dir).collect()}
        total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert len(rows) == total  # exactly one verdict per doc
        exact_keepers = {
            r.keep_doc_id for r in dedup_exact(spark, sf_dir).collect()
        }
        clusters = {
            r.doc_id: r.keep for r in dedup_clusters(spark, sf_dir).collect()
        }
        for doc_id, r in rows.items():
            assert r.keep == (r.reason == "kept")
            if doc_id not in exact_keepers:
                assert r.reason == "exact_dup"
            elif doc_id in clusters and not clusters[doc_id]:
                assert r.reason == "near_dup"
            else:
                assert r.reason == "kept"
