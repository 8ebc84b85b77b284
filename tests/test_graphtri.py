"""Triangle counting / clustering coefficient (queries/graphtri.py):
hand-counted planted graphs against the compact-forward core, plus
the entry-level surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.queries.graphtri import (
    triangle_stats,
)


def _graph(spark, edges, n):
    und = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "u long, w long"
    ).distinct()
    nodes = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    return und, nodes


def test_k4_is_fully_clustered(spark):
    # K4: every node degree 3, in C(3,2)=3 triangles, cc exactly 1.0
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    rows = triangle_stats(*_graph(spark, edges, 4)).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.degree == 3
        assert r.triangles == 3
        assert r.cc_ppm == 1_000_000


def test_path_has_no_triangles(spark):
    rows = triangle_stats(
        *_graph(spark, [(0, 1), (1, 2), (2, 3)], 4)
    ).collect()
    assert all(r.triangles == 0 and r.cc_ppm == 0 for r in rows)
    # endpoints have degree 1 -> cc defined as 0, not a div-by-zero
    assert {r.degree for r in rows} == {1, 2}


def test_wedge_plus_closure(spark):
    # one triangle (0,1,2) + a pendant edge (2,3): node 2 has degree
    # 3 but only 1 of its 3 neighbor pairs closed -> cc = 1/3
    rows = {
        r.vec_id: r
        for r in triangle_stats(
            *_graph(spark, [(0, 1), (0, 2), (1, 2), (2, 3)], 4)
        ).collect()
    }
    assert rows[0].triangles == rows[1].triangles == rows[2].triangles == 1
    assert rows[3].triangles == 0
    assert rows[0].cc_ppm == rows[1].cc_ppm == 1_000_000
    assert rows[2].cc_ppm == 333_333  # round(1e6 / 3)
    assert rows[3].cc_ppm == 0


def test_isolated_node_emits_zero_row(spark):
    # node 3 has no edges at all: present in the output with zeros
    rows = {
        r.vec_id: r
        for r in triangle_stats(
            *_graph(spark, [(0, 1), (1, 2), (0, 2)], 4)
        ).collect()
    }
    assert rows[3].degree == 0
    assert rows[3].triangles == 0
    assert rows[3].cc_ppm == 0


def test_entry_graph_is_nondegenerate(spark, sf_dir):
    from dataengineer_job_scraper_etl_spark.catalog import all_queries
    from dataengineer_job_scraper_etl_spark.queries.graphrank import (
        KNN_K,
        N_NODES,
    )

    out = (
        all_queries()["vec_knn_clustering_coefficient"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    assert len(out) == N_NODES
    total_tri = sum(r.triangles for r in out)
    assert total_tri % 3 == 0  # each triangle counted at 3 nodes
    assert total_tri > 0  # the kNN graph genuinely closes triangles
    for r in out:
        # symmetrization can only ADD edges over a node's own top-k
        assert r.degree >= KNN_K
        assert 0 <= r.cc_ppm <= 1_000_000
